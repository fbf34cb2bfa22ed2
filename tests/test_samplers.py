"""End-to-end sampler coverage across methods × SDE families.

The math-level tests live in test_core_ops/test_sde; here each engine path
(naive / DPS / DDS / uncond × VE / VP / DDPM, incl. DDPM time travel and
chain init) runs compiled on a tiny analytic problem.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_models_dev_project_tpu.models.unet import UNetModel, UNetConfig
from diffusion_models_dev_project_tpu.ops.sde import DDPM, VESDE, VPSDE
from diffusion_models_dev_project_tpu.physics.ray_trafo import make_parallel_beam_trafo
from diffusion_models_dev_project_tpu.physics.simulation import simulate
from diffusion_models_dev_project_tpu.sampling.engine import get_standard_sampler

IM = 16


def _score_fn():
    cfg = UNetConfig(image_size=IM, in_channels=1, out_channels=1,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_heads=4, num_head_channels=8,
                     use_scale_shift_norm=True, resblock_updown=True)
    model = UNetModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IM, IM, 1)),
                        jnp.zeros((1,)))
    rng = np.random.default_rng(5)
    params = jax.tree_util.tree_map(
        lambda v: (jnp.asarray(rng.normal(0, 0.02, v.shape).astype(np.float32))
                   if not np.asarray(v).any() else v), params)
    return lambda x, t: model.apply(params, x, t)


SCORE = _score_fn()
TRAFO = make_parallel_beam_trafo((IM, IM), 8, impl="matrix")
GT = np.zeros((1, IM, IM, 1), np.float32)
GT[0, 4:12, 5:11, 0] = 1.0
OBS = simulate(jax.random.PRNGKey(2), jnp.asarray(GT), TRAFO, 0.01)


def _run(method, sde, **kw):
    sampler = get_standard_sampler(
        method, SCORE, sde, TRAFO, OBS, num_steps=kw.pop("num_steps", 5),
        im_shape=(IM, IM, 1), ground_truth=jnp.asarray(GT), **kw)
    x, trace = sampler.sample(jax.random.PRNGKey(0), return_trace=True)
    assert x.shape == (1, IM, IM, 1)
    assert np.isfinite(np.asarray(x)).all()
    assert np.isfinite(np.asarray(trace)).all()
    return np.asarray(x)


@pytest.mark.parametrize("method", ["naive", "dps", "dds"])
def test_vesde_methods(method):
    _run(method, VESDE(sigma_min=0.01, sigma_max=5.0))


@pytest.mark.parametrize("method", ["naive", "dps", "dds"])
def test_vpsde_methods(method):
    _run(method, VPSDE(beta_min=0.1, beta_max=10.0))


@pytest.mark.parametrize("method", ["dps", "dds"])
def test_ddpm_methods(method):
    _run(method, DDPM(num_steps=50), num_steps=10)


def test_ddpm_time_travel_schedule():
    x = _run("dds", DDPM(num_steps=50), num_steps=10, travel_length=2,
             travel_repeat=2)
    assert np.isfinite(x).all()


def test_ddpm_early_stopping():
    sde = DDPM(num_steps=50)
    s_full = get_standard_sampler("dds", SCORE, sde, TRAFO, OBS, num_steps=10,
                                  im_shape=(IM, IM, 1))
    s_half = get_standard_sampler("dds", SCORE, sde, TRAFO, OBS, num_steps=10,
                                  im_shape=(IM, IM, 1), early_stopping_pct=0.5)
    from diffusion_models_dev_project_tpu.sampling.engine import _time_arrays

    ts_full = _time_arrays(sde, s_full.spec)[0]
    ts_half = _time_arrays(sde, s_half.spec)[0]
    assert len(ts_half) == len(ts_full) // 2
    np.testing.assert_array_equal(ts_half, ts_full[: len(ts_half)])


def test_uncond_sampling_both_families():
    for sde in (VESDE(sigma_min=0.01, sigma_max=5.0), DDPM(num_steps=50)):
        sampler = get_standard_sampler("uncond", SCORE, sde, None, None,
                                       num_steps=5, im_shape=(IM, IM, 1))
        x, _ = sampler.sample(jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(x)).all()


def test_chain_init_from_fbp():
    """pct_chain_elapsed > 0 starts from noised FBP (reference
    chain_simple_init, samplers/utils.py:381-394)."""
    sde = VESDE(sigma_min=0.01, sigma_max=5.0)
    fbp = TRAFO.fbp(OBS)
    sampler = get_standard_sampler(
        "dds", SCORE, sde, TRAFO, OBS, num_steps=10, im_shape=(IM, IM, 1),
        pct_chain_elapsed=0.5, filtbackproj=fbp)
    assert sampler.spec.start_time_step == 5
    x, _ = sampler.sample(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(x)).all()


def test_naive_dps_differ():
    sde = VESDE(sigma_min=0.01, sigma_max=5.0)
    a = _run("naive", sde)
    b = _run("dps", sde)
    assert np.abs(a - b).max() > 1e-6


def test_add_corrector_step_runs_and_differs():
    """Langevin corrector (functional here; parsed-but-dead in the
    reference, samplers/utils.py:128-157)."""
    sde = VESDE(sigma_min=0.01, sigma_max=5.0)

    def run(corr):
        s = get_standard_sampler("naive", SCORE, sde, TRAFO, OBS, num_steps=4,
                                 im_shape=(IM, IM, 1), add_corrector_step=corr)
        x, _ = s.sample(jax.random.PRNGKey(0))
        return np.asarray(x)

    a, b = run(False), run(True)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-6


def test_simulated_dataset_deterministic():
    from diffusion_models_dev_project_tpu.physics.simulation import SimulatedDataset

    images = [GT[0], GT[0] * 0.5]
    ds = SimulatedDataset(images, TRAFO, white_noise_rel_stddev=0.05, seed=3)
    assert len(ds) == 2
    y0a, x0a, f0a = ds[0]
    y0b, x0b, f0b = ds[0]
    np.testing.assert_array_equal(np.asarray(y0a), np.asarray(y0b))
    y1, _, _ = ds[1]
    assert np.abs(np.asarray(y0a) * 0.5 - np.asarray(y1)).max() > 1e-8
    assert f0a.shape == (1, IM, IM, 1)


def test_cg_precision_default_and_operator_passthrough():
    """DDS data-consistency defaults to bf16x3 matmul precision ("high" —
    measured PSNR-identical to fp32 at +7% throughput, BENCH.md round 3);
    operators without a `precision` field are left untouched, and "highest"
    restores full fp32 on those that have one."""
    import dataclasses

    import jax.numpy as jnp

    from diffusion_models_dev_project_tpu.sampling.engine import (
        SamplerSpec, get_standard_sampler)
    from diffusion_models_dev_project_tpu.ops.sde import VESDE
    from diffusion_models_dev_project_tpu.physics.fft_radon import (
        make_fft_parallel_trafo)

    assert SamplerSpec(method="dds", num_steps=2,
                       im_shape=(8, 8, 1)).cg_precision == "high"

    sde = VESDE(sigma_min=0.01, sigma_max=5.0)
    trafo = make_fft_parallel_trafo((32, 32), num_angles=6)
    obs = trafo.apply(jnp.zeros((1, 32, 32, 1)))
    s = get_standard_sampler(
        "dds", lambda x, t: x, sde, trafo, obs, num_steps=2,
        im_shape=(32, 32, 1))
    assert s.spec.cg_precision == "high"
    assert hasattr(trafo, "precision")
    # the CG-applied operator gets the spec precision; the sampler's own
    # trafo (used for rhs/simulation) keeps the operator default
    swapped = dataclasses.replace(trafo, precision=s.spec.cg_precision)
    assert swapped.precision == "high" and trafo.precision != "high"
