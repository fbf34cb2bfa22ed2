"""LoRA + steerable adaptation tests (reference adaptation.py, lora.py,
samplers/utils.py:220-336)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from diffusion_models_dev_project_tpu.models import UNetModel, UNetConfig
from diffusion_models_dev_project_tpu.ops.sde import VESDE
from diffusion_models_dev_project_tpu.physics.ray_trafo import make_parallel_beam_trafo
from diffusion_models_dev_project_tpu.physics.simulation import simulate
from diffusion_models_dev_project_tpu.sampling.adaptation import (
    AdaptedSampler, get_standard_adapted_sampler, init_lora,
    merge_adapt_params, split_adapt_params, tv_loss)

TINY = dict(image_size=16, in_channels=1, out_channels=1, model_channels=32,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_heads=4, num_head_channels=8, use_scale_shift_norm=True,
            resblock_updown=True)


def _models():
    base = UNetModel(UNetConfig(**TINY))
    lora_model = UNetModel(UNetConfig(**TINY, lora_rank=4))
    return base, lora_model


def _init_all(lora_model):
    x = jnp.zeros((1, 16, 16, 1))
    t = jnp.zeros((1,))
    variables = lora_model.init(
        {"params": jax.random.PRNGKey(0), "lora": jax.random.PRNGKey(1)}, x, t)
    # randomize the zero-init convs so tests are discriminative
    rng = np.random.default_rng(7)
    params = jax.tree_util.tree_map(
        lambda v: (jnp.asarray(rng.normal(0, 0.02, v.shape).astype(np.float32))
                   if not np.asarray(v).any() else v),
        variables["params"])
    return params, variables["lora"]


def test_lora_param_placement():
    """LoRA weights live only under Res/Attn blocks of included groups and
    never in 'params' (reference _find_modules ancestor filter)."""
    _, lora_model = _models()
    params, lora = _init_all(lora_model)
    pkeys = {"/".join(k) for k in traverse_util.flatten_dict(params)}
    lkeys = {"/".join(k) for k in traverse_util.flatten_dict(lora)}
    assert not any("lora" in k for k in pkeys)
    assert lkeys, "no lora params created"
    # stem conv and final conv are NOT LoRA targets (not under Res/Attn)
    assert not any(k.startswith("in_0_0") or k.startswith("final") for k in lkeys)
    # every lora path names a known target layer
    targets = ("conv1_lora", "conv2_lora", "skip_lora", "emb_lora",
               "qkv_lora", "proj_lora")
    assert all(any(t in k for t in targets) for k in lkeys)
    # up zero-init, down nonzero (lora.py:107-108)
    flat = traverse_util.flatten_dict(lora)
    for path, v in flat.items():
        if path[-1] == "up":
            np.testing.assert_array_equal(np.asarray(v), 0.0)


def test_lora_include_blocks_filter():
    cfg = UNetConfig(**TINY, lora_rank=4, lora_include_blocks=("middle_block",))
    model = UNetModel(cfg)
    x, t = jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "lora": jax.random.PRNGKey(1)}, x, t)
    lkeys = {"/".join(k) for k in traverse_util.flatten_dict(variables["lora"])}
    assert lkeys and all(k.startswith("mid_") for k in lkeys)


def test_lora_scale_zero_and_zero_init_match_base():
    """scale=0 short-circuits to the base model (lora.py:32-38); at init
    (up=0) scale=1 must match too."""
    base, lora_model = _models()
    params, lora = _init_all(lora_model)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 1))
    t = jnp.full((2,), 0.4)
    ref = base.apply({"params": params}, x, t)
    out0 = lora_model.apply({"params": params, "lora": lora}, x, t, lora_scale=0.0)
    out1 = lora_model.apply({"params": params, "lora": lora}, x, t, lora_scale=1.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref), atol=1e-6)
    # non-zero up weights + scale 1 must CHANGE the output
    bumped = jax.tree_util.tree_map(lambda v: v + 0.01, lora)
    out2 = lora_model.apply({"params": params, "lora": bumped}, x, t, lora_scale=1.0)
    assert np.abs(np.asarray(out2) - np.asarray(ref)).max() > 1e-5
    # ... but scale 0 still short-circuits
    out3 = lora_model.apply({"params": params, "lora": bumped}, x, t, lora_scale=0.0)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref), atol=1e-6)


def test_bias_split_rule():
    """Trainable = all biases except ResBlock 'emb' projections
    (adaptation.py:39-41); norm scales and kernels stay frozen."""
    _, lora_model = _models()
    params, _ = _init_all(lora_model)
    biases, frozen = split_adapt_params(params)
    assert all(k[-1] == "bias" for k in biases)
    assert not any("emb" in k[:-1] for k in biases)
    emb_biases = [k for k in frozen
                  if k[-1] == "bias" and "emb" in k[:-1]]
    assert emb_biases, "expected frozen emb biases"
    assert not any(k[-1] in ("kernel", "scale") for k in biases)
    merged = merge_adapt_params(frozen, biases)
    jax.tree_util.tree_map(np.testing.assert_array_equal, merged, params)


def test_tv_loss_matches_reference_formula():
    x = np.arange(2 * 5 * 4 * 1, dtype=np.float32).reshape(2, 5, 4, 1)
    x[0, 2, 1, 0] = -3.0
    # reference formula in NCHW (adaptation.py:7-11)
    xc = x.transpose(0, 3, 1, 2)
    dh = np.abs(xc[..., :, 1:] - xc[..., :, :-1])
    dw = np.abs(xc[..., 1:, :] - xc[..., :-1, :])
    want = np.sum(dh[..., :-1, :] + dw[..., :, :-1])
    got = float(tv_loss(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_adapted_sampler_end_to_end_improves_datafit():
    """4-step adapted DDS on a tiny problem runs compiled and the adapted
    reconstruction fits the measurement better than the unadapted one."""
    _, lora_model = _models()
    params, _ = _init_all(lora_model)
    sde = VESDE(sigma_min=0.01, sigma_max=5.0)
    trafo = make_parallel_beam_trafo((16, 16), 10)
    gt = np.zeros((1, 16, 16, 1), np.float32)
    gt[0, 5:11, 5:11, 0] = 1.0
    obs = simulate(jax.random.PRNGKey(3), jnp.asarray(gt), trafo, 0.01)

    def build(num_optim_step):
        return get_standard_adapted_sampler(
            "dds", lora_model, params, sde, trafo, obs, num_steps=4,
            im_shape=(16, 16, 1), num_optim_step=num_optim_step,
            adapt_freq=1, lr=1e-2, dc_type="cg", cg_iter=2, add_cg=True,
            ground_truth=jnp.asarray(gt))

    x_unadapted, _ = build(0).sample(jax.random.PRNGKey(0))
    x_adapted, trace = build(6).sample(jax.random.PRNGKey(0), return_trace=True)
    assert np.isfinite(np.asarray(x_adapted)).all()
    assert trace.shape == (4,)

    def datafit(x):
        return float(jnp.mean((trafo.apply(x) - obs) ** 2))

    assert datafit(x_adapted) < datafit(x_unadapted)


def test_sample_batched_matches_serial():
    """The vmapped multi-image path reproduces the single-image program
    row-for-row (same key, same observation, same LoRA init)."""
    _, lora_model = _models()
    params, _ = _init_all(lora_model)
    sde = VESDE(sigma_min=0.01, sigma_max=5.0)
    trafo = make_parallel_beam_trafo((16, 16), 10)
    gts = np.zeros((2, 1, 16, 16, 1), np.float32)
    gts[0, 0, 5:11, 5:11, 0] = 1.0
    gts[1, 0, 3:8, 6:14, 0] = 0.7
    obs = [simulate(jax.random.fold_in(jax.random.PRNGKey(3), i),
                    jnp.asarray(g), trafo, 0.01) for i, g in enumerate(gts)]

    sampler = get_standard_adapted_sampler(
        "dds", lora_model, params, sde, trafo, obs[0], num_steps=3,
        im_shape=(16, 16, 1), num_optim_step=2, adapt_freq=1, lr=1e-2,
        dc_type="cg", cg_iter=2, add_cg=True)
    keys = [jax.random.PRNGKey(11), jax.random.PRNGKey(22)]

    x0, _ = sampler.sample(keys[0])
    sampler.observation = obs[1]
    sampler.rhs = trafo.adjoint(obs[1])
    x1, _ = sampler.sample(keys[1])

    xb = sampler.sample_batched(jnp.stack(keys), jnp.stack(obs))
    assert xb.shape == (2, 1, 16, 16, 1)
    # batch-2 convs tile differently from batch-1 (float noise ~1e-7),
    # amplified ~2e-4 by the inner Adam loop — equivalence, not bitwise
    np.testing.assert_allclose(np.asarray(xb[0]), np.asarray(x0),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xb[1]), np.asarray(x1),
                               rtol=1e-3, atol=1e-5)


def test_adapt_freq_gating():
    """adapt_freq=2 must adapt on steps 0 and 2 only — verify it changes the
    result vs adapt_freq=1 but still adapts vs no adaptation."""
    _, lora_model = _models()
    params, _ = _init_all(lora_model)
    sde = VESDE(sigma_min=0.01, sigma_max=5.0)
    trafo = make_parallel_beam_trafo((16, 16), 10)
    gt = np.zeros((1, 16, 16, 1), np.float32)
    gt[0, 4:12, 6:10, 0] = 1.0
    obs = simulate(jax.random.PRNGKey(3), jnp.asarray(gt), trafo, 0.01)

    def run(adapt_freq, num_optim_step=3):
        s = get_standard_adapted_sampler(
            "dds", lora_model, params, sde, trafo, obs, num_steps=4,
            im_shape=(16, 16, 1), num_optim_step=num_optim_step,
            adapt_freq=adapt_freq, lr=1e-2, dc_type="none")
        x, _ = s.sample(jax.random.PRNGKey(0))
        return np.asarray(x)

    x1, x2, x0 = run(1), run(2), run(1, num_optim_step=0)
    assert np.abs(x1 - x2).max() > 1e-7
    assert np.abs(x2 - x0).max() > 1e-7


def test_full_decoder_split_rules():
    """'full' marks everything trainable; 'decoder' marks exactly the
    output_blocks + final norm/conv minus emb projections
    (reference _score_model_adpt, adaptation.py:23-31)."""
    base, _ = _models()
    params, _ = _init_all(UNetModel(UNetConfig(**TINY, lora_rank=4)))
    flat = traverse_util.flatten_dict(params)

    train_f, frozen_f = split_adapt_params(params, impl="full")
    assert len(train_f) == len(flat) and not frozen_f

    train_d, frozen_d = split_adapt_params(params, impl="decoder")
    assert train_d and frozen_d
    for k in train_d:
        assert k[0].startswith("out_") or k[0] in ("final_norm", "final_conv")
        assert "emb" not in k[:-1]
    # encoder/middle/time-embedding params stay frozen
    assert any(k[0].startswith("in_") for k in frozen_d)
    assert any(k[0].startswith("mid_") for k in frozen_d)
    assert any(k[0].startswith("time_dense") for k in frozen_d)
    # decoder emb projections stay frozen too
    assert any(k[0].startswith("out_") and "emb" in k[:-1] for k in frozen_d)
    merged = merge_adapt_params(frozen_d, train_d)
    jax.tree_util.tree_map(np.testing.assert_array_equal, merged, params)


@pytest.mark.parametrize("impl", ["full", "decoder"])
def test_full_decoder_adaptation_end_to_end(impl):
    """full/decoder strategies run compiled end-to-end (no LoRA collection)
    and improve the data fit like the LoRA path does."""
    base, _ = _models()
    x, t = jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,))
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, t)
    rng = np.random.default_rng(7)
    params = jax.tree_util.tree_map(
        lambda v: (jnp.asarray(rng.normal(0, 0.02, v.shape).astype(np.float32))
                   if not np.asarray(v).any() else v),
        variables["params"])
    sde = VESDE(sigma_min=0.01, sigma_max=5.0)
    trafo = make_parallel_beam_trafo((16, 16), 10)
    gt = np.zeros((1, 16, 16, 1), np.float32)
    gt[0, 5:11, 5:11, 0] = 1.0
    obs = simulate(jax.random.PRNGKey(3), jnp.asarray(gt), trafo, 0.01)

    def build(num_optim_step):
        return get_standard_adapted_sampler(
            "dds", base, params, sde, trafo, obs, num_steps=4,
            im_shape=(16, 16, 1), num_optim_step=num_optim_step,
            adapt_freq=1, lr=1e-2, dc_type="cg", cg_iter=2, add_cg=True,
            adaptation=impl)

    x_unadapted, _ = build(0).sample(jax.random.PRNGKey(0))
    x_adapted, _ = build(6).sample(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(x_adapted)).all()

    def datafit(x):
        return float(jnp.mean((trafo.apply(x) - obs) ** 2))

    assert datafit(x_adapted) < datafit(x_unadapted)
