import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_models_dev_project_tpu.ops import VESDE, VPSDE, DDPM

from _reference import load_ref_sde

ref_sde = load_ref_sde()


def test_vesde_closed_forms():
    sde = VESDE(sigma_min=0.01, sigma_max=100.0)
    t = jnp.array([0.0, 0.5, 1.0])
    std = sde.marginal_prob_std(t)
    np.testing.assert_allclose(std, [0.01, np.sqrt(0.01 * 100.0), 100.0], rtol=1e-5)
    np.testing.assert_allclose(sde.marginal_prob_mean(t), np.ones(3), rtol=1e-6)
    # diffusion^2 = d/dt sigma^2(t)  (VE property)
    eps = 1e-4
    for tv in [0.3, 0.7]:
        g = float(sde.diffusion_coeff(jnp.array(tv)))
        dsig2 = (float(sde.marginal_prob_std(jnp.array(tv + eps))) ** 2
                 - float(sde.marginal_prob_std(jnp.array(tv - eps))) ** 2) / (2 * eps)
        assert abs(g ** 2 - dsig2) / dsig2 < 1e-2


def test_vpsde_closed_forms():
    sde = VPSDE(beta_min=0.1, beta_max=10.0)
    t = jnp.array([0.0, 0.5, 1.0])
    mean = sde.marginal_prob_mean(t)
    std = sde.marginal_prob_std(t)
    # variance preserving: mean^2 + std^2 = 1
    np.testing.assert_allclose(mean ** 2 + std ** 2, np.ones(3), atol=1e-5)
    np.testing.assert_allclose(mean[0], 1.0, atol=1e-6)
    lm = -0.25 * 0.5 ** 2 * (10.0 - 0.1) - 0.5 * 0.5 * 0.1
    np.testing.assert_allclose(mean[1], np.exp(lm), rtol=1e-5)


def test_ddpm_alpha_cumprod_endpoints():
    sde = DDPM(beta_min=1e-4, beta_max=0.02, num_steps=1000)
    # t = -1 -> alpha_bar = 1 (no noise)
    np.testing.assert_allclose(sde.marginal_prob_mean(jnp.array([-1])), [1.0], atol=1e-7)
    np.testing.assert_allclose(sde.marginal_prob_std(jnp.array([-1])), [0.0], atol=1e-7)
    betas = np.linspace(1e-4, 0.02, 1000, dtype=np.float64)
    bar = np.cumprod(1 - betas)
    np.testing.assert_allclose(
        sde.marginal_prob_mean(jnp.array([999])), [np.sqrt(bar[-1])], rtol=1e-5)


def test_vpsde_small_t_accuracy():
    """Our expm1 formulation matches the float64 closed form at small t."""
    sde = VPSDE(0.1, 10.0)
    t64 = np.array([1e-3, 1e-2], dtype=np.float64)
    lm = -0.25 * t64 ** 2 * (10.0 - 0.1) - 0.5 * t64 * 0.1
    exact = np.sqrt(-np.expm1(2 * lm))
    ours = np.asarray(sde.marginal_prob_std(jnp.asarray(t64.astype(np.float32))))
    np.testing.assert_allclose(ours, exact, rtol=1e-4)


def test_marginal_prob_broadcasting():
    sde = VPSDE()
    x = jnp.ones((2, 8, 8, 1))
    t = jnp.array([0.1, 0.9])
    mean, std = sde.marginal_prob(x, t)
    assert mean.shape == x.shape
    assert std.shape == (2,)
    assert float(mean[0, 0, 0, 0]) > float(mean[1, 0, 0, 0])


def test_sde_hashable_static():
    # frozen dataclasses must be usable as static jit closures without retrace
    sde = DDPM()
    assert hash(sde) == hash(DDPM())
    n_traces = []

    @jax.jit
    def f(t):
        n_traces.append(1)
        return sde.marginal_prob_std(t)

    f(jnp.array([3]))
    f(jnp.array([5]))
    assert len(n_traces) == 1


@pytest.mark.skipif(ref_sde is None, reason="reference oracle unavailable")
@pytest.mark.parametrize("name", ["vesde", "vpsde", "ddpm"])
def test_golden_vs_reference(name):
    import torch

    # start at t=0.05: below that the reference's fp32 `1-exp` formulation
    # loses precision (we use expm1 and are closer to the exact value —
    # see test_vpsde_small_t_accuracy)
    tvals = np.linspace(0.05, 1.0, 7).astype(np.float32)
    if name == "vesde":
        ours, theirs = VESDE(0.01, 100.0), ref_sde.VESDE(0.01, 100.0)
        t_ref = torch.from_numpy(tvals)
        t_our = jnp.asarray(tvals)
        np.testing.assert_allclose(
            np.asarray(ours.diffusion_coeff(t_our)), theirs.diffusion_coeff(t_ref).numpy(),
            rtol=1e-5)
    elif name == "vpsde":
        ours, theirs = VPSDE(0.1, 10.0), ref_sde.VPSDE(0.1, 10.0)
        t_ref = torch.from_numpy(tvals)
        t_our = jnp.asarray(tvals)
        np.testing.assert_allclose(
            np.asarray(ours.diffusion_coeff(t_our)), theirs.diffusion_coeff(t_ref).numpy(),
            rtol=1e-5)
    else:
        ours, theirs = DDPM(1e-4, 0.02, 1000), ref_sde.DDPM(1e-4, 0.02, 1000)
        ivals = np.array([-1, 0, 10, 500, 999], dtype=np.int64)
        t_ref = torch.from_numpy(ivals)
        t_our = jnp.asarray(ivals)
    # rtol 1e-4: the reference's fp32 `1-exp` formulation carries ~4e-5
    # relative noise at small t (we are closer to the exact value)
    np.testing.assert_allclose(
        np.asarray(ours.marginal_prob_std(t_our)),
        theirs.marginal_prob_std(t_ref).numpy(), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(ours.marginal_prob_mean(t_our)),
        theirs.marginal_prob_mean(t_ref).numpy(), rtol=1e-4, atol=1e-7)
