"""Golden parity: our Tweedie/DDIM/CG math vs the reference's torch
implementations on identical random inputs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_models_dev_project_tpu.ops.cg import cg
from diffusion_models_dev_project_tpu.ops.diffusion import ddim, tweedy
from diffusion_models_dev_project_tpu.ops.sde import DDPM, VESDE, VPSDE

from _reference import load_ref_samplers, load_ref_sde

ref_s = load_ref_samplers()
ref_sde = load_ref_sde()
pytestmark = pytest.mark.skipif(ref_s is None, reason="reference unavailable")


def _pair(name):
    if name == "vesde":
        return VESDE(0.01, 100.0), ref_sde.VESDE(0.01, 100.0), 0.4
    if name == "vpsde":
        return VPSDE(0.1, 10.0), ref_sde.VPSDE(0.1, 10.0), 0.4
    return DDPM(1e-4, 0.02, 1000), ref_sde.DDPM(1e-4, 0.02, 1000), 400


@pytest.mark.parametrize("name", ["vesde", "vpsde", "ddpm"])
def test_tweedy_golden(name):
    import torch

    ours, theirs, tval = _pair(name)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    s = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    tt = torch.full((2,), tval)
    if name == "ddpm":
        tt = tt.long()
    want = ref_s.apTweedy(s=torch.from_numpy(s), x=torch.from_numpy(x),
                          sde=theirs, time_step=tt).numpy()
    t_our = jnp.full((2,), tval, jnp.int32 if name == "ddpm" else jnp.float32)
    got = tweedy(jnp.asarray(s.transpose(0, 2, 3, 1)),
                 jnp.asarray(x.transpose(0, 2, 3, 1)), ours, t_our)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("name,simplified", [("vesde", True), ("vesde", False),
                                             ("vpsde", False), ("ddpm", True),
                                             ("ddpm", False)])
def test_ddim_golden_deterministic(name, simplified):
    """eta=0 removes the stochastic term; the deterministic parts must agree
    (reference `ddim`, samplers/utils.py:338-368)."""
    import torch

    ours, theirs, tval = _pair(name)
    rng = np.random.default_rng(1)
    s = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    xhat = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    if name == "ddpm":
        t_pair_ref = (torch.full((2,), 400).long(), torch.full((2,), 300).long())
        t_our, tp_our = jnp.full((2,), 400, jnp.int32), jnp.full((2,), 300, jnp.int32)
        step_size = None
    else:
        t_pair_ref = torch.full((2,), tval)
        t_our = jnp.full((2,), tval)
        step_size = 0.1
        tp_our = t_our - step_size
    want = ref_s.ddim(sde=theirs, s=torch.from_numpy(s),
                      xhat=torch.from_numpy(xhat), time_step=t_pair_ref,
                      step_size=step_size, eta=0.0,
                      use_simplified_eqn=simplified).numpy()
    got = ddim(ours, jnp.asarray(s.transpose(0, 2, 3, 1)),
               jnp.asarray(xhat.transpose(0, 2, 3, 1)), t_our, tp_our,
               eta=0.0, key=jax.random.PRNGKey(0),
               use_simplified_eqn=simplified)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=1e-5)


def test_cg_golden():
    import torch

    rng = np.random.default_rng(2)
    x0 = rng.normal(size=(2, 1, 6, 6)).astype(np.float32)
    rhs = rng.normal(size=(2, 1, 6, 6)).astype(np.float32)
    gamma = 0.3

    def op_t(z):
        return z + gamma * z.mean(dim=(-1, -2), keepdim=True)

    def op_j(z):
        return z + gamma * z.mean(axis=(-1, -2), keepdims=True)

    want = ref_s.cg(op=op_t, x=torch.from_numpy(x0.copy()),
                    rhs=torch.from_numpy(rhs), n_iter=5).numpy()
    got = cg(op_j, jnp.asarray(x0), jnp.asarray(rhs), n_iter=5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)
