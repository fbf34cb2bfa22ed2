import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_models_dev_project_tpu.physics import (
    make_parallel_beam_trafo, make_matmul_trafo, parallel_beam_geometry, simulate)


@pytest.fixture(scope="module")
def trafo64():
    return make_parallel_beam_trafo((64, 64), 20)


def _phantom(h, w):
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    img = ((xx / 0.7) ** 2 + (yy / 0.5) ** 2 < 1).astype(np.float32)
    img += 0.5 * (((xx - 0.2) / 0.2) ** 2 + (yy / 0.2) ** 2 < 1)
    return img


def test_geometry_matches_odl_convention():
    g = parallel_beam_geometry((256, 256), 60)
    rho = np.hypot(128, 128)
    assert g.det_count == 2 * int(np.ceil(rho)) + 1 == 365
    assert len(g.angles) == 60
    np.testing.assert_allclose(g.angles[0], 0.5 * np.pi / 60)
    np.testing.assert_allclose(g.angles[-1], np.pi - 0.5 * np.pi / 60)


def test_adjointness(trafo64):
    """⟨Ax, y⟩ == ⟨x, Aᵀy⟩ to fp32 precision (SURVEY.md §4 requirement)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 64, 64, 1))
    y = jax.random.normal(jax.random.PRNGKey(1), (1, *trafo64.obs_shape, 1))
    lhs = float(jnp.vdot(trafo64.apply(x), y))
    rhs = float(jnp.vdot(x, trafo64.adjoint(y)))
    assert abs(lhs - rhs) / abs(lhs) < 1e-5


def test_forward_known_integral(trafo64):
    """Projection of a uniform disk ≈ chord length * value, angle-independent."""
    h = w = 64
    yy, xx = np.meshgrid(np.arange(h) - (h - 1) / 2, np.arange(w) - (w - 1) / 2,
                         indexing="ij")
    r = 20.0
    disk = ((xx ** 2 + (-(yy)) ** 2) < r ** 2).astype(np.float32)
    sino = np.asarray(trafo64.apply(jnp.asarray(disk)[None, :, :, None]))[0, :, :, 0]
    # central detector bin: chord = 2r
    centre = sino[:, sino.shape[1] // 2]
    np.testing.assert_allclose(centre, 2 * r, rtol=0.06)
    # total mass per angle equals sum of pixel values * det spacing factor
    mass = sino.sum(axis=1) * 1.0
    assert mass.std() / mass.mean() < 0.02


def test_fbp_recovers_phantom(trafo64):
    x = jnp.asarray(_phantom(64, 64))[None, :, :, None]
    rec = np.asarray(trafo64.fbp(trafo64.apply(x)))[0, :, :, 0]
    gt = np.asarray(x)[0, :, :, 0]
    # limited angles -> imperfect, but should correlate strongly and be scaled right
    corr = np.corrcoef(rec.ravel(), gt.ravel())[0, 1]
    assert corr > 0.9
    assert abs(rec.mean() / gt.mean() - 1.0) < 0.25


def test_custom_vjp_matches_adjoint(trafo64):
    """grad of 0.5||y - Ax||^2 must equal -Aᵀ(y - Ax)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 64, 64, 1))
    y = jax.random.normal(jax.random.PRNGKey(1), (1, *trafo64.obs_shape, 1))

    def loss(x):
        r = trafo64.apply(x) - y
        return 0.5 * jnp.sum(r * r)

    g = jax.grad(loss)(x)
    expected = trafo64.adjoint(trafo64.apply(x) - y)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected), rtol=1e-4, atol=1e-4)


def test_matmul_trafo_dense_equivalence():
    """A matmul trafo built from an explicit matrix reproduces the matrix."""
    rng = np.random.default_rng(0)
    H = W = 8
    A = (rng.random((12, H * W)) < 0.2).astype(np.float32) * rng.random((12, H * W)).astype(np.float32)
    t = make_matmul_trafo(A, im_shape=(H, W), obs_shape=(3, 4), calibrate_fbp=False)
    x = rng.normal(size=(1, H, W, 1)).astype(np.float32)
    got = np.asarray(t.apply(jnp.asarray(x)))[0, :, :, 0].reshape(-1)
    np.testing.assert_allclose(got, A @ x.reshape(-1), rtol=1e-5, atol=1e-5)
    y = rng.normal(size=(1, 3, 4, 1)).astype(np.float32)
    got_adj = np.asarray(t.adjoint(jnp.asarray(y)))[0, :, :, 0].reshape(-1)
    np.testing.assert_allclose(got_adj, A.T @ y.reshape(-1), rtol=1e-5, atol=1e-5)


def test_matmul_trafo_resize():
    rng = np.random.default_rng(0)
    H = W = 8
    A = rng.random((12, H * W)).astype(np.float32)
    t = make_matmul_trafo(A, im_shape=(H, W), obs_shape=(3, 4), resize_shape=(4, 4),
                          calibrate_fbp=False)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 1)).astype(np.float32))
    y = t.apply(x)
    assert y.shape == (1, 3, 4, 1)
    back = t.adjoint(y)
    assert back.shape == (1, 4, 4, 1)


def test_simulate_noise_level(trafo64):
    x = jnp.asarray(_phantom(64, 64))[None, :, :, None]
    y, lvl = simulate(jax.random.PRNGKey(0), x, trafo64, 0.05, return_noise_level=True)
    clean = trafo64.apply(x)
    expected = 0.05 * float(jnp.mean(jnp.abs(clean)))
    np.testing.assert_allclose(float(lvl), expected, rtol=1e-5)
    resid_std = float(jnp.std(y - clean))
    assert abs(resid_std / expected - 1) < 0.1


def test_trafo_is_jit_compatible(trafo64):
    @jax.jit
    def f(t, x):
        return t.adjoint(t.apply(x))

    x = jnp.ones((1, 64, 64, 1))
    out = f(trafo64, x)
    assert out.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()
