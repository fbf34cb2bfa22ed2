"""FFT shear-rotation Radon operator: adjointness + cross-check against the
Joseph ELL matrix operator (the two `impl`s of `make_parallel_beam_trafo`,
mirroring the reference's odl/torch-radon cross-check, trafo.py:17)."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from diffusion_models_dev_project_tpu.physics.ray_trafo import make_parallel_beam_trafo
from diffusion_models_dev_project_tpu.utils.metrics import PSNR


def _blob(h, w):
    img = np.zeros((h, w), np.float32)
    img[h // 5:h // 2, w // 2:w - w // 5] = 1.0
    img[int(h * 0.6):int(h * 0.8), int(w * 0.2):int(w * 0.5)] = 0.7
    return gaussian_filter(img, 2.0)


def test_fft_matches_matrix_impl():
    fft = make_parallel_beam_trafo((64, 64), 12, impl="fft")
    mat = make_parallel_beam_trafo((64, 64), 12, impl="matrix")
    assert fft.obs_shape == mat.obs_shape
    x = jnp.asarray(_blob(64, 64))[None, :, :, None]
    a, b = np.asarray(fft.apply(x)), np.asarray(mat.apply(x))
    rel = np.abs(a - b).max() / b.max()
    assert rel < 0.02, rel
    # adjoint agreement on a sinogram
    y = mat.apply(x)
    aa, bb = np.asarray(fft.adjoint(y)), np.asarray(mat.adjoint(y))
    rel = np.linalg.norm(aa - bb) / np.linalg.norm(bb)
    assert rel < 0.03, rel


def test_fft_adjointness_exact():
    fft = make_parallel_beam_trafo((32, 32), 7, impl="fft")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, *fft.obs_shape, 1)).astype(np.float32))
    lhs = float(jnp.vdot(fft.apply(x), y))
    rhs = float(jnp.vdot(x, fft.adjoint(y)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_fft_fbp_recovers_image():
    fft = make_parallel_beam_trafo((64, 64), 60, impl="fft")
    gt = _blob(64, 64)
    x = jnp.asarray(gt)[None, :, :, None]
    rec = np.asarray(fft.fbp(fft.apply(x)))[0, :, :, 0]
    assert PSNR(rec, gt) > 25.0


def test_fft_jits_and_grads():
    fft = make_parallel_beam_trafo((32, 32), 7, impl="fft")
    x = jnp.ones((1, 32, 32, 1))

    @jax.jit
    def loss(trafo, x):
        return jnp.sum(trafo.apply(x) ** 2)

    g = jax.grad(loss, argnums=1)(fft, x)
    assert np.isfinite(np.asarray(g)).all()
    # gradient of ||Ax||^2 is 2 AᵀAx
    want = 2 * fft.adjoint(fft.apply(x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=1e-3,
                               atol=1e-4)


def test_precision_field_roundtrip():
    """The `precision` knob survives pytree flatten/unflatten and jit, and
    stays numerically identical on CPU (precision only changes TPU MXU
    pass count)."""
    import dataclasses

    fft = make_parallel_beam_trafo((32, 32), 7, impl="fft")
    fast = dataclasses.replace(fft, precision="high")
    leaves, treedef = jax.tree_util.tree_flatten(fast)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.precision == "high"
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 32, 32, 1)).astype(np.float32))
    a = np.asarray(jax.jit(lambda tr, xx: tr.apply(xx))(fast, x))
    b = np.asarray(fft.apply(x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_coprime_angle_counts_stay_quadrant_batched():
    """Angle counts whose quadrant-group sizes are coprime (e.g. 90 ->
    [23, 44, 23]) must still produce one stack entry per distinct quadrant
    — the earlier gcd chunking degenerated to one chunk PER ANGLE here —
    and the operator must stay numerically consistent with the ELL path."""
    import numpy as np
    import jax.numpy as jnp

    from diffusion_models_dev_project_tpu.physics.fft_radon import (
        make_fft_parallel_trafo)
    from diffusion_models_dev_project_tpu.physics.ray_trafo import (
        make_parallel_beam_trafo)

    for n_ang in (10, 90):
        fft = make_fft_parallel_trafo((32, 32), n_ang)

        assert fft.det_matrix.shape[0] == len(set(fft.k90s)) <= 4
        assert fft.det_matrix.shape[0] * fft.det_matrix.shape[1] >= n_ang
        ell = make_parallel_beam_trafo((32, 32), n_ang, impl="matrix")
        rng = np.random.default_rng(3)
        x = jnp.asarray(_blob(32, 32))[None, :, :, None]
        ya, yb = np.asarray(fft.apply(x)), np.asarray(ell.apply(x))
        rel = np.abs(ya - yb).max() / (np.abs(yb).max() + 1e-9)
        assert rel < 0.02, rel
        # adjointness of the padded/stacked operator
        y = jnp.asarray(rng.random(ya.shape, np.float32))
        lhs = float(jnp.vdot(fft.apply(x), y))
        rhs = float(jnp.vdot(x, fft.adjoint(y)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_fused_gram_matches_adjoint_apply():
    """`with_gram().gram(x)` must equal adjoint(apply(x)) to round-off —
    including at angle counts that force padded duplicate slots (90 ->
    pad-to-max stacking), whose contributions must be masked out of the
    detector-stage Gram."""
    import numpy as np
    import jax.numpy as jnp

    from diffusion_models_dev_project_tpu.physics.fft_radon import (
        make_fft_parallel_trafo)

    rng = np.random.default_rng(7)
    for n_ang in (60, 90):
        trafo = make_fft_parallel_trafo((32, 32), n_ang).with_gram()
        assert trafo.gram_q is not None
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)).astype(np.float32))
        ref = np.asarray(trafo.adjoint(trafo.apply(x)))
        fused = np.asarray(trafo.gram(x))
        rel = np.abs(fused - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 5e-5, (n_ang, rel)


def test_fused_gram_inside_dds_cg_is_identical():
    """The CG data-consistency solve with the fused Gram operator must give
    the same result as the unfused one (make_dc_op dispatch)."""
    import numpy as np
    import jax.numpy as jnp

    from diffusion_models_dev_project_tpu.physics.fft_radon import (
        make_fft_parallel_trafo)
    from diffusion_models_dev_project_tpu.sampling.predictors import make_dc_op
    from diffusion_models_dev_project_tpu.ops.cg import cg

    rng = np.random.default_rng(11)
    plain = make_fft_parallel_trafo((32, 32), 30)
    fused = plain.with_gram()
    x0 = jnp.asarray(rng.standard_normal((1, 32, 32, 1)).astype(np.float32))
    rhs = jnp.asarray(rng.standard_normal((1, 32, 32, 1)).astype(np.float32))
    out_a = np.asarray(cg(make_dc_op(plain, 0.01), x0, x0 + 0.01 * rhs, 5))
    out_b = np.asarray(cg(make_dc_op(fused, 0.01), x0, x0 + 0.01 * rhs, 5))
    np.testing.assert_allclose(out_a, out_b, rtol=2e-4, atol=2e-5)
