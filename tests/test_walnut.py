"""Cone-beam projector + walnut workload tests on a miniature synthetic
dataset (the real 5 GB CWI walnut data is not available in CI; the pipeline
is exercised end-to-end through the same code paths)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_models_dev_project_tpu.physics.cone_beam import (
    ConeVecGeometry, bp3d, circular_cone_vecs, fp3d, make_fp3d,
    masked_slice_matrix)
from diffusion_models_dev_project_tpu.physics.walnut import (
    MaskedWalnutRayTrafo, WalnutDatasetSpec, build_proj_geometry,
    get_single_slice_ray_trafo, get_walnut_2d_ray_trafo,
    load_masked_ray_trafo_matrix, matrix_filename,
    save_masked_ray_trafo_matrix)

MINI_SPEC = WalnutDatasetSpec(projs_rows=32, projs_cols=48,
                              max_num_angles=24, vol_sz=(33, 33, 33),
                              vox_sz=1.0)
MINI_SLICE_CFG = dict(num_slices=5, slice_offset=0, num_proj_rows=5,
                      first_proj_row=13)


def _mini_vecs():
    return circular_cone_vecs(MINI_SPEC.max_num_angles, src_radius=60.0,
                              det_radius=30.0, det_spacing=(0.9, 0.9))


def _mini_geom(**kw):
    return build_proj_geometry(_mini_vecs(), angular_sub_sampling=2,
                               first_proj_row=MINI_SLICE_CFG["first_proj_row"],
                               num_proj_rows=MINI_SLICE_CFG["num_proj_rows"],
                               num_slices=MINI_SLICE_CFG["num_slices"],
                               spec=MINI_SPEC, **kw)


def test_fp3d_bp3d_adjointness():
    geom = _mini_geom()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=geom.vol_shape).astype(np.float32))
    y = jnp.asarray(rng.normal(size=geom.proj_shape).astype(np.float32))
    ax = fp3d(x, geom)
    aty = bp3d(y, geom)
    lhs = float(jnp.vdot(ax, y))
    rhs = float(jnp.vdot(x, aty))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_fp3d_ball_sanity():
    """Projection of a centred ball: positive where rays hit it, maximal
    near the detector center, and scaling ~ chord length."""
    geom = _mini_geom()
    zz, yy, xx = np.meshgrid(*[np.arange(n) - (n - 1) / 2
                               for n in geom.vol_shape], indexing="ij")
    ball = ((zz ** 2 + yy ** 2 + xx ** 2) < 8 ** 2).astype(np.float32)
    projs = np.asarray(fp3d(ball, geom))
    assert projs.max() > 0
    # central row/col should see ~ the diameter (16), within discretization
    center = projs[projs.shape[0] // 2, :, projs.shape[2] // 2]
    assert np.all(center > 10.0) and np.all(center < 20.0)


def test_masked_trafo_mask_and_matrix_consistency():
    geom = _mini_geom()
    trafo = MaskedWalnutRayTrafo(geom=geom, vol_mask_slice=3)
    # k=1 selection: exactly one row per (angle, col)
    assert trafo.proj_mask.sum(axis=0).max() == 1
    assert trafo.proj_mask.sum() == geom.num_angles * geom.num_cols

    mat = trafo.assemble_matrix()
    assert mat.shape == (trafo.num_projs_in_mask,
                         geom.vol_shape[1] * geom.vol_shape[2])

    # matrix @ img must equal fp3d of the edge-padded volume, masked
    rng = np.random.default_rng(1)
    img = rng.random(geom.vol_shape[1:]).astype(np.float32)
    vol = np.broadcast_to(img, geom.vol_shape).copy()
    projs = np.asarray(fp3d(vol, geom))
    want = projs[trafo.proj_mask]
    got = mat @ img.ravel()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def _write_mini_dataset(root):
    """Synthetic walnut-format dataset: .geom file + TIFF projections."""
    import imageio.v2 as imageio

    d = os.path.join(root, "Walnut1", "Projections", "tubeV2")
    os.makedirs(d, exist_ok=True)
    np.savetxt(os.path.join(d, "scan_geom_corrected.geom"), _mini_vecs())

    # phantom slice and its line integrals through the real projector
    geom_full = build_proj_geometry(_mini_vecs(), angular_sub_sampling=1,
                                    spec=MINI_SPEC)
    zz, yy, xx = np.meshgrid(*[np.arange(n) - (n - 1) / 2
                               for n in geom_full.vol_shape], indexing="ij")
    vol = ((yy ** 2 + xx ** 2) < 8 ** 2).astype(np.float32) * 0.05
    projs = np.asarray(fp3d(vol, geom_full))       # (R, A, C)

    # invert the loader's pipeline: intensities = exp(-p)*(flat-dark)+dark,
    # stored per angle as transposed+flipped images (walnut_utils.py:322-345)
    dark = np.full((MINI_SPEC.projs_cols, MINI_SPEC.projs_rows), 10.0, np.float32)
    flat = np.full_like(dark, 1010.0)
    imageio.imwrite(os.path.join(d, "di000000.tif"), dark)
    imageio.imwrite(os.path.join(d, "io000000.tif"), flat)
    imageio.imwrite(os.path.join(d, "io000001.tif"), flat)

    def untrafo(image):  # inverse of np.transpose(np.flipud(im))
        return np.flipud(np.transpose(image))

    for i, idx in enumerate(range(MINI_SPEC.max_num_angles, 0, -1)):
        p = projs[:, i, :]                          # (R, C) for angle i
        intens = np.exp(-p) * (flat.T - dark.T) + dark.T
        imageio.imwrite(os.path.join(d, f"scan_{idx:06}.tif"),
                        untrafo(intens.astype(np.float32)))

    # ground-truth slice files
    rdir = os.path.join(root, "Walnut1", "Reconstructions")
    os.makedirs(rdir, exist_ok=True)
    slice_ind = (MINI_SPEC.vol_sz[0] - 1) // 2 + MINI_SLICE_CFG["slice_offset"]
    imageio.imwrite(os.path.join(rdir, f"full_AGD_50_{slice_ind:06}.tiff"),
                    vol[geom_full.vol_shape[0] // 2].astype(np.float32))
    return vol


def test_walnut_2d_pipeline_end_to_end(tmp_path):
    """geom file -> masked trafo -> matrix assembly -> .mat round trip ->
    RayTransform with resize + FDK fbp -> data loaders."""
    root = str(tmp_path)
    vol = _write_mini_dataset(root)

    rt = get_walnut_2d_ray_trafo(
        root, walnut_id=1, orbit_id=2, angular_sub_sampling=2,
        proj_col_sub_sampling=2, new_shape=(16, 16),
        single_slice_config=MINI_SLICE_CFG, spec=MINI_SPEC)
    assert rt.im_shape == (33, 33)
    assert rt.model_im_shape == (16, 16)
    assert rt.obs_shape[0] == 1 and rt.obs_shape[1] > 0

    # .mat file written in the reference schema and reloadable
    mat_file = os.path.join(root, matrix_filename(1, 2, 2, 2))
    assert os.path.exists(mat_file)
    m = load_masked_ray_trafo_matrix(mat_file)
    assert m.shape == (rt.obs_shape[1], 33 * 33)

    # adjointness of the ELL operator (without resize path)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, *rt.obs_shape, 1)).astype(np.float32))
    # NOTE: with resize, apply/adjoint are not exact adjoints (the reference
    # has the same property, matmul_ray_trafo.py:107-133); check shapes + fbp
    ax = rt.apply(x)
    assert ax.shape == (1, *rt.obs_shape, 1)
    aty = rt.adjoint(y)
    assert aty.shape == (1, 16, 16, 1)

    # FDK fbp of a projected disk recovers the disk (loose check)
    disk = np.zeros((1, 16, 16, 1), np.float32)
    yy, xx = np.meshgrid(np.arange(16) - 7.5, np.arange(16) - 7.5,
                         indexing="ij")
    disk[0, ..., 0] = (yy ** 2 + xx ** 2 < 4 ** 2).astype(np.float32)
    rec = np.asarray(rt.fbp(rt.apply(jnp.asarray(disk))))[0, ..., 0]
    corr = np.corrcoef(rec.ravel(), disk[0, ..., 0].ravel())[0, 1]
    assert corr > 0.7, corr

    # data loaders through the same pipeline
    from diffusion_models_dev_project_tpu.data.walnut import (
        get_walnut_2d_ground_truth, get_walnut_2d_observation)

    obs = get_walnut_2d_observation(
        root, 1, 2, angular_sub_sampling=2, proj_col_sub_sampling=2,
        spec=MINI_SPEC, single_slice_config=MINI_SLICE_CFG)
    assert obs.shape == (1, 1, rt.obs_shape[1], 1)
    gt = get_walnut_2d_ground_truth(root, 1, 2, spec=MINI_SPEC,
                                    single_slice_config=MINI_SLICE_CFG)
    assert gt.shape == (1, 33, 33, 1)

    # the measured flat observation should match A @ gt-slice reasonably
    # (both derive from the same phantom through the same projector)
    slice_img = vol[vol.shape[0] // 2]
    pred = (m @ slice_img.ravel()) * 14.0
    meas = obs[0, 0, :, 0]
    corr = np.corrcoef(pred, meas)[0, 1]
    assert corr > 0.95, corr


def test_dense_impl_matches_ell_forward(tmp_path):
    """impl='dense' (A·R_up precomposed, MXU path) must equal the ELL path's
    forward exactly, and its adjoint must be the exact transpose."""
    root = str(tmp_path)
    _write_mini_dataset(root)
    kw = dict(walnut_id=1, orbit_id=2, angular_sub_sampling=2,
              proj_col_sub_sampling=2, new_shape=(16, 16),
              single_slice_config=MINI_SLICE_CFG, spec=MINI_SPEC)
    ell = get_walnut_2d_ray_trafo(root, **kw, impl="ell")
    dense = get_walnut_2d_ray_trafo(root, **kw, impl="dense")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(dense.apply(x)),
                               np.asarray(ell.apply(x)), rtol=1e-4, atol=1e-5)
    y = jnp.asarray(rng.normal(size=(2, *dense.obs_shape, 1)).astype(np.float32))
    lhs = float(jnp.vdot(dense.apply(x), y))
    rhs = float(jnp.vdot(x, dense.adjoint(y)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)
    # FDK quality comparable between impls
    disk = np.zeros((1, 16, 16, 1), np.float32)
    yy, xx = np.meshgrid(np.arange(16) - 7.5, np.arange(16) - 7.5, indexing="ij")
    disk[0, ..., 0] = (yy ** 2 + xx ** 2 < 4 ** 2).astype(np.float32)
    rec = np.asarray(dense.fbp(dense.apply(jnp.asarray(disk))))[0, ..., 0]
    corr = np.corrcoef(rec.ravel(), disk[0, ..., 0].ravel())[0, 1]
    assert corr > 0.7, corr


def test_fp3d_angle_chunk_streaming_matches():
    """make_fp3d(angle_chunk=...) (lax.map streaming for large detectors)
    must equal the all-at-once path."""
    from diffusion_models_dev_project_tpu.physics.cone_beam import make_fp3d

    geom = _mini_geom()
    rng = np.random.default_rng(4)
    vol = jnp.asarray(rng.random(geom.vol_shape).astype(np.float32))
    a = np.asarray(make_fp3d(geom)(vol))
    b = np.asarray(make_fp3d(geom, angle_chunk=4)(vol))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
