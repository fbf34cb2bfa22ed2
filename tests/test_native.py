"""Native (C++) vs numpy system-matrix assembly parity."""
import numpy as np
import pytest
import scipy.sparse as sp

from diffusion_models_dev_project_tpu.physics import native
from diffusion_models_dev_project_tpu.physics.geometry import (
    parallel_beam_geometry)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _numpy_joseph(geom):
    """The pure-numpy reference path (geometry.py body)."""
    import diffusion_models_dev_project_tpu.physics.geometry as G

    # bypass the native fast path by calling with library hidden
    lib, G_native = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        rows, cols, vals = G.joseph_system_matrix(geom)
    finally:
        native._LIB, native._TRIED = lib, G_native
    return rows, cols, vals


def test_joseph_native_matches_numpy():
    geom = parallel_beam_geometry((48, 48), 14)
    r1, c1, v1 = native.native_joseph_coo(
        geom.angles, *geom.im_shape, geom.det_count, geom.det_spacing)
    r0, c0, v0 = _numpy_joseph(geom)
    n = geom.det_count * len(geom.angles)
    m = geom.im_shape[0] * geom.im_shape[1]
    a = sp.coo_matrix((v1, (r1, c1)), shape=(n, m)).toarray()
    b = sp.coo_matrix((v0, (r0, c0)), shape=(n, m)).toarray()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_cone_native_matches_numpy():
    from diffusion_models_dev_project_tpu.physics.cone_beam import (
        ConeVecGeometry, circular_cone_vecs, masked_slice_matrix)

    vecs = circular_cone_vecs(8, 40.0, 20.0, det_spacing=(0.8, 0.8))
    geom = ConeVecGeometry(vecs=vecs, num_rows=4, num_cols=24,
                           vol_shape=(3, 17, 17), vox_size=1.0)
    mask = np.ones(geom.proj_shape, bool)
    a = masked_slice_matrix(geom, mask).toarray()

    lib, tried = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        b = masked_slice_matrix(geom, mask).toarray()
    finally:
        native._LIB, native._TRIED = lib, tried
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
