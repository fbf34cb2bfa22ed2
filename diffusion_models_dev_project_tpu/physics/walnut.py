"""Walnut cone-beam CT workload: geometry, masks, slice matrix, 2D operator.

TPU-native counterpart of the reference's walnut interface
(`/root/reference/src/dataset/walnut_utils.py`,
`src/physics/walnut_2d_ray_trafo.py`), built on the JAX cone-beam projector
in `cone_beam.py` instead of ASTRA CUDA:

- `build_proj_geometry` reproduces the measured-geometry arithmetic of
  `get_proj_geom` (walnut_utils.py:239-303): load the per-angle 12-vectors
  from `scan_geom_corrected.geom`, sub-sample angles/rows/cols, shift the
  detector center so the sub-sampled grid coincides with the full grid, and
  scale the row/col step vectors.
- `MaskedWalnutRayTrafo` mirrors the reference class of the same name
  (walnut_utils.py:634-1071): restrict the volume to a z-slab, build the
  projection mask by probing the REAL forward operator with a unit slice
  and selecting the top-k rows per (angle, col) (walnut_utils.py:769-808),
  and run the same coverage self-checks.
- The single-slice system matrix is assembled in ONE vectorized pass over
  masked rays (`cone_beam.masked_slice_matrix`) instead of the reference's
  251k sequential CUDA projections (walnut_utils.py:1127-1166), and is
  saved/loaded in the reference's exact `.mat` schema so matrices are
  interchangeable between the two frameworks.
- `get_walnut_2d_ray_trafo` returns our ELL `RayTransform` over the sparse
  matrix with the 501²->256² model-grid resize and an FDK-style fbp
  (cosine pre-weighting + ramp filter + matrix adjoint, replacing the
  reference's per-call ASTRA FDK host round-trip,
  walnut_2d_ray_trafo.py:15-23).
"""
from __future__ import annotations

import dataclasses
import os
from math import ceil
from typing import Optional, Tuple

import numpy as np

from .cone_beam import ConeVecGeometry, fp3d, masked_slice_matrix
from .ray_trafo import RayTransform, make_matmul_trafo

__all__ = ["SINGLE_SLICE_CONFIGS", "WalnutDatasetSpec", "build_proj_geometry",
           "MaskedWalnutRayTrafo", "get_single_slice_ray_trafo",
           "save_masked_ray_trafo_matrix", "load_masked_ray_trafo_matrix",
           "matrix_filename", "get_walnut_2d_ray_trafo"]

# ---- dataset facts (walnut_utils.py:28-90) --------------------------------
VOXEL_PER_MM = 10
PROJS_ROWS = 972
PROJS_COLS = 768
MAX_NUM_ANGLES = 1200
VOL_SZ = 3 * (50 * VOXEL_PER_MM + 1,)          # (501, 501, 501)
VOX_SZ = 1.0 / VOXEL_PER_MM
VECS_NAME = "scan_geom_corrected.geom"


@dataclasses.dataclass(frozen=True)
class WalnutDatasetSpec:
    """Acquisition-format constants.  The default is the real CWI walnut
    dataset; tests use miniature specs to exercise the full pipeline
    without the (unavailable) 5 GB raw data."""

    projs_rows: int = PROJS_ROWS
    projs_cols: int = PROJS_COLS
    max_num_angles: int = MAX_NUM_ANGLES
    vol_sz: Tuple[int, int, int] = VOL_SZ
    vox_sz: float = VOX_SZ


DEFAULT_SPEC = WalnutDatasetSpec()

SINGLE_SLICE_CONFIGS = {
    1: {2: dict(num_slices=9, slice_offset=3, num_proj_rows=9,
                first_proj_row=474)},
    2: {2: dict(num_slices=25, slice_offset=-11, num_proj_rows=9,
                first_proj_row=474)},
    3: {2: dict(num_slices=25, slice_offset=-11, num_proj_rows=9,
                first_proj_row=474)},
    4: {2: dict(num_slices=25, slice_offset=-11, num_proj_rows=9,
                first_proj_row=475)},
    5: {2: dict(num_slices=25, slice_offset=-11, num_proj_rows=9,
                first_proj_row=474)},
}


def first_col_for_sub_sampling(factor: int,
                               spec: WalnutDatasetSpec = DEFAULT_SPEC) -> int:
    num = ceil(spec.projs_cols / factor)
    return (spec.projs_cols - ((num - 1) * factor + 1)) // 2


def load_geom_vecs(data_path: str, walnut_id: int, orbit_id: int) -> np.ndarray:
    path = os.path.join(data_path, f"Walnut{walnut_id}", "Projections",
                        f"tubeV{orbit_id}", VECS_NAME)
    return np.loadtxt(path)


def build_proj_geometry(
        vecs_all: np.ndarray, *, angular_sub_sampling: int = 10,
        proj_row_sub_sampling: int = 1, proj_col_sub_sampling: int = 1,
        first_proj_row: int = 0, first_proj_col: int = -1,
        num_proj_rows: int = -1, num_slices: int = -1,
        spec: WalnutDatasetSpec = DEFAULT_SPEC) -> ConeVecGeometry:
    """Sub-sampled cone_vec geometry from full-resolution vectors
    (reference `get_proj_geom`, walnut_utils.py:239-303)."""
    vecs = np.array(vecs_all[::angular_sub_sampling], np.float64)
    if num_slices == -1:
        num_slices = spec.vol_sz[0]

    max_rows = len(range(first_proj_row, spec.projs_rows,
                         proj_row_sub_sampling))
    num_proj_rows = max_rows if num_proj_rows == -1 else num_proj_rows
    assert num_proj_rows <= max_rows
    if first_proj_col == -1:
        first_proj_col = first_col_for_sub_sampling(proj_col_sub_sampling, spec)
    num_proj_cols = len(range(first_proj_col, spec.projs_cols,
                              proj_col_sub_sampling))

    # shift the detector center so the sub-sampled grid aligns with the
    # requested rows/cols of the full grid (walnut_utils.py:275-285)
    row_margin_end = (spec.projs_rows - 1) - (
        first_proj_row + (num_proj_rows - 1) * proj_row_sub_sampling)
    vecs[:, 3:6] += (first_proj_row - row_margin_end) / 2 * vecs[:, 9:12]
    col_margin_end = (spec.projs_cols - 1) - (
        first_proj_col + (num_proj_cols - 1) * proj_col_sub_sampling)
    vecs[:, 3:6] += (first_proj_col - col_margin_end) / 2 * vecs[:, 6:9]
    vecs[:, 9:12] *= proj_row_sub_sampling
    vecs[:, 6:9] *= proj_col_sub_sampling

    return ConeVecGeometry(
        vecs=vecs, num_rows=num_proj_rows, num_cols=num_proj_cols,
        vol_shape=(num_slices, spec.vol_sz[1], spec.vol_sz[2]),
        vox_size=spec.vox_sz)


# ------------------------------------------------------------- masked trafo
@dataclasses.dataclass
class MaskedWalnutRayTrafo:
    """Single-slice-masked walnut ray transform (walnut_utils.py:634-1071)."""

    geom: ConeVecGeometry
    vol_mask_slice: int
    proj_mask: np.ndarray = dataclasses.field(init=False)      # (R, A, C) bool
    proj_mask_select_k_rows: int = 1
    oversample: float = 2.0

    def __post_init__(self):
        self.proj_mask = self._build_proj_mask()
        assert np.all(np.any(self.proj_mask, axis=0)), (
            "The projection mask should select at least one row at each "
            "(angle, column)-position.")
        self.num_projs_in_mask = int(self.proj_mask.sum())

    # mask construction by probing the real operator (walnut_utils.py:769-808)
    def _build_proj_mask(self) -> np.ndarray:
        vol_test = np.zeros(self.geom.vol_shape, np.float32)
        vol_test[self.vol_mask_slice] = 1.0
        projs = np.asarray(fp3d(vol_test, self.geom, self.oversample))
        if self.proj_mask_select_k_rows is None:
            return projs > 0.0
        vol_full = np.ones(self.geom.vol_shape, np.float32)
        projs_sum = np.asarray(fp3d(vol_full, self.geom, self.oversample))
        fraction = np.zeros(self.geom.proj_shape)
        valid = projs_sum > 0.0
        fraction[valid] = projs[valid] / projs_sum[valid]
        mask = np.zeros(self.geom.proj_shape, bool)
        for _ in range(self.proj_mask_select_k_rows):
            idx = np.expand_dims(np.argmax(fraction, axis=0), 0)
            assert np.all(np.take_along_axis(projs, idx, axis=0) > 0.0)
            np.put_along_axis(mask, idx, True, axis=0)
            np.put_along_axis(fraction, idx, 0.0, axis=0)
        return mask

    def flat_projs_in_mask(self, projs: np.ndarray) -> np.ndarray:
        """(R, A, C) -> (n_mask,), reference walnut_utils.py:918-928."""
        return np.asarray(projs)[self.proj_mask]

    def inds_in_flat_projs_per_angle(self):
        """Per-angle indices into the flat masked observation
        (walnut_utils.py:810-823)."""
        inds = np.full(self.geom.proj_shape, -1, np.int64)
        inds[self.proj_mask] = np.arange(self.proj_mask.sum())
        return [inds[:, a, :][self.proj_mask[:, a, :]]
                for a in range(self.geom.num_angles)]

    def assemble_matrix(self):
        """Sparse (n_mask, 501*501) single-slice system matrix."""
        return masked_slice_matrix(self.geom, self.proj_mask,
                                   oversample=self.oversample)


def get_single_slice_ray_trafo(
        vecs_all: np.ndarray, walnut_id: int = 1, orbit_id: int = 2,
        angular_sub_sampling: int = 10, proj_col_sub_sampling: int = 1,
        single_slice_config: Optional[dict] = None,
        spec: WalnutDatasetSpec = DEFAULT_SPEC) -> MaskedWalnutRayTrafo:
    """Reference `get_single_slice_ray_trafo` (walnut_utils.py:390-417)."""
    cfg = single_slice_config or SINGLE_SLICE_CONFIGS.get(
        walnut_id, {}).get(orbit_id)
    if cfg is None:
        raise ValueError("No single slice ray trafo configuration known for "
                         f"walnut_id={walnut_id:d}, orbit_id={orbit_id:d}")
    geom = build_proj_geometry(
        vecs_all, angular_sub_sampling=angular_sub_sampling,
        proj_col_sub_sampling=proj_col_sub_sampling,
        first_proj_row=cfg["first_proj_row"],
        num_proj_rows=cfg["num_proj_rows"], num_slices=cfg["num_slices"],
        spec=spec)
    vol_mask_slice = (cfg["num_slices"] - 1) // 2 + cfg["slice_offset"]
    return MaskedWalnutRayTrafo(geom=geom, vol_mask_slice=vol_mask_slice)


# --------------------------------------------------------- .mat persistence
def matrix_filename(walnut_id: int, orbit_id: int, angular_sub_sampling: int,
                    proj_col_sub_sampling: int) -> str:
    """Reference filename convention (walnut_utils.py:1174-1184)."""
    name = (f"single_slice_ray_trafo_matrix_walnut{walnut_id:d}_"
            f"orbit{orbit_id:d}_ass{angular_sub_sampling:d}")
    if proj_col_sub_sampling != 1:
        name += f"_css{proj_col_sub_sampling:d}"
    return name + ".mat"


def save_masked_ray_trafo_matrix(file_path: str, trafo: MaskedWalnutRayTrafo,
                                 matrix, walnut_id: int, orbit_id: int,
                                 angular_sub_sampling: int,
                                 proj_col_sub_sampling: int) -> None:
    """Write the reference's `.mat` schema (walnut_utils.py:1127-1166) so
    matrices interoperate between frameworks."""
    import scipy.io

    scipy.io.savemat(file_path, {
        "ray_trafo_matrix": matrix.astype(np.float64),
        "walnut_id": walnut_id, "orbit_id": orbit_id,
        "angular_sub_sampling": angular_sub_sampling,
        "proj_col_sub_sampling": proj_col_sub_sampling,
        "num_slices": trafo.geom.vol_shape[0],
        "num_proj_rows": trafo.geom.num_rows,
        "vol_mask_slice": np.array([trafo.vol_mask_slice + 1,
                                    trafo.vol_mask_slice + 1]),
        "proj_mask": trafo.proj_mask,
    })


def load_masked_ray_trafo_matrix(file_path: str):
    import scipy.io

    return scipy.io.loadmat(file_path, variable_names=["ray_trafo_matrix"])[
        "ray_trafo_matrix"].astype("float32")


# ----------------------------------------------------------- 2D ray trafo
def _fdk_weights(geom: ConeVecGeometry, proj_mask: np.ndarray) -> np.ndarray:
    """FDK cosine pre-weights d_so / ||p - src|| for the masked rays,
    flattened in mask order."""
    det = geom.detector_positions()
    ang = np.broadcast_to(np.arange(geom.num_angles)[None, :, None],
                          proj_mask.shape)
    src = geom.vecs[:, 0:3]
    d_so = np.linalg.norm(src - geom.vecs[:, 3:6], axis=-1).mean()
    dist = np.linalg.norm(det[proj_mask] - src[ang[proj_mask]], axis=-1)
    return (d_so / dist).astype(np.float32)


def make_walnut_fbp(trafo: MaskedWalnutRayTrafo):
    """FDK-style fbp on the flat masked observation: cosine weights + ramp
    filter along detector columns (per angle) + matrix adjoint.  The global
    scale is calibrated by `make_matmul_trafo` like every other operator."""
    import jax.numpy as jnp

    from ..ops.fbp import fourier_filter

    geom, mask = trafo.geom, trafo.proj_mask
    A, C = geom.num_angles, geom.num_cols
    # flat index of each (angle, col) in mask order; requires k=1 row masks
    assert trafo.proj_mask_select_k_rows == 1
    inds = np.full(geom.proj_shape, -1, np.int64)
    inds[mask] = np.arange(mask.sum())
    flat_of_ac = inds.max(axis=0)                     # (A, C), one row each
    assert (flat_of_ac >= 0).all()
    gather = jnp.asarray(flat_of_ac.reshape(-1))       # (A*C,)
    scatter = jnp.asarray(np.argsort(flat_of_ac.reshape(-1)))
    weights = jnp.asarray(_fdk_weights(geom, mask))
    padded = max(64, int(2 ** np.ceil(np.log2(2 * C))))
    resp = jnp.asarray(fourier_filter(padded, "ramp"))

    def filter_flat(y_flat):
        """(B, n_mask) -> (B, n_mask) weighted+ramp-filtered."""
        y = (y_flat * weights[None])[:, gather].reshape(-1, A, C)
        yp = jnp.pad(y, ((0, 0), (0, 0), (0, padded - C)))
        filt = jnp.fft.irfft(jnp.fft.rfft(yp, axis=-1) * resp, n=padded,
                             axis=-1)[..., :C]
        filt = filt * (np.pi / (2.0 * A))
        return filt.reshape(-1, A * C)[:, scatter]

    return filter_flat


def get_walnut_2d_ray_trafo(
        data_path: str, matrix_path: Optional[str] = None,
        walnut_id: int = 1, orbit_id: int = 2,
        angular_sub_sampling: int = 1, proj_col_sub_sampling: int = 1,
        new_shape: Optional[Tuple[int, int]] = None,
        vecs_all: Optional[np.ndarray] = None,
        assemble_if_missing: bool = True,
        single_slice_config: Optional[dict] = None,
        spec: WalnutDatasetSpec = DEFAULT_SPEC,
        impl: str = "ell"):
    """Reference `get_walnut_2d_ray_trafo` (walnut_2d_ray_trafo.py:26-85):
    sparse-matrix 2D operator over the 501² native grid with flat masked
    observations, FDK fbp, and optional resize to the model grid.

    impl='ell' mirrors the reference operator pair exactly (incl. its
    resize-then-transpose "adjoint"); impl='dense' precomposes the
    model-grid upsample into a dense matrix for MXU matmuls (same forward
    math, EXACT adjoint, ~40x faster applies on TPU)."""
    matrix_path = data_path if matrix_path is None else matrix_path
    if vecs_all is None:
        vecs_all = load_geom_vecs(data_path, walnut_id, orbit_id)
    trafo3 = get_single_slice_ray_trafo(
        vecs_all, walnut_id=walnut_id, orbit_id=orbit_id,
        angular_sub_sampling=angular_sub_sampling,
        proj_col_sub_sampling=proj_col_sub_sampling,
        single_slice_config=single_slice_config, spec=spec)

    mat_file = os.path.join(matrix_path, matrix_filename(
        walnut_id, orbit_id, angular_sub_sampling, proj_col_sub_sampling))
    if os.path.exists(mat_file):
        matrix = load_masked_ray_trafo_matrix(mat_file)
    elif assemble_if_missing:
        matrix = trafo3.assemble_matrix()
        save_masked_ray_trafo_matrix(
            mat_file, trafo3, matrix, walnut_id, orbit_id,
            angular_sub_sampling, proj_col_sub_sampling)
    else:
        raise FileNotFoundError(mat_file)

    im_shape = trafo3.geom.vol_shape[1:]
    obs_shape = (1, trafo3.num_projs_in_mask)
    filter_flat = make_walnut_fbp(trafo3)

    def custom_fbp(rt: RayTransform, y):
        b, c = y.shape[0], y.shape[-1]
        flat = y.reshape(b * c, -1)
        filt = filter_flat(flat).reshape(y.shape)
        return rt.adjoint(filt) * rt.fbp_scale

    if impl == "dense" and new_shape is not None:
        import jax.numpy as jnp

        from .ray_trafo import DenseRayTransform, densify_model_grid

        # the model-grid densify (A · R_up, ~2 GB at protocol scale) costs
        # minutes on a 1-core host — cache it beside the .mat
        dense_file = mat_file.replace(
            ".mat", f"_dense_{new_shape[0]}x{new_shape[1]}.npy")
        if os.path.exists(dense_file):
            dense = np.load(dense_file, mmap_mode=None)
        else:
            dense = densify_model_grid(matrix, im_shape, new_shape)
            np.save(dense_file, dense)
        rt = DenseRayTransform(matrix=jnp.asarray(dense), im_shape=im_shape,
                               obs_shape=obs_shape, resize_shape=new_shape,
                               custom_fbp=custom_fbp)
    else:
        assert impl in ("ell", "dense"), impl
        rt = make_matmul_trafo(matrix, im_shape, obs_shape,
                               resize_shape=new_shape, calibrate_fbp=False,
                               custom_fbp=custom_fbp)
    rt.fbp_scale = _calibrate_walnut_fbp(rt)
    rt.inds_in_flat_projs_per_angle = trafo3.inds_in_flat_projs_per_angle()
    return rt


def _calibrate_walnut_fbp(rt: RayTransform) -> float:
    """Least-squares global FDK scale on a smooth blob (same approach as
    `ray_trafo._calibrate_fbp_scale`, geometry-specific because of the
    cone-beam weights)."""
    import jax.numpy as jnp

    h, w = rt.im_shape
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    blob = np.exp(-((xx ** 2 + yy ** 2) / 0.1)).astype(np.float32)
    x = jnp.asarray(blob)[None, :, :, None]
    if rt.resize_shape is not None:
        import jax

        x = jax.image.resize(x, (1, *rt.resize_shape, 1), method="nearest")
        blob = np.asarray(x[0, :, :, 0])
    old = rt.fbp_scale
    rt.fbp_scale = 1.0
    rec = np.asarray(rt.fbp(rt.apply(x)))[0, :, :, 0]
    rt.fbp_scale = old
    denom = float((rec * rec).sum())
    return float((blob * rec).sum() / denom) if denom > 0 else 1.0
