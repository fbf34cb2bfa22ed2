"""Ray-transform operators as pure-function pytrees.

TPU-native re-design of the reference's stateful `BaseRayTrafo` nn.Module
hierarchy (`/root/reference/src/physics/base_ray_trafo.py:13-201`,
`trafo.py:16-68`, `matmul_ray_trafo.py:42-136`).  An operator here is a
frozen pytree of device arrays with three pure methods:

    apply(x)    : (B, H, W, C) image        -> (B, A, D, C) sinogram
    adjoint(y)  : (B, A, D, C) sinogram     -> (B, H, W, C) image
    fbp(y)      : ramp-filtered adjoint     -> (B, H, W, C) image

Exact adjointness ⟨Ax, y⟩ = ⟨x, Aᵀy⟩ holds by construction (both directions
read the same matrix in transposed ELL layouts), and `apply`/`adjoint` carry
custom VJPs that route gradients through the matched transpose instead of
XLA's scatter autodiff — the TPU analogue of the reference's pre-transposed
`matrix_t` trick (matmul_ray_trafo.py:86-95).

Images are NHWC.  The optional `resize` (walnut: model grid 256² vs native
grid 501², matmul_ray_trafo.py:34-40) is handled by nearest resize on the
way in/out of the operator.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import (ell_from_coo, joseph_system_matrix,
                       parallel_beam_geometry)
from ..ops.fbp import ramp_filter_sinogram

__all__ = ["RayTransform", "DenseRayTransform", "make_parallel_beam_trafo",
           "make_matmul_trafo", "densify_model_grid"]


# ----------------------------------------------------------------- ELL matvec
@jax.custom_vjp
def _ell_matvec(idx: jnp.ndarray, w: jnp.ndarray, idx_t: jnp.ndarray,
                w_t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """out[b, r] = sum_k w[r, k] * x[b, idx[r, k]].

    `(idx_t, w_t)` is the same matrix in transposed ELL layout; it is used
    only by the backward rule, so the gradient is another clean gather
    instead of XLA's scatter autodiff.
    """
    return jnp.einsum("brk,rk->br", x[:, idx], w)


def _ell_matvec_fwd(idx, w, idx_t, w_t, x):
    return jnp.einsum("brk,rk->br", x[:, idx], w), (idx_t, w_t)


def _ell_matvec_bwd(res, g):
    idx_t, w_t = res
    gx = jnp.einsum("brk,rk->br", g[:, idx_t], w_t)
    return (None, None, None, None, gx)


_ell_matvec.defvjp(_ell_matvec_fwd, _ell_matvec_bwd)


def _nearest_resize(x: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize on NHWC images (reference uses
    `interpolate(mode='nearest-exact')`, matmul_ray_trafo.py:34-40)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, shape[0], shape[1], c), method="nearest")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RayTransform:
    """A (possibly resized) linear CT operator in ELL layout."""

    fwd_idx: jnp.ndarray          # (R, Kf) int32
    fwd_w: jnp.ndarray            # (R, Kf) f32
    adj_idx: jnp.ndarray          # (N, Ka) int32
    adj_w: jnp.ndarray            # (N, Ka) f32
    # static metadata
    im_shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    obs_shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    angles: Optional[np.ndarray] = None
    fbp_scale: float = 1.0
    fbp_filter: str = "ramp"
    resize_shape: Optional[Tuple[int, int]] = None   # model-grid shape, if any
    # optional geometry-specific fbp override, e.g. the walnut FDK
    # (physics/walnut.py); called as custom_fbp(self, y)
    custom_fbp: Optional[callable] = None

    # --- pytree plumbing -------------------------------------------------
    def tree_flatten(self):
        leaves = (self.fwd_idx, self.fwd_w, self.adj_idx, self.adj_w)
        aux = (self.im_shape, self.obs_shape,
               None if self.angles is None else self.angles.tobytes(),
               None if self.angles is None else self.angles.shape,
               self.fbp_scale, self.fbp_filter, self.resize_shape,
               self.custom_fbp)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (im_shape, obs_shape, ang_b, ang_shape, fbp_scale, fbp_filter,
         resize_shape, custom_fbp) = aux
        angles = None if ang_b is None else np.frombuffer(ang_b).reshape(ang_shape)
        return cls(*leaves, im_shape=im_shape, obs_shape=obs_shape, angles=angles,
                   fbp_scale=fbp_scale, fbp_filter=fbp_filter,
                   resize_shape=resize_shape, custom_fbp=custom_fbp)

    # --- shapes ----------------------------------------------------------
    @property
    def model_im_shape(self) -> Tuple[int, int]:
        """Shape of images as seen by the model (resized grid if set)."""
        return self.resize_shape if self.resize_shape is not None else self.im_shape

    # --- core ops --------------------------------------------------------
    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward projection, NHWC -> (B, A, D, C)."""
        b, h, w, c = x.shape
        if self.resize_shape is not None:
            x = _nearest_resize(x, self.im_shape)
        flat = x.transpose(0, 3, 1, 2).reshape(b * c, -1)
        obs = _ell_matvec(self.fwd_idx, self.fwd_w, self.adj_idx, self.adj_w, flat)
        return obs.reshape(b, c, *self.obs_shape).transpose(0, 2, 3, 1)

    def adjoint(self, y: jnp.ndarray) -> jnp.ndarray:
        """Adjoint (exact transpose), (B, A, D, C) -> NHWC image."""
        b = y.shape[0]
        c = y.shape[-1]
        flat = y.transpose(0, 3, 1, 2).reshape(b * c, -1)
        x = _ell_matvec(self.adj_idx, self.adj_w, self.fwd_idx, self.fwd_w, flat)
        x = x.reshape(b, c, *self.im_shape).transpose(0, 2, 3, 1)
        if self.resize_shape is not None:
            x = _nearest_resize(x, self.resize_shape)
        return x

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.apply(x)

    def fbp(self, y: jnp.ndarray) -> jnp.ndarray:
        """Filtered back-projection = adjoint of ramp-filtered sinogram.

        Same structure as the reference's torch-radon path
        (`backprojection(filter_sinogram(x))`, trafo.py:42) with a
        geometry-calibrated global scale.  Geometry-specific overrides (the
        walnut FDK) plug in via `custom_fbp`.
        """
        if self.custom_fbp is not None:
            return self.custom_fbp(self, y)
        filt = ramp_filter_sinogram(y, filter_name=self.fbp_filter)
        return self.adjoint(filt) * self.fbp_scale


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DenseRayTransform:
    """Matrix operator precomposed with the model-grid upsample and stored
    DENSE: `A' = A · R_up` (obs × model pixels).

    TPU fast path for matrix-defined operators (walnut): the reference's
    sparse `torch.sparse.mm` + nearest-resize composition
    (matmul_ray_trafo.py:107-126) becomes one MXU matmul per apply — on TPU
    random-access gathers are ~40x slower than streaming a dense matrix.
    Unlike the ELL pair (which mirrors the reference's mismatched
    resize-then-transpose "adjoint"), `adjoint` here is the EXACT transpose
    of `apply`.
    """

    matrix: jnp.ndarray                      # (n_obs, n_model_pixels)
    im_shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    obs_shape: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    fbp_scale: float = 1.0
    fbp_filter: str = "ramp"
    custom_fbp: Optional[callable] = None
    resize_shape: Optional[Tuple[int, int]] = None   # == model grid (kept for API)

    def tree_flatten(self):
        return (self.matrix,), (self.im_shape, self.obs_shape, self.fbp_scale,
                                self.fbp_filter, self.custom_fbp,
                                self.resize_shape)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        im_shape, obs_shape, fbp_scale, fbp_filter, custom_fbp, resize = aux
        return cls(leaves[0], im_shape=im_shape, obs_shape=obs_shape,
                   fbp_scale=fbp_scale, fbp_filter=fbp_filter,
                   custom_fbp=custom_fbp, resize_shape=resize)

    @property
    def model_im_shape(self) -> Tuple[int, int]:
        return self.resize_shape if self.resize_shape is not None else self.im_shape

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        flat = x.transpose(0, 3, 1, 2).reshape(b * c, -1)
        obs = jnp.matmul(flat, self.matrix.T.astype(flat.dtype),
                         preferred_element_type=jnp.float32)
        return obs.reshape(b, c, *self.obs_shape).transpose(0, 2, 3, 1)

    def adjoint(self, y: jnp.ndarray) -> jnp.ndarray:
        b, c = y.shape[0], y.shape[-1]
        flat = y.transpose(0, 3, 1, 2).reshape(b * c, -1)
        x = jnp.matmul(flat, self.matrix.astype(flat.dtype),
                       preferred_element_type=jnp.float32)
        h, w = self.model_im_shape
        return x.reshape(b, c, h, w).transpose(0, 2, 3, 1)

    def __call__(self, x):
        return self.apply(x)

    def fbp(self, y: jnp.ndarray) -> jnp.ndarray:
        if self.custom_fbp is not None:
            return self.custom_fbp(self, y)
        filt = ramp_filter_sinogram(y, filter_name=self.fbp_filter)
        return self.adjoint(filt) * self.fbp_scale


def densify_model_grid(matrix, im_shape: Tuple[int, int],
                       model_shape: Tuple[int, int]) -> np.ndarray:
    """A' = A · R_up with R_up the nearest-neighbour model->native upsample
    (exactly the composition the reference applies per call,
    matmul_ray_trafo.py:108-110): sum the native-grid columns that map to
    the same model pixel."""
    import scipy.sparse as sp

    H, W = im_shape
    h, w = model_shape
    # nearest-neighbour index each native pixel takes from the model grid
    # (matches jax.image.resize(method="nearest"): floor((i+0.5)*h/H))
    rows_n = np.minimum((np.floor((np.arange(H) + 0.5) * h / H)).astype(np.int64), h - 1)
    cols_n = np.minimum((np.floor((np.arange(W) + 0.5) * w / W)).astype(np.int64), w - 1)
    native_to_model = (rows_n[:, None] * w + cols_n[None, :]).ravel()
    R = sp.coo_matrix((np.ones(H * W, np.float32),
                       (np.arange(H * W), native_to_model)),
                      shape=(H * W, h * w)).tocsr()
    A = matrix.tocsr() if sp.issparse(matrix) else sp.csr_matrix(matrix)
    return np.asarray((A @ R).todense(), np.float32)


# ------------------------------------------------------------- constructors
_TRAFO_CACHE: dict = {}


def _calibrate_fbp_scale(trafo: RayTransform) -> float:
    """Fit the scalar making FBP(A(blob)) ~ blob for a smooth phantom."""
    h, w = trafo.im_shape
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    blob = np.exp(-((xx ** 2 + yy ** 2) / 0.15)).astype(np.float32)
    x = jnp.asarray(blob)[None, :, :, None]
    rec = np.asarray(jax.jit(lambda t, v: t.fbp(t.apply(v)))(trafo, x))[0, :, :, 0]
    scale = float((blob * rec).sum() / (rec * rec).sum())
    return scale


def make_parallel_beam_trafo(im_shape: Tuple[int, int], num_angles: int,
                             cache: bool = True, impl: str = "fft"):
    """Build the 2D parallel-beam operator (reference `SimpleTrafo`,
    trafo.py:16-68); cached per geometry.

    Two implementations of the same `parallel_beam_geometry`, mirroring the
    reference's odl-vs-torch-radon `impl` switch (trafo.py:17,29-45):
    - 'fft'    — gather-free FFT shear-rotation projector (fft_radon.py),
                 the TPU fast path (~100x faster apply at 256²),
    - 'matrix' — exact Joseph ELL sparse tables (this module), the
                 ground-truth discretization used for cross-checks and as
                 the template for matrix-defined operators (walnut).
    """
    key = ("parallel", im_shape, num_angles, impl)
    if cache and key in _TRAFO_CACHE:
        return _TRAFO_CACHE[key]
    if impl == "fft":
        from .fft_radon import make_fft_parallel_trafo

        trafo = make_fft_parallel_trafo(im_shape, num_angles)
        if cache:
            _TRAFO_CACHE[key] = trafo
        return trafo
    assert impl == "matrix", impl
    geom = parallel_beam_geometry(im_shape, num_angles)
    rows, cols, vals = joseph_system_matrix(geom)
    n = int(np.prod(im_shape))
    r = int(np.prod(geom.obs_shape))
    fwd = ell_from_coo(rows, cols, vals, r, n)
    adj = ell_from_coo(cols, rows, vals, n, r)
    trafo = RayTransform(
        fwd_idx=jnp.asarray(fwd.idx), fwd_w=jnp.asarray(fwd.w),
        adj_idx=jnp.asarray(adj.idx), adj_w=jnp.asarray(adj.w),
        im_shape=im_shape, obs_shape=geom.obs_shape, angles=geom.angles)
    trafo.fbp_scale = _calibrate_fbp_scale(trafo)
    if cache:
        _TRAFO_CACHE[key] = trafo
    return trafo


def make_matmul_trafo(matrix, im_shape: Tuple[int, int], obs_shape: Tuple[int, ...],
                      resize_shape: Optional[Tuple[int, int]] = None,
                      angles: Optional[np.ndarray] = None,
                      calibrate_fbp: bool = True,
                      custom_fbp=None) -> RayTransform:
    """Operator from an explicit (scipy sparse or dense numpy) matrix,
    the TPU equivalent of reference `MatmulRayTrafo` (matmul_ray_trafo.py:42).

    Used by the walnut workload where the cone-beam physics is reduced to a
    pre-assembled sparse matrix (walnut_2d_ray_trafo.py:26-85).
    """
    import scipy.sparse as sp

    if sp.issparse(matrix):
        coo = matrix.tocoo()
        rows, cols, vals = coo.row.astype(np.int64), coo.col.astype(np.int64), coo.data.astype(np.float32)
    else:
        matrix = np.asarray(matrix, dtype=np.float32)
        rows, cols = np.nonzero(matrix)
        vals = matrix[rows, cols]
    n = int(np.prod(im_shape))
    r = int(np.prod(obs_shape))
    fwd = ell_from_coo(rows, cols, vals, r, n)
    adj = ell_from_coo(cols, rows, vals, n, r)
    trafo = RayTransform(
        fwd_idx=jnp.asarray(fwd.idx), fwd_w=jnp.asarray(fwd.w),
        adj_idx=jnp.asarray(adj.idx), adj_w=jnp.asarray(adj.w),
        im_shape=im_shape, obs_shape=tuple(obs_shape), angles=angles,
        resize_shape=resize_shape, custom_fbp=custom_fbp)
    if calibrate_fbp and custom_fbp is None and len(obs_shape) == 2:
        trafo.fbp_scale = _calibrate_fbp_scale(trafo)
    return trafo
