"""Gather-free parallel-beam Radon transform via FFT shear rotations.

The ELL sparse-matrix projector (`ray_trafo.py`) is exact Joseph but its
random gathers are hostile to the TPU memory system (~80 ms per apply at
256²/60 angles — 97% of a DDS step).  This module implements the same
`parallel_beam_geometry` operator with ZERO gathers:

    project(θ)[t] = sec φ · Σ_rows  shear_x(image, −tan φ)[row, t·sec φ]

(θ quadrant-reduced to |φ| ≤ 45° around static `rot90`s).  One periodic
sinc shear per angle; the shear is a DFT-as-matmul along rows (XLA:TPU's
generic FFT is slow; a length-P DFT is a tiny MXU matmul), the row sum is
taken IN the frequency domain (collapsing the inverse DFT to a single
vector per angle), and the final sec-scaled detector resampling is a
precomputed per-angle matrix — the whole 60-angle forward projection is
a handful of dense matmuls.

The quadrant groups are brought to a uniform size (gcd chunking when the
group sizes share a large divisor, pad-to-max otherwise) and STACKED on a
leading batch axis, so the whole forward projection is ONE batched matmul
chain instead of a sequential per-quadrant loop: at CG batch sizes the
individual matmuls are too small to fill the MXU and the batched layout
roughly halves the apply latency.  The output reordering is a static
permutation (pure layout copy), not a scatter; padded slots (if any) are
never selected.

The adjoint is the EXACT linear transpose (`jax.linear_transpose`), so
`⟨Ax, y⟩ = ⟨x, Aᵀy⟩` holds to round-off like for the matrix operator.
Agreement with the Joseph ELL operator is at discretization level
(~0.5% rel. max error on smooth phantoms — sinc vs linear interpolation);
the `impl` switch in `make_parallel_beam_trafo` mirrors the reference's
ODL-vs-torch-radon cross-check (`/root/reference/src/physics/trafo.py:17,29-45`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import parallel_beam_geometry
from ..ops.fbp import ramp_filter_sinogram

__all__ = ["FFTRayTransform", "make_fft_parallel_trafo"]


def _canvas_size(im_shape: Tuple[int, int]) -> int:
    """Canvas large enough that content never wraps under the shear
    sequence.  Worst case |φ| = 45°: width grows to d(1+tan 22.5°) ≈ 1.42d
    after the first x-shear, height to ≤ 2d after the y-shear, width to
    ≤ 1.85d after the final x-shear — 2.5d covers all passes with margin.
    With DFT-as-matmul shears any multiple of 64 works (no power-of-2
    FFT constraint)."""
    d = max(im_shape)
    return int(int(np.ceil(2.5 * d / 64)) * 64)


def _dft_matrices(P: int):
    """Real rfft/irfft basis matrices for DFT-as-matmul shears.

    XLA:TPU lowers `jnp.fft` to a slow generic path (~60 ms per 256² apply);
    a length-P DFT is tiny as an MXU matmul, so the shear pipeline becomes
    4 dense matmuls + elementwise phase per pass.  fwd: X = x @ (Fr + i Fi);
    inv: x = Re(X) @ Br + Im(X) @ Bi (exact rfft/irfft algebra).
    """
    n = np.arange(P)
    k = np.arange(P // 2 + 1)
    ang = 2 * np.pi * np.outer(n, k) / P                 # (P, Pf)
    Fr, Fi = np.cos(ang), -np.sin(ang)
    w = np.full(P // 2 + 1, 2.0)
    w[0] = 1.0
    if P % 2 == 0:
        w[-1] = 1.0
    Br = (w[:, None] * np.cos(ang.T) / P)                # (Pf, P)
    Bi = (-w[:, None] * np.sin(ang.T) / P)
    return (jnp.asarray(Fr, jnp.float32), jnp.asarray(Fi, jnp.float32),
            jnp.asarray(Br, jnp.float32), jnp.asarray(Bi, jnp.float32))


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,   # bf16 passes (fastest)
    "high": jax.lax.Precision.HIGH,         # bf16x3 (~fp32 accuracy, ~2x HIGHEST)
    "highest": jax.lax.Precision.HIGHEST,   # full fp32 (6-pass)
}


def _shear_phases(phis_g: jnp.ndarray, P: int):
    """Frequency-domain phase ramps of the per-angle x-shear with
    a = −tan φ (content coordinates y = yc − row): (G, P, Pf) cos/sin."""
    k = jnp.arange(P // 2 + 1, dtype=jnp.float32)
    r = jnp.arange(P, dtype=jnp.float32) - (P - 1) / 2
    a = -jnp.tan(phis_g)                                        # (G,)
    ang = -2 * jnp.pi * (a[:, None, None] * r[None, :, None]) * k / P
    return jnp.cos(ang), jnp.sin(ang)


def _det_interp_matrices(P: int, det_count: int, det_spacing: float,
                         phis: np.ndarray) -> np.ndarray:
    """Per-angle sec-scaled detector resampling: out[a, d] = secφ_a ·
    colsum[ t_d·secφ_a ] with linear interpolation on the canvas column
    grid (unit spacing, centred).  Shape (A, P, D)."""
    A = len(phis)
    M = np.zeros((A, P, det_count), np.float32)
    tk = (np.arange(det_count) - (det_count - 1) / 2) * det_spacing
    for a, phi in enumerate(phis):
        sec = 1.0 / np.cos(phi)
        pos = tk * sec + (P - 1) / 2
        j0 = np.floor(pos).astype(int)
        frac = pos - j0
        for d in range(det_count):
            if 0 <= j0[d] < P:
                M[a, j0[d], d] = (1 - frac[d]) * abs(sec)
            if 0 <= j0[d] + 1 < P:
                M[a, j0[d] + 1, d] = frac[d] * abs(sec)
    return M


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FFTRayTransform:
    """Parallel-beam operator with the `RayTransform` interface, gather-free.

    All per-angle tables are brought to a uniform group size G (gcd
    chunking or pad-to-max, whichever stacks smaller — B·G ≥ num angles)
    and stacked on a leading batch axis B: `det_matrix` (B, G, P, D),
    shear phases (B, G, P, Pf).  `k90s` holds each chunk's static quadrant
    rotation and `inv_perm` the static permutation mapping the stacked
    (B·G) angle order back to the geometry's angle order.
    """

    det_matrix: jnp.ndarray                  # (B, G, P, D)
    shear_cos: jnp.ndarray                   # (B, G, P, Pf)
    shear_sin: jnp.ndarray                   # (B, G, P, Pf)
    dft: tuple                               # (Fr, Fi, Br, Bi) DFT matrices
    im_shape: Tuple[int, int]
    obs_shape: Tuple[int, int]
    canvas: int
    k90s: Tuple[int, ...]                    # per-chunk quadrant rotation
    inv_perm: Tuple[int, ...]                # angle a -> position in (B·G)
    angles: Optional[np.ndarray] = None
    fbp_scale: float = 1.0
    fbp_filter: str = "ramp"
    resize_shape: Optional[Tuple[int, int]] = None
    # matmul precision of the shear/DFT pipeline.  "highest" = full fp32
    # (reference-parity default); "high" = bf16x3 (~fp32 accuracy, ~2x the
    # MXU throughput) — use `dataclasses.replace(trafo, precision="high")`
    # inside iterative solvers where the operator is applied many times.
    precision: str = "highest"
    # fused-Gram tables (Q1, Q2, Q4), each (B, G, Pf, Pf): the detector
    # stage's own Gram TᵀT = B·(M Mᵀ)·Bᵀ conjugated into the row-frequency
    # domain, so AᵀA never leaves frequency space between the forward and
    # adjoint shear pipelines (see `gram`).  None until `with_gram()`.
    gram_q: Optional[tuple] = None

    # --- pytree ----------------------------------------------------------
    def tree_flatten(self):
        leaves = (self.det_matrix, self.shear_cos, self.shear_sin, self.dft,
                  self.gram_q)
        aux = (self.im_shape, self.obs_shape, self.canvas, self.k90s,
               self.inv_perm,
               None if self.angles is None else self.angles.tobytes(),
               None if self.angles is None else self.angles.shape,
               self.fbp_scale, self.fbp_filter, self.resize_shape,
               self.precision)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (im_shape, obs_shape, canvas, k90s, inv_perm, ang_b, ang_shape,
         fbp_scale, fbp_filter, resize_shape, precision) = aux
        det_matrix, shear_cos, shear_sin, dft, gram_q = leaves
        angles = None if ang_b is None else np.frombuffer(ang_b).reshape(ang_shape)
        return cls(det_matrix=det_matrix, shear_cos=shear_cos,
                   shear_sin=shear_sin, dft=dft,
                   im_shape=im_shape, obs_shape=obs_shape,
                   canvas=canvas, k90s=k90s, inv_perm=inv_perm, angles=angles,
                   fbp_scale=fbp_scale, fbp_filter=fbp_filter,
                   resize_shape=resize_shape, precision=precision,
                   gram_q=gram_q)

    @property
    def model_im_shape(self) -> Tuple[int, int]:
        return self.resize_shape if self.resize_shape is not None else self.im_shape

    # --- forward (pure linear function of x) ------------------------------
    def _front(self, x: jnp.ndarray):
        """Image -> row-frequency projections: (N, H, W) -> (Zr, Zi), each
        (B, N, G, Pf).  Shared by `_apply_flat` (which resolves Z to detector
        samples) and `gram` (which applies the detector Gram in frequency
        space and transposes this same map back)."""
        P = self.canvas
        _PREC = _PRECISIONS[self.precision]
        h, w = self.im_shape
        oy, ox = (P - h) // 2, (P - w) // 2
        base = jnp.zeros((x.shape[0], P, P), x.dtype)
        base = base.at[:, oy:oy + h, ox:ox + w].set(x)

        Fr, Fi, _, _ = self.dft
        # static per-chunk quadrant rotations, stacked: (B, N, P, P)
        ims = jnp.stack([jnp.rot90(base, -(k % 4), axes=(-2, -1))
                         for k in self.k90s], axis=0)
        # row-wise DFT, one batched matmul: (B, N, P, Pf)
        Xr = jnp.einsum("bnpq,qk->bnpk", ims, Fr, precision=_PREC)
        Xi = jnp.einsum("bnpq,qk->bnpk", ims, Fi, precision=_PREC)
        # shear + row sum fused in the frequency domain: (B, N, G, Pf)
        pr, pi = self.shear_cos, self.shear_sin
        Zr = (jnp.einsum("bnpk,bgpk->bngk", Xr, pr, precision=_PREC)
              - jnp.einsum("bnpk,bgpk->bngk", Xi, pi, precision=_PREC))
        Zi = (jnp.einsum("bnpk,bgpk->bngk", Xr, pi, precision=_PREC)
              + jnp.einsum("bnpk,bgpk->bngk", Xi, pr, precision=_PREC))
        return Zr, Zi

    def _apply_flat(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W) -> (N, A, D)."""
        _PREC = _PRECISIONS[self.precision]
        _, _, Br, Bi = self.dft
        Zr, Zi = self._front(x)
        colsum = (jnp.einsum("bngk,kp->bngp", Zr, Br, precision=_PREC)
                  + jnp.einsum("bngk,kp->bngp", Zi, Bi, precision=_PREC))
        # per-angle sec-scaled detector resampling: (B, N, G, D)
        sino = jnp.einsum("bngp,bgpd->bngd", colsum, self.det_matrix,
                          precision=_PREC)
        # (B, N, G, D) -> (N, B·G, D) -> geometry angle order (static perm)
        stacked = sino.transpose(1, 0, 2, 3).reshape(
            x.shape[0], -1, self.obs_shape[1])
        return stacked[:, jnp.asarray(self.inv_perm), :]

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """NHWC image -> (B, A, D, C) sinogram."""
        b, h, w, c = x.shape
        if self.resize_shape is not None:
            x = jax.image.resize(x, (b, *self.im_shape, c), method="nearest")
        flat = x.transpose(0, 3, 1, 2).reshape(b * c, *self.im_shape)
        obs = self._apply_flat(flat)
        return obs.reshape(b, c, *self.obs_shape).transpose(0, 2, 3, 1)

    def adjoint(self, y: jnp.ndarray) -> jnp.ndarray:
        """Exact transpose of `apply` (without resize), via linear_transpose."""
        b, c = y.shape[0], y.shape[-1]
        flat = y.transpose(0, 3, 1, 2).reshape(b * c, *self.obs_shape)
        zero = jax.ShapeDtypeStruct((b * c, *self.im_shape), flat.dtype)
        (x,) = jax.linear_transpose(self._apply_flat, zero)(flat)
        x = x.reshape(b, c, *self.im_shape).transpose(0, 2, 3, 1)
        if self.resize_shape is not None:
            x = jax.image.resize(x, (b, *self.resize_shape, c), method="nearest")
        return x

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.apply(x)

    # --- fused Gram: AᵀA without leaving frequency space -------------------
    def with_gram(self) -> "FFTRayTransform":
        """Return a copy carrying the fused-Gram tables (see `gram`).

        Writing A = S·T·C with C the image->row-frequency front (`_front`),
        T = det_interp∘irDFT the per-angle detector resolve and S the static
        angle-order selection, the Gram is

            AᵀA = Cᵀ · (Tᵀ SᵀS T) · C

        and the middle is a fixed per-angle Pf×Pf real 2x2-block matrix
        [[Q1, Q2ᵀ], [Q2, Q4]] with Q1 = Br·W·Brᵀ, Q2 = Bi·W·Brᵀ,
        Q4 = Bi·W·Biᵀ, W = M·Mᵀ (M the slot's detector-interp matrix,
        zeroed for padded duplicate slots — SᵀS keeps only each angle's
        first occurrence).  `gram(x)` is then algebraically identical to
        `adjoint(apply(x))` while skipping the irDFT -> det -> detᵀ -> rDFT
        round-trip of every CG iteration (6 Gram applies per DDS step,
        samplers/utils.py:188-189)."""
        if self.gram_q is not None:
            return self
        cached = getattr(self, "_gram_cache", None)
        if cached is not None:
            return cached
        det = np.asarray(self.det_matrix, np.float64)        # (B, G, P, D)
        _, _, Br, Bi = (np.asarray(m, np.float64) for m in self.dft)
        nB, nG, P, _ = det.shape
        # padded duplicate slots contribute to apply() output rows that
        # inv_perm never selects — zero them out of the Gram middle
        selected = np.zeros(nB * nG, bool)
        selected[np.asarray(self.inv_perm, np.int64)] = True
        Pf = Br.shape[0]
        q1 = np.zeros((nB, nG, Pf, Pf), np.float32)
        q2 = np.zeros((nB, nG, Pf, Pf), np.float32)
        q4 = np.zeros((nB, nG, Pf, Pf), np.float32)
        for b in range(nB):
            for g in range(nG):
                if not selected[b * nG + g]:
                    continue
                M = det[b, g]                                # (P, D)
                t1 = Br @ (M @ (M.T @ Br.T))                 # Br·W·Brᵀ
                t2 = Bi @ (M @ (M.T @ Br.T))                 # Bi·W·Brᵀ
                t4 = Bi @ (M @ (M.T @ Bi.T))                 # Bi·W·Biᵀ
                q1[b, g], q2[b, g], q4[b, g] = t1, t2, t4
        out = dataclasses.replace(
            self, gram_q=(jnp.asarray(q1), jnp.asarray(q2), jnp.asarray(q4)))
        # host-side memo (NOT a pytree leaf): geometry-cached trafos build
        # their Gram tables once per process, not once per sampler/image
        self._gram_cache = out
        return out

    def gram(self, x: jnp.ndarray) -> jnp.ndarray:
        """AᵀA x, fused (== `adjoint(apply(x))` to round-off).  NHWC."""
        if self.gram_q is None:
            return self.adjoint(self.apply(x))
        _PREC = _PRECISIONS[self.precision]
        q1, q2, q4 = self.gram_q
        b, h, w, c = x.shape
        if self.resize_shape is not None:
            x = jax.image.resize(x, (b, *self.im_shape, c), method="nearest")
        flat = x.transpose(0, 3, 1, 2).reshape(b * c, *self.im_shape)
        Zr, Zi = self._front(flat)
        Zpr = (jnp.einsum("bngk,bgkj->bngj", Zr, q1, precision=_PREC)
               + jnp.einsum("bngk,bgkj->bngj", Zi, q2, precision=_PREC))
        Zpi = (jnp.einsum("bngk,bgjk->bngj", Zr, q2, precision=_PREC)
               + jnp.einsum("bngk,bgkj->bngj", Zi, q4, precision=_PREC))
        zero = jax.ShapeDtypeStruct(flat.shape, flat.dtype)
        (out,) = jax.linear_transpose(self._front, zero)((Zpr, Zpi))
        out = out.reshape(b, c, *self.im_shape).transpose(0, 2, 3, 1)
        if self.resize_shape is not None:
            out = jax.image.resize(out, (b, *self.resize_shape, c),
                                   method="nearest")
        return out

    def fbp(self, y: jnp.ndarray) -> jnp.ndarray:
        filt = ramp_filter_sinogram(y, filter_name=self.fbp_filter)
        return self.adjoint(filt) * self.fbp_scale


def make_fft_parallel_trafo(im_shape: Tuple[int, int],
                            num_angles: int) -> FFTRayTransform:
    """Build the FFT-shear operator on the same `parallel_beam_geometry` as
    the ELL/Joseph operator (trafo.py:18-27 conventions)."""
    geom = parallel_beam_geometry(im_shape, num_angles)
    P = _canvas_size(im_shape)
    # quadrant reduction: theta = k90*(pi/2) + phi, |phi| <= pi/4
    k90s_all = np.round(geom.angles / (np.pi / 2)).astype(int)
    phis = geom.angles - k90s_all * (np.pi / 2)
    groups = {}
    for i, k in enumerate(k90s_all):
        groups.setdefault(int(k), []).append(i)
    # Two uniform-size stackings, cheapest wins (measured on the v5e):
    #  (a) gcd chunking — no padded slots; fastest when the group sizes
    #      share a large divisor (the 60-angle protocol: [15,30,15] -> 4
    #      chunks of 15; padding to [30,30,30] measured 7% slower e2e);
    #  (b) pad-to-max — one stack entry per distinct quadrant; needed when
    #      the gcd degenerates (coprime sizes, e.g. [23,44,23] at 90
    #      angles -> 90 single-angle chunks, re-running the row-DFT ~A/3
    #      times over an (A, N, P, P) stack).  Padded slots repeat an
    #      existing angle of the group; inv_perm maps each angle to its
    #      first occurrence, so padded (duplicate) slots are never selected.
    gsz = math.gcd(*(len(v) for v in groups.values()))
    gcd_chunks = [(k, idxs[s:s + gsz])
                  for k, idxs in sorted(groups.items())
                  for s in range(0, len(idxs), gsz)]
    if len(gcd_chunks) <= 2 * len(groups):
        chunks = gcd_chunks                      # (k90, [angle idxs]) per chunk
    else:
        G = max(len(v) for v in groups.values())
        chunks = [(k, idxs + [idxs[-1]] * (G - len(idxs)))
                  for k, idxs in sorted(groups.items())]
    det_all = _det_interp_matrices(P, geom.det_count, geom.det_spacing, phis)
    phis_j = jnp.asarray(phis, jnp.float32)
    det_stack, cos_stack, sin_stack = [], [], []
    flat_order = []
    for k, idxs in chunks:
        det_stack.append(det_all[np.asarray(idxs)])
        pr, pi = _shear_phases(phis_j[jnp.asarray(idxs)], P)
        cos_stack.append(pr)
        sin_stack.append(pi)
        flat_order.extend(idxs)
    # each original angle -> its FIRST slot in flat_order (assign in reverse
    # so earlier occurrences win).  Padded slots duplicate an angle already
    # present in the group; they compute identical rows, but pinning the
    # first occurrence makes the invariant explicit instead of relying on
    # the duplicates being exact copies.
    inv_perm = np.empty(num_angles, np.int64)
    flat = np.asarray(flat_order)
    inv_perm[flat[::-1]] = np.arange(len(flat))[::-1]
    trafo = FFTRayTransform(
        det_matrix=jnp.asarray(np.stack(det_stack)),
        shear_cos=jnp.stack(cos_stack), shear_sin=jnp.stack(sin_stack),
        dft=_dft_matrices(P),
        im_shape=tuple(im_shape), obs_shape=geom.obs_shape, canvas=P,
        k90s=tuple(k for k, _ in chunks), inv_perm=tuple(inv_perm.tolist()),
        angles=geom.angles)
    from .ray_trafo import _calibrate_fbp_scale

    trafo.fbp_scale = _calibrate_fbp_scale(trafo)
    return trafo
