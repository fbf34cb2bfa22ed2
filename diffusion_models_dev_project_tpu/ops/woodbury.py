"""Exact DDS data consistency via the Woodbury identity, sinogram-space.

The DDS proximal system (reference samplers/utils.py:188-189)

    (I + gamma AᵀA) x = xhat0 + gamma Aᵀ y

has the closed form

    x* = xhat0 + Aᵀ (gamma⁻¹ I + A Aᵀ)⁻¹ (y − A xhat0)

where `S = gamma⁻¹ I + A Aᵀ` lives in SINOGRAM space — for the walnut
protocol that is only 7680² (60 angles × 128 cols) against 251001 image
pixels.  Precomputing `S⁻¹` once per (operator, gamma) turns the per-step
cost from `cg_iter+1` forward+adjoint pairs into ONE forward, ONE adjoint
and one small precomputed matmul — on the walnut dense operator that cuts
the data-consistency stage ~6x (BENCH.md r5).

This is an *exact* solve where the reference runs 5 CG iterations: a
mathematically stronger proximal step, therefore gated behind
`SamplerSpec.dc_mode = "woodbury"` (default "cg" keeps reference
semantics) until/unless PSNR parity is measured per protocol.

Only operators exposing an explicit `.matrix` (DenseRayTransform) build
`S` directly; it is formed and inverted ON DEVICE (fp32 — S is strongly
diagonally dominated by gamma⁻¹ I ≥ 100·I at the protocol gamma=0.01,
so fp32 inversion is well-conditioned).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["build_woodbury_sinv", "woodbury_dc"]


def build_woodbury_sinv(trafo, gamma: float) -> jnp.ndarray:
    """(gamma⁻¹ I + A Aᵀ)⁻¹ for a matrix-backed operator, on device."""
    A = trafo.matrix
    n_obs = A.shape[0]

    @jax.jit
    def _build(A):
        AAT = jnp.matmul(A, A.T, precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        S = AAT + (1.0 / gamma) * jnp.eye(n_obs, dtype=jnp.float32)
        return jnp.linalg.inv(S)

    return _build(A)


def woodbury_dc(trafo, sinv: jnp.ndarray, xhat0: jnp.ndarray,
                observation: jnp.ndarray) -> jnp.ndarray:
    """xhat0 -> exact minimizer of ||x − xhat0||² + gamma ||A x − y||²."""
    b, c = observation.shape[0], observation.shape[-1]
    d = observation - trafo.apply(xhat0)                 # (B, A, D, C)
    flat = d.transpose(0, 3, 1, 2).reshape(b * c, -1)    # matrix row order
    z = jnp.matmul(flat, sinv, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)   # S⁻¹ symmetric
    z = z.reshape(b, c, *observation.shape[1:3]).transpose(0, 2, 3, 1)
    return xhat0 + trafo.adjoint(z)
