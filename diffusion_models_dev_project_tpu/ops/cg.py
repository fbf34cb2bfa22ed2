"""Batched conjugate-gradient solver, jit/scan-friendly.

TPU-native equivalent of the reference's hand-rolled batched CG
(`/root/reference/src/utils/cg.py:11-39`), which solves

    (I + gamma A^T A) x = rhs

for a fixed number of iterations with per-batch step sizes.  The loop is a
`lax.fori_loop`, so the whole solve lives inside a single compiled program
(the reference version launches ~4 CUDA kernels per iteration from Python).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["cg"]


def _batch_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-batch inner product over all non-batch axes -> shape (B,)."""
    return jnp.sum((a * b).reshape(a.shape[0], -1), axis=1)


def cg(op: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray, rhs: jnp.ndarray,
       n_iter: int = 5) -> jnp.ndarray:
    """Run `n_iter` CG iterations on the SPD system ``op(x) = rhs``.

    `x` is the initial guess; batch axis is axis 0. No early-exit tolerance —
    fixed trip count keeps the loop compilable (reference behaviour is the
    same: its `tol` parameter is unused, cg.py:11-39).
    """
    r0 = rhs - op(x)
    p0 = r0
    sq0 = _batch_dot(r0, r0)

    def body(_, carry):
        x, r, p, sqnorm_r_old = carry
        d = op(p)
        inner_p_d = _batch_dot(p, d)
        # Guard fully-converged batch entries (r ~ 0) against 0/0 NaNs, which
        # would poison the surrounding jitted scan.
        live = sqnorm_r_old > 1e-30
        alpha = jnp.where(live, sqnorm_r_old / jnp.where(inner_p_d == 0, 1.0, inner_p_d), 0.0)
        al = alpha.reshape((-1,) + (1,) * (x.ndim - 1))
        x = x + al * p
        r = r - al * d
        sqnorm_r_new = _batch_dot(r, r)
        beta = jnp.where(live, sqnorm_r_new / jnp.where(sqnorm_r_old == 0, 1.0, sqnorm_r_old), 0.0)
        p = r + beta.reshape((-1,) + (1,) * (x.ndim - 1)) * p
        return x, r, p, sqnorm_r_new

    x, _, _, _ = jax.lax.fori_loop(0, n_iter, body, (x, r0, p0, sq0))
    return x
