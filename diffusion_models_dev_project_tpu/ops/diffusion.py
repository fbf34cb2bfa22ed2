"""Core diffusion update rules: Tweedie denoising and the DDIM step.

Pure-jnp re-design of `/root/reference/src/samplers/utils.py:338-400`
(`ddim`, `apTweedy`, `_eps_pred_from_s`).  Dispatch over the SDE family is
static Python dispatch on the frozen SDE dataclass at trace time, so the
compiled graph contains only the branch in use.

Convention: images are NHWC `(B, H, W, C)`; per-batch scalars broadcast over
the trailing axes.  Time arguments are always explicit `(t, t_prev)` pairs —
for continuous (VE/VP) models callers pass ``t_prev = t - step_size``
(matching samplers/utils.py:349), for DDPM they come from the jump schedule.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .sde import SDE, VESDE, VPSDE, DDPM

__all__ = ["eps_pred_from_s", "tweedy", "ddim"]


def _b(v: jnp.ndarray, ndim: int) -> jnp.ndarray:
    v = jnp.asarray(v)
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


def eps_pred_from_s(s: jnp.ndarray, std_t: jnp.ndarray) -> jnp.ndarray:
    """Convert a score prediction to an epsilon prediction: eps = -std * s.

    (reference samplers/utils.py:396-400)
    """
    return -std_t * s


def tweedy(s: jnp.ndarray, x: jnp.ndarray, sde: SDE, t: jnp.ndarray) -> jnp.ndarray:
    """Tweedie denoiser: xhat0 = (x - eps*std_t) / mean_t.

    (reference `apTweedy`, samplers/utils.py:370-378)
    """
    div = _b(sde.marginal_prob_mean(t), x.ndim) ** -1
    std_t = _b(sde.marginal_prob_std(t), x.ndim)
    eps = eps_pred_from_s(s, std_t) if sde.prediction_type == "score" else s
    return (x - eps * std_t) * div


def ddim(
    sde: SDE,
    s: jnp.ndarray,
    xhat: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    eta: float,
    key: jax.Array,
    use_simplified_eqn: bool = False,
) -> jnp.ndarray:
    """One DDIM update from time `t` to `t_prev` (reference samplers/utils.py:338-368).

    `s` is the raw model output (score for VE/VP, epsilon for DDPM); `xhat`
    is the (data-consistent) denoised estimate.
    """
    std_t = _b(sde.marginal_prob_std(t), xhat.ndim)
    if isinstance(sde, VESDE):
        std_prev = _b(sde.marginal_prob_std(t_prev), xhat.ndim)
        if use_simplified_eqn:
            tbeta = jnp.ones_like(std_t)
        else:
            tbeta = 1.0 - std_prev ** 2 / std_t ** 2
        noise_det = -std_prev * std_t * jnp.sqrt(1.0 - tbeta ** 2 * eta ** 2) * s
        noise_sto = std_prev * eta * tbeta * jax.random.normal(key, xhat.shape, xhat.dtype)
        return xhat + noise_det + noise_sto
    elif isinstance(sde, (VPSDE, DDPM)):
        mean_prev = _b(sde.marginal_prob_mean(t_prev), xhat.ndim)
        mean_t = _b(sde.marginal_prob_mean(t), xhat.ndim)
        tbeta = jnp.sqrt((1.0 - mean_prev ** 2) / (1.0 - mean_t ** 2)) * jnp.sqrt(
            1.0 - mean_t ** 2 / mean_prev ** 2)
        # NaN guard for the t_prev = -1 endpoint (reference samplers/utils.py:360).
        tbeta = jnp.where(jnp.isnan(tbeta), jnp.zeros_like(tbeta), tbeta)
        xhat_scaled = xhat * mean_prev
        eps = eps_pred_from_s(s, std_t) if isinstance(sde, VPSDE) else s
        noise_det = jnp.sqrt(1.0 - mean_prev ** 2 - tbeta ** 2 * eta ** 2) * eps
        noise_sto = eta * tbeta * jax.random.normal(key, xhat.shape, xhat.dtype)
        return xhat_scaled + noise_det + noise_sto
    raise NotImplementedError(type(sde))
