"""Diffusion SDE library (VE / VP / discrete DDPM), pure JAX.

TPU-native re-design of the reference SDE abstraction
(`/root/reference/src/utils/sde.py:11-197`).  Instead of torch modules we use
frozen dataclasses of static floats that are hashable (so they can be closed
over by `jax.jit` without retracing) and whose methods are pure `jnp`
functions of traced time arrays.

Semantics parity notes (reference file:line):
- VESDE.marginal_prob_std: sigma_min * (sigma_max/sigma_min)**t  (sde.py:89-95)
- VESDE.diffusion_coeff: std(t) * sqrt(2 log(sigma_max/sigma_min)) (sde.py:68-72)
- VPSDE log-mean-coeff: -0.25 t^2 (bmax-bmin) - 0.5 t bmin        (sde.py:136)
- DDPM beta schedule computed in float64 then cast to float32     (sde.py:165-174)
- DDPM._compute_alpha_cumprod prepends a zero beta so t=-1 maps to
  alpha_bar=1 (std 0, mean 1)                                     (sde.py:172-174)

The two model families of the reference (`_SCORE_PRED_CLASSES` /
`_EPSILON_PRED_CLASSES`, sde.py:196-197) become a `prediction_type` attribute
('score' | 'epsilon') used for static dispatch in samplers and losses.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SDE", "VESDE", "VPSDE", "DDPM", "get_standard_sde"]


def _bcast(v: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Broadcast a per-batch vector (B,) to (B, 1, ..., 1) with `ndim` dims."""
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


@dataclasses.dataclass(frozen=True)
class SDE:
    """Base class; continuous time in [0, 1] (VE/VP) or integer steps (DDPM)."""

    prediction_type: str = dataclasses.field(default="score", init=False)

    # --- interface -------------------------------------------------------
    def diffusion_coeff(self, t: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def sde(self, x: jnp.ndarray, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (drift, diffusion)."""
        raise NotImplementedError

    def marginal_prob_std(self, t: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def marginal_prob_mean(self, t: jnp.ndarray) -> jnp.ndarray:
        """Scaling factor of the mean of p_{0t}(x(t)|x(0))."""
        raise NotImplementedError

    def marginal_prob(self, x: jnp.ndarray, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Mean and std of p_{0t}(x(t)|x(0)); mean has x's shape, std is (B,)."""
        mean = x * _bcast(self.marginal_prob_mean(t), x.ndim)
        return mean, self.marginal_prob_std(t)

    def prior_sampling(self, key: jax.Array, shape: Tuple[int, ...]) -> jnp.ndarray:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class VESDE(SDE):
    """Variance-exploding SDE (reference sde.py:55-103)."""

    sigma_min: float = 0.01
    sigma_max: float = 50.0
    prediction_type: str = dataclasses.field(default="score", init=False)

    def marginal_prob_std(self, t):
        t = jnp.asarray(t)
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    def marginal_prob_mean(self, t):
        t = jnp.asarray(t)
        return jnp.ones_like(t)

    def diffusion_coeff(self, t):
        sigma = self.marginal_prob_std(t)
        return sigma * math.sqrt(2.0 * (math.log(self.sigma_max) - math.log(self.sigma_min)))

    def sde(self, x, t):
        drift = jnp.zeros_like(x)
        diffusion = self.diffusion_coeff(t)
        return drift, diffusion

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape) * self.sigma_max


@dataclasses.dataclass(frozen=True)
class VPSDE(SDE):
    """Variance-preserving SDE (reference sde.py:106-156)."""

    beta_min: float = 0.1
    beta_max: float = 20.0
    prediction_type: str = dataclasses.field(default="score", init=False)

    def _log_mean_coeff(self, t):
        t = jnp.asarray(t)
        return -0.25 * t ** 2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min

    def marginal_prob_std(self, t):
        # -expm1 avoids the fp32 cancellation of `1 - exp(2 lm)` at small t
        # (the reference's formulation, sde.py:146, loses ~3 digits there).
        return jnp.sqrt(-jnp.expm1(2.0 * self._log_mean_coeff(t)))

    def marginal_prob_mean(self, t):
        return jnp.exp(self._log_mean_coeff(t))

    def diffusion_coeff(self, t):
        t = jnp.asarray(t)
        beta_t = self.beta_min + t * (self.beta_max - self.beta_min)
        return jnp.sqrt(beta_t)

    def sde(self, x, t):
        t = jnp.asarray(t)
        beta_t = self.beta_min + t * (self.beta_max - self.beta_min)
        drift = -0.5 * _bcast(beta_t, x.ndim) * x
        return drift, self.diffusion_coeff(t)

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)


class _HashableArray:
    """Wraps a numpy array so a dataclass holding it stays hashable/static."""

    __slots__ = ("value", "_key")

    def __init__(self, value: np.ndarray):
        self.value = value
        self._key = (value.shape, value.dtype.str, value.tobytes())

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _HashableArray) and self._key == other._key


@dataclasses.dataclass(frozen=True)
class DDPM(SDE):
    """Discrete DDPM with a linear beta schedule (reference sde.py:159-194).

    Time arguments are integer step indices in [-1, num_steps-1]; ``t = -1``
    maps to alpha_bar = 1 (i.e. no noise), mirroring the prepended zero beta
    of the reference implementation (sde.py:172-174).
    """

    beta_min: float = 0.0001
    beta_max: float = 0.02
    num_steps: int = 1000
    prediction_type: str = dataclasses.field(default="epsilon", init=False)
    # alpha_bar table with a leading 1.0, computed in float64 (sde.py:165-174).
    _alpha_cumprod: _HashableArray = dataclasses.field(init=False, repr=False, compare=False)
    _alphas: _HashableArray = dataclasses.field(init=False, repr=False, compare=False)

    def __post_init__(self):
        betas = np.linspace(self.beta_min, self.beta_max, self.num_steps, dtype=np.float64)
        assert (betas > 0).all() and (betas <= 1).all()
        padded = np.concatenate([np.zeros(1), betas])
        bar = np.cumprod(1.0 - padded).astype(np.float32)
        object.__setattr__(self, "_alpha_cumprod", _HashableArray(bar))
        object.__setattr__(self, "_alphas", _HashableArray((1.0 - betas).astype(np.float32)))

    @property
    def alphas(self) -> jnp.ndarray:
        return jnp.asarray(self._alphas.value)

    def _compute_alpha_cumprod(self, t):
        t = jnp.asarray(t)
        table = jnp.asarray(self._alpha_cumprod.value)
        return table[(t.astype(jnp.int32) + 1)]

    def marginal_prob_std(self, t):
        return jnp.sqrt(1.0 - self._compute_alpha_cumprod(t))

    def marginal_prob_mean(self, t):
        return jnp.sqrt(self._compute_alpha_cumprod(t))

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)


def get_standard_sde(config) -> SDE:
    """Name->SDE dispatch mirroring reference exp_utils.py:99-121."""
    name = config.sde.type.lower()
    if name == "vesde":
        return VESDE(sigma_min=config.sde.sigma_min, sigma_max=config.sde.sigma_max)
    if name == "vpsde":
        return VPSDE(beta_min=config.sde.beta_min, beta_max=config.sde.beta_max)
    if name == "ddpm":
        return DDPM(beta_min=config.sde.beta_min, beta_max=config.sde.beta_max,
                    num_steps=config.sde.num_steps)
    raise NotImplementedError(name)
