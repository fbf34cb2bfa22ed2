"""Training losses for score- and epsilon-prediction diffusion models.

Pure-functional re-design of `/root/reference/src/utils/losses.py`:
- `score_matching_loss`  — denoising score matching with continuous time
  t ~ U(eps, 1), loss = mean_b sum_pix (score*std + z)^2   (losses.py:3-21)
- `epsilon_matching_loss` — DDPM eps-MSE with t ~ U{1..N-1},
  loss = mean_b sum_pix (z - zhat)^2                        (losses.py:23-41)

Randomness comes from explicit `jax.random` keys so the whole train step
jits; images are NHWC.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.sde import SDE, DDPM

__all__ = ["score_matching_loss", "epsilon_matching_loss", "make_loss_fn"]


def _bc(v, ndim):
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


def score_matching_loss(key: jax.Array, x: jnp.ndarray, model_fn: Callable,
                        sde: SDE, eps: float = 1e-5) -> jnp.ndarray:
    kt, kz = jax.random.split(key)
    t = jax.random.uniform(kt, (x.shape[0],)) * (1.0 - eps) + eps
    z = jax.random.normal(kz, x.shape, x.dtype)
    mean, std = sde.marginal_prob(x, t)
    std_b = _bc(std, x.ndim)
    perturbed = mean + z * std_b
    score = model_fn(perturbed, t)
    return jnp.mean(jnp.sum((score * std_b + z) ** 2, axis=(1, 2, 3)))


def epsilon_matching_loss(key: jax.Array, x: jnp.ndarray, model_fn: Callable,
                          sde: DDPM) -> jnp.ndarray:
    kt, kz = jax.random.split(key)
    t = jax.random.randint(kt, (x.shape[0],), 1, sde.num_steps)
    z = jax.random.normal(kz, x.shape, x.dtype)
    mean, std = sde.marginal_prob(x, t)
    perturbed = mean + z * _bc(std, x.ndim)
    zhat = model_fn(perturbed, t)
    return jnp.mean(jnp.sum((z - zhat) ** 2, axis=(1, 2, 3)))


def make_loss_fn(sde: SDE) -> Callable:
    """Family dispatch mirroring reference trainer.py:31-36."""
    if sde.prediction_type == "score":
        return score_matching_loss
    return lambda key, x, model_fn, sde_: epsilon_matching_loss(key, x, model_fn, sde_)
