"""Measurement simulation: y = A x + white noise.

Device-native re-design of `/root/reference/src/physics/simulation.py:12-23`:
noise is drawn with `jax.random` from an explicit key (no host numpy RNG in
the loop), with the same scaling convention — the noise std is
``rel_stddev * mean(|A x|)``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["simulate"]


def simulate(key: jax.Array, x: jnp.ndarray, ray_trafo, white_noise_rel_stddev: float,
             return_noise_level: bool = False):
    """Simulate a noisy observation from ground truth `x` (NHWC)."""
    observation = ray_trafo.apply(x)
    noise_level = white_noise_rel_stddev * jnp.mean(jnp.abs(observation))
    noise = noise_level * jax.random.normal(key, observation.shape, observation.dtype)
    noisy = observation + noise
    return (noisy, noise_level) if return_noise_level else noisy
