"""Measurement simulation: y = A x + white noise.

Device-native re-design of `/root/reference/src/physics/simulation.py:12-23`:
noise is drawn with `jax.random` from an explicit key (no host numpy RNG in
the loop), with the same scaling convention — the noise std is
``rel_stddev * mean(|A x|)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["simulate", "SimulatedDataset"]


def simulate(key: jax.Array, x: jnp.ndarray, ray_trafo, white_noise_rel_stddev: float,
             return_noise_level: bool = False):
    """Simulate a noisy observation from ground truth `x` (NHWC)."""
    observation = ray_trafo.apply(x)
    noise_level = white_noise_rel_stddev * jnp.mean(jnp.abs(observation))
    noise = noise_level * jax.random.normal(key, observation.shape, observation.dtype)
    noisy = observation + noise
    return (noisy, noise_level) if return_noise_level else noisy


class SimulatedDataset:
    """Wrap an image dataset into (observation, ground_truth, fbp) triplets
    with per-index deterministic noise (reference `SimulatedDataset`,
    simulation.py:25-74 — its numpy per-index seeds become per-index
    `jax.random.fold_in` keys)."""

    def __init__(self, image_dataset, ray_trafo,
                 white_noise_rel_stddev: float = 0.05, seed: int = 1):
        self.images = image_dataset
        self.ray_trafo = ray_trafo
        self.white_noise_rel_stddev = white_noise_rel_stddev
        self.seed = seed

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx: int):
        import jax.numpy as jnp

        x = jnp.asarray(self.images[idx])
        if x.ndim == 3:
            x = x[None]
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), idx)
        y = simulate(key, x, self.ray_trafo, self.white_noise_rel_stddev)
        fbp = self.ray_trafo.fbp(y)
        return y, x, fbp

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
