"""Random-ellipse phantom datasets with on-device rasterization.

Re-design of the reference datasets
(`/root/reference/src/dataset/ellipses.py:14-155`), which rasterize each
image on the host with ODL's `ellipsoid_phantom` (native C code) and ship
256 KB/image to the device.  Here the host only *samples the ellipse
parameters* (140 x 6 floats ≈ 3 KB/image, identical distributions and the
same per-fold `np.random.RandomState` seeding) and a vmapped/jitted JAX
rasterizer draws the batch directly on the TPU — the data pipeline sends
parameters, not pixels.

Parameter distributions (ellipses.py:57-70, 121-136):
  v   ~ U(-0.4, 1)        value of each ellipse (summed where overlapping)
  a1,a2 ~ 0.2[*diameter] * Exp(1)   half-axes
  centre: uniform square (plain) or triangular-radius disk (disk variant)
  rot ~ U(0, 2pi); number of active ellipses ~ min(Poisson(E), E)
Normalization (ellipses.py:75-77): subtract the global min from all
non-zero pixels, divide by the max.
"""
from __future__ import annotations

import functools
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sample_ellipse_params", "rasterize_ellipses", "EllipsesDataset",
           "DiskDistributedEllipsesDataset", "get_disk_dist_ellipses_dataset",
           "get_ellipses_dataset"]


def sample_ellipse_params(rng: np.random.RandomState, max_n_ellipse: int,
                          diameter: Optional[float] = None) -> np.ndarray:
    """One image's ellipse table (E, 6): columns (v, a1, a2, cx, cy, rot)."""
    E = max_n_ellipse
    v = rng.uniform(-0.4, 1.0, (E,))
    if diameter is None:
        a1 = 0.2 * rng.exponential(1.0, (E,))
        a2 = 0.2 * rng.exponential(1.0, (E,))
        x = rng.uniform(-0.9, 0.9, (E,))
        y = rng.uniform(-0.9, 0.9, (E,))
    else:
        a1 = 0.2 * diameter * rng.exponential(1.0, (E,))
        a2 = 0.2 * diameter * rng.exponential(1.0, (E,))
        c_r = rng.triangular(0.0, diameter, diameter, size=(E,))
        c_a = rng.uniform(0.0, 2 * np.pi, (E,))
        x = np.cos(c_a) * c_r
        y = np.sin(c_a) * c_r
    rot = rng.uniform(0.0, 2 * np.pi, (E,))
    n = min(rng.poisson(E), E)
    v[n:] = 0.0
    return np.stack((v, a1, a2, x, y, rot), axis=1).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1,))
def rasterize_ellipses(params: jnp.ndarray, im_size: int) -> jnp.ndarray:
    """Draw a batch of phantoms on device.

    params: (B, E, 6) -> images (B, im_size, im_size, 1) in [0, 1].
    Convention: normalized coordinates in [-1, 1]^2, x = columns
    (left->right), y = rows (bottom->top), matching ODL's unit-square
    ellipse parameterization.
    """
    # pixel-centre grid in [-1, 1]
    cs = (jnp.arange(im_size) + 0.5) / im_size * 2.0 - 1.0
    px = cs[None, :]                     # x along columns
    py = -cs[:, None]                    # y along rows (top row = +1)

    def draw_one(tab):
        v, a1, a2, cx, cy, rot = (tab[:, i] for i in range(6))
        ct, st = jnp.cos(rot), jnp.sin(rot)

        def add_ellipse(img, e):
            v_, a1_, a2_, cx_, cy_, ct_, st_ = e
            dx = px - cx_
            dy = py - cy_
            u = (ct_ * dx + st_ * dy) / jnp.maximum(a1_, 1e-8)
            w = (-st_ * dx + ct_ * dy) / jnp.maximum(a2_, 1e-8)
            return img + v_ * ((u * u + w * w) <= 1.0), None

        es = jnp.stack([v, a1, a2, cx, cy, ct, st], axis=1)
        img, _ = jax.lax.scan(add_ellipse, jnp.zeros((im_size, im_size)), es)
        # foreground normalization (reference ellipses.py:75-77)
        minv = jnp.min(img)
        img = jnp.where(img != 0.0, img - minv, img)
        maxv = jnp.max(img)
        return img / jnp.where(maxv > 0, maxv, 1.0)

    return jax.vmap(draw_one)(params)[..., None].astype(jnp.float32)


class EllipsesDataset:
    """Iterable dataset of ellipse phantoms (reference ellipses.py:14-106)."""

    diameter: Optional[float] = None

    def __init__(self, shape: Tuple[int, int] = (128, 128), length: int = 3200,
                 fixed_seed: int = 1, fold: str = "train", max_n_ellipse: int = 70):
        assert shape[0] == shape[1], "square images only"
        self.shape = shape
        self.length = length
        self.max_n_ellipse = max_n_ellipse
        fixed_seed = None if fixed_seed in (False, None) else int(fixed_seed)
        if fixed_seed is not None and fold == "validation":
            fixed_seed += 1
        self.rng = np.random.RandomState(fixed_seed)
        self._params_cache: list = []

    def __len__(self) -> int:
        return self.length

    def _ensure_params(self, n: int):
        while len(self._params_cache) < n:
            self._params_cache.append(
                sample_ellipse_params(self.rng, self.max_n_ellipse, self.diameter))

    def params_batch(self, start: int, n: int) -> np.ndarray:
        self._ensure_params(start + n)
        return np.stack(self._params_cache[start:start + n])

    def __getitem__(self, idx: int) -> np.ndarray:
        self._ensure_params(idx + 1)
        img = rasterize_ellipses(jnp.asarray(self._params_cache[idx][None]),
                                 self.shape[0])
        return np.asarray(img[0])

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(self.length):
            yield self[i]

    def batches(self, batch_size: int, *, repeat: bool = True):
        """Endless (or single-pass) iterator of on-device NHWC batches."""
        i = 0
        while True:
            if i + batch_size > self.length:
                if not repeat:
                    return
                i = 0
            params = self.params_batch(i, batch_size)
            yield rasterize_ellipses(jnp.asarray(params), self.shape[0])
            i += batch_size


class DiskDistributedEllipsesDataset(EllipsesDataset):
    """Centres triangular-distributed in a disk (reference ellipses.py:108-136)."""

    def __init__(self, shape=(128, 128), length=3200, fixed_seed=1, fold="train",
                 diameter: float = 0.4745, max_n_ellipse: int = 70):
        super().__init__(shape=shape, length=length, fixed_seed=fixed_seed,
                         fold=fold, max_n_ellipse=max_n_ellipse)
        self.diameter = diameter


def get_ellipses_dataset(fold="train", im_size=128, length=3200,
                         max_n_ellipse=70, device=None) -> EllipsesDataset:
    return EllipsesDataset((im_size, im_size), length=length, fold=fold,
                           max_n_ellipse=max_n_ellipse)


def get_disk_dist_ellipses_dataset(fold="train", im_size=128, length=3200,
                                   diameter=0.4745, max_n_ellipse=70,
                                   device=None) -> DiskDistributedEllipsesDataset:
    return DiskDistributedEllipsesDataset((im_size, im_size), length=length,
                                          fold=fold, diameter=diameter,
                                          max_n_ellipse=max_n_ellipse)
