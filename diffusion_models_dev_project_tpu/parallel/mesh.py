"""Device-mesh and sharding helpers.

The reference is single-GPU with no distributed backend (SURVEY.md §2.10);
scaling here is pure SPMD: a `jax.sharding.Mesh` with a `data` axis (batch /
eval images) and an optional `model` axis, shardings annotated with
`NamedSharding`, collectives inserted by XLA/GSPMD over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "P", "Mesh", "NamedSharding"]


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Shard leading (batch) axis of every leaf across `axis`."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
