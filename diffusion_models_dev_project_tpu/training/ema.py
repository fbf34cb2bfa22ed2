"""Exponential moving average over parameter pytrees.

Functional re-design of the reference's stateful EMA helper
(`/root/reference/src/utils/ema.py:6-89`): state is a pytree `(shadow,
num_updates)` and `ema_update` is pure, so it can live inside the jitted
train step.  The decay ramp `min(decay, (1+n)/(10+n))` (ema.py:38-40) and
the warm-start behaviour (trainer.py:52-55: EMA is created only after
`ema_warm_start_steps` optimizer steps) are preserved.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["EmaState", "ema_init", "ema_update"]


class EmaState(NamedTuple):
    shadow: Any            # pytree matching params
    num_updates: jnp.ndarray   # int32 scalar


def ema_init(params) -> EmaState:
    return EmaState(shadow=jax.tree_util.tree_map(jnp.array, params),
                    num_updates=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, params, decay: float) -> EmaState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    shadow = jax.tree_util.tree_map(lambda s, p: s - (1.0 - d) * (s - p),
                                    state.shadow, params)
    return EmaState(shadow=shadow, num_updates=n)
