"""Host-side sampling time-grid construction.

Grids are static given the sampler flags, so they are computed once in numpy
and baked into the jitted `lax.scan` as constant arrays — the TPU-native
replacement for the per-step Python iteration of the reference
(`/root/reference/src/samplers/base_sampler.py:44-61`).
"""
from __future__ import annotations

from typing import List

import numpy as np

__all__ = ["score_time_grid", "ddpm_time_pairs", "schedule_jump", "check_times"]


def score_time_grid(num_steps: int, eps: float) -> np.ndarray:
    """Continuous time grid for VE/VP models: linspace(1, eps, num_steps).

    Mirrors reference base_sampler.py:45-46.
    """
    return np.linspace(1.0, eps, num_steps, dtype=np.float64).astype(np.float32)


def check_times(times: List[int], t_0: int, num_steps: int) -> None:
    """Sanity checks on a jump schedule (reference samplers/utils.py:403-413)."""
    assert times[0] > times[1], (times[0], times[1])
    assert times[-1] == -1, times[-1]
    for t_last, t_cur in zip(times[:-1], times[1:]):
        assert abs(t_last - t_cur) == 1, (t_last, t_cur)
    for t in times:
        assert t_0 <= t <= num_steps, (t, t_0, num_steps)


def schedule_jump(num_steps: int, travel_length: int, travel_repeat: int) -> List[int]:
    """Time-travel schedule for DDPM sampling (reference samplers/utils.py:416-434).

    With travel_length == travel_repeat == 1 this is simply
    ``num_steps-1, ..., 0, -1``.
    """
    jumps = {}
    for j in range(0, num_steps - travel_length, travel_length):
        jumps[j] = travel_repeat - 1

    t = num_steps
    time_steps: List[int] = []
    while t >= 1:
        t = t - 1
        time_steps.append(t)
        if jumps.get(t, 0) > 0:
            jumps[t] = jumps[t] - 1
            for _ in range(travel_length):
                t = t + 1
                time_steps.append(t)
    time_steps.append(-1)
    check_times(time_steps, -1, num_steps)
    return time_steps


def ddpm_time_pairs(
    sde_num_steps: int,
    num_steps: int,
    travel_length: int = 1,
    travel_repeat: int = 1,
    early_stopping_pct: float | None = None,
) -> np.ndarray:
    """(t, t-1) integer pairs scaled by the skip factor, shape (S, 2).

    Mirrors reference base_sampler.py:48-61: ``skip = sde.num_steps //
    num_steps``; pairs are ``(i*skip, j*skip if j > 0 else -1)``; an optional
    early-stopping fraction truncates the schedule.
    """
    assert sde_num_steps >= num_steps
    skip = sde_num_steps // num_steps
    ts = schedule_jump(num_steps, travel_length, travel_repeat)
    pairs = [(i * skip, j * skip if j > 0 else -1) for i, j in zip(ts[:-1], ts[1:])]
    if early_stopping_pct is not None:
        pairs = pairs[: int(early_stopping_pct * len(pairs))]
    return np.asarray(pairs, dtype=np.int32)
