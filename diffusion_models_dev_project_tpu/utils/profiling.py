"""Profiling helpers: device traces and throughput counters.

The reference has near-zero tracing (SURVEY.md §5.1: tqdm postfixes and a
dormant thop hook); here:
- `device_trace` wraps `jax.profiler` for TensorBoard-viewable traces,
- `Throughput` tracks steps/sec (the BENCH.md north-star counter),
- `timed_value` times a computation with a forced value fetch
  (`block_until_ready` is unreliable through remote TPU relays — CLAUDE.md).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["device_trace", "Throughput", "timed_value"]


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_value(fn, *args, **kwargs):
    """Run `fn`, force completion via a scalar fetch, return (result, secs)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    return out, time.perf_counter() - t0


class Throughput:
    """Sliding steps/sec (/chip) counter."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []

    def tick(self, n_steps: int = 1) -> Optional[float]:
        now = time.perf_counter()
        self._times.append((now, n_steps))
        self._times = self._times[-self.window:]
        if len(self._times) < 2:
            return None
        dt = self._times[-1][0] - self._times[0][0]
        steps = sum(n for _, n in self._times[1:])
        if dt <= 0:
            return None
        return steps / dt / max(jax.device_count(), 1)
