"""Profiling hooks (SURVEY.md §5: the reference has none — tqdm only).

- :class:`StepTimer` — episodes/sec tracking (the BASELINE.json north-star
  metric) with correct device synchronization.
- :func:`trace_context` — ``jax.profiler`` trace scope writing TensorBoard-
  compatible traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Counts episodes/sec across steps; call sync() with a device value
    to force completion before reading the clock."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._episodes = 0
        self._t0 = time.perf_counter()

    def tick(self, n_episodes: int = 1):
        self._episodes += n_episodes

    @staticmethod
    def sync(value) -> None:
        # device→host read: reliable sync on every backend (see bench.py)
        jax.device_get(jax.tree.leaves(value)[0])

    @property
    def episodes_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._episodes / dt if dt > 0 else float("nan")


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
