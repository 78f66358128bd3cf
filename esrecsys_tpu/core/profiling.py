"""Profiling & step timing.

The reference has no tracing or timers at all (SURVEY.md §5 — the only timing
is shell `time` in a README). Here: a context manager around
``jax.profiler`` traces plus a lightweight step timer whose stats feed the
metrics channel.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace if log_dir is given."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock examples/sec over a sliding window of steps."""

    def __init__(self, examples_per_step: int, window: int = 100):
        self.examples_per_step = examples_per_step
        self.window = window
        self._t0 = time.perf_counter()
        self._steps_in_window = 0
        self._examples_in_window = 0.0

    def tick(self, examples: Optional[float] = None,
             force: bool = False) -> Optional[Dict[str, float]]:
        """Call once per step; returns stats every `window` steps.

        ``examples`` overrides the per-step example count for THIS tick —
        callers whose final call processes a short tail chunk (train.loop
        fit) pass the actual count so examples/sec is not overstated.
        ``force`` emits stats for a partial window (a log crossing that
        lands on the tail call, where call count != the aligned window).
        """
        self._steps_in_window += 1
        self._examples_in_window += (
            self.examples_per_step if examples is None else examples)
        if self._steps_in_window < self.window and not force:
            return None
        t1 = time.perf_counter()
        dt = t1 - self._t0
        stats = {
            "steps_per_sec": self._steps_in_window / dt,
            "examples_per_sec": self._examples_in_window / dt,
            "ms_per_step": 1000.0 * dt / self._steps_in_window,
        }
        self._t0 = t1
        self._steps_in_window = 0
        self._examples_in_window = 0.0
        return stats
