"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5 — only coarse wall-clock logs around
validation). TPU build: `jax.profiler` trace capture over a step window plus
a per-step wall-clock timer with percentile summaries.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np


class StepTimer:
    """Per-step wall-clock meter; cheap enough to run always."""

    def __init__(self, window: int = 200):
        self.window = window
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        if self._t0 is None:
            return 0.0   # already stopped since the last start (the trainer
                         # consumes two pendings on sync-point iterations)
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.array(self._times)
        return {"step_time_mean_s": float(arr.mean()),
                "step_time_p50_s": float(np.percentile(arr, 50)),
                "step_time_p95_s": float(np.percentile(arr, 95)),
                "steps_per_sec": float(1.0 / arr.mean())}


class TraceWindow:
    """Capture a jax.profiler trace for steps [start, stop)."""

    def __init__(self, log_dir: Optional[str], start_step: int = 10,
                 num_steps: int = 5):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def maybe_start(self, step: int) -> None:
        if self.log_dir and not self._active and step == self.start_step:
            import jax
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.stop_step:
            import jax
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
