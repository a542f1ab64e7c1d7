"""Profiling/tracing helpers (SURVEY.md §5: the reference has only
wall-clock prints; we add real device traces).

- `trace(dir)` — context manager around `jax.profiler` for TensorBoard-
  viewable TPU traces of train/sample steps.
- `StepTimer` — async-friendly per-step wall clock that only syncs on
  report, replacing per-batch `time.time()` deltas around blocking calls
  (`test_inpainting_better.py:732-739`).
"""
from __future__ import annotations

import contextlib
import time
from typing import List

import jax

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.times: List[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        """Force `result` (if given) then record elapsed seconds.

        Uses a scalar device->host readback rather than block_until_ready:
        on tunneled TPU backends the latter returns without synchronizing.
        """
        if result is not None:
            leaves = jax.tree_util.tree_leaves(result)
            if leaves:
                x = leaves[0]
                probe = x.reshape(-1)[0] if hasattr(x, "reshape") else x
                float(jax.numpy.asarray(probe).sum())
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self):
        return sum(self.times) / max(len(self.times), 1)

    def summary(self, per: int = 1) -> str:
        if not self.times:
            return "no steps timed"
        return (f"{len(self.times)} steps, mean {self.mean/per:.4f}s/item, "
                f"min {min(self.times)/per:.4f}s, max {max(self.times)/per:.4f}s")
