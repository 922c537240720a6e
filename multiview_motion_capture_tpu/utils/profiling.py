"""First-class per-stage timing + optional JAX profiler traces.

The reference only has commented-out `time.time()` spans
(ref:src/mv_math_util.py:326-346, ref:src/mv_association.py:274,314); here
timing is a structured metrics dict every run returns (SURVEY.md §5).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._totals[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return dict(self._totals)

    def counts(self) -> Dict[str, int]:
        return dict(self._counts)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Wrap a block in a jax profiler trace when `log_dir` is set."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
