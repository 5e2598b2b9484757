"""Timing / metrics subsystem.

First-class replacement for the reference's manual instrumentation — the
global ``excutionTime[20]`` bucket array filled with CUDA SDK stopwatch
timers (MatchGPULib.cpp:39, :1108-1117), clock_gettime per-level timing
(:1265-1269) and ros::WallTime end-to-end timing (UG_GPU_matcher.cpp:165).
Keeps a structured metrics dict instead of printf, and wraps
``jax.profiler`` for device-level traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class Timings:
    """Named wall-clock buckets with call counts."""

    def __init__(self) -> None:
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def bucket(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def record(self, name: str, seconds: float) -> None:
        self.total[name] += seconds
        self.count[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": round(self.total[k], 6),
                "count": self.count[k],
                "mean_s": round(self.total[k] / max(1, self.count[k]), 6)}
            for k in sorted(self.total)
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)

    def reset(self) -> None:
        self.total.clear()
        self.count.clear()


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (view with TensorBoard/XProf).
    Degrades to a no-op if the backend doesn't support tracing."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
