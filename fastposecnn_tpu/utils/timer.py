"""Runtime timing for jitted stages.

Parity: FPC/tools/timer.py:8-64 (`TimerDecorator`: CUDA-event pairs around
forward stages, ms/FPS averages, report at FPC/inference.py:165-166). On TPU
a fused jit program has no host-visible stage boundaries, so `StageTimer`
times whole jitted callables with `jax.block_until_ready` wall clock; for
per-stage attribution run the pipeline in stage mode (each stage jitted
separately — `timed_stages`) or capture a profiler trace
(`utils.timer.trace`).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax


class StageTimer:
    """Wall-clock timer with the reference's average/fps reporting."""

    def __init__(self, name: str, enabled: bool = True):
        self.name = name
        self.enabled = enabled
        self.times_ms: List[float] = []

    def __call__(self, fn: Callable) -> Callable:
        def wrapper(*args, **kwargs):
            if not self.enabled:
                return fn(*args, **kwargs)
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            out = jax.block_until_ready(out)
            self.times_ms.append((time.perf_counter() - t0) * 1000.0)
            return out

        return wrapper

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.times_ms.append((time.perf_counter() - t0) * 1000.0)

    @property
    def average(self) -> float:
        # Drop the first (compile) sample when more are available, like
        # warmed-up CUDA event averages.
        samples = self.times_ms[1:] if len(self.times_ms) > 1 else self.times_ms
        return sum(samples) / max(len(samples), 1)

    @property
    def fps(self) -> float:
        avg = self.average
        return 1000.0 / avg if avg > 0 else float("inf")

    def report(self) -> str:
        return f"{self.name}: {self.average:.3f} ms - {self.fps:.1f} fps"


def report_runtime(timers: Dict[str, StageTimer]) -> str:
    """Print per-stage averages (FPC/lib/pose_regressor.py:563-570)."""
    lines = [t.report() for t in timers.values() if t.times_ms]
    text = "\n".join(lines)
    print(text)
    return text


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace wrapper for deep per-op attribution."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
