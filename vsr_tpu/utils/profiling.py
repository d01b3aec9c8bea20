"""Profiling hooks.

The reference has no tracing (SURVEY.md §5 — only tqdm postfix). Here:
``trace(dir)`` wraps ``jax.profiler`` for TensorBoard-viewable device
traces, and ``StepTimer`` collects wall-time percentiles without forcing
device syncs except at report time.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str | Path | None):
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if log_dir is None:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(log_dir)):
        yield


class StepTimer:
    """Wall-clock step statistics with an explicit sync boundary."""

    def __init__(self) -> None:
        self.samples: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        """Optionally blocks on ``result`` before taking the timestamp."""
        if result is not None:
            import jax

            jax.block_until_ready(result)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.samples.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.samples:
            return {}
        xs = sorted(self.samples)
        n = len(xs)
        return {
            "steps": n,
            "mean_s": sum(xs) / n,
            "p50_s": xs[n // 2],
            "p90_s": xs[min(n - 1, int(n * 0.9))],
            "max_s": xs[-1],
        }
