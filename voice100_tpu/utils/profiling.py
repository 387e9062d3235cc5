"""Profiling and timing.

The reference has no tracing/profiling at all (SURVEY.md §5). This
module provides the TPU-native equivalents: ``jax.profiler`` trace
capture for xprof/tensorboard, a wall-clock timer with proper device
synchronization (on the tunneled TPU backend only a host fetch reliably
waits for execution), and an RTF helper for speech workloads.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np
import jax

__all__ = ["trace", "Timer", "device_sync", "realtime_factor"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(*arrays) -> None:
    """Force completion of device work feeding ``arrays``.

    ``block_until_ready`` can return before remote execution finishes on
    tunneled backends; fetching one element is the reliable barrier.
    """
    for a in arrays:
        if hasattr(a, "addressable_shards") or hasattr(a, "device"):
            _ = np.asarray(a.ravel()[:1] if a.ndim else a)


class Timer:
    """Wall-clock timer with device sync on stop."""

    def __init__(self) -> None:
        self.elapsed: Optional[float] = None
        self._start: Optional[float] = None

    def __enter__(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def stop(self, *sync_arrays) -> float:
        device_sync(*sync_arrays)
        self.elapsed = time.perf_counter() - self._start
        return self.elapsed

    def __exit__(self, *exc) -> None:
        if self.elapsed is None:
            self.elapsed = time.perf_counter() - self._start


def realtime_factor(audio_seconds: float, wall_seconds: float) -> float:
    """How many seconds of audio are processed per wall second."""
    return audio_seconds / max(wall_seconds, 1e-9)
