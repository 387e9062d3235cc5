"""Utilities: profiling/tracing and timing helpers."""

from .profiling import trace, Timer, device_sync

__all__ = ["trace", "Timer", "device_sync"]
