"""Profiling / tracing hooks (SURVEY.md §5: the reference self-times with
cudaEvent/CLOCK_MONOTONIC and ships -lineinfo for nsight; the TPU-native
equivalents are jax.profiler traces viewable in TensorBoard/Perfetto and
annotated host-side step timers)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(dir_path: str | None):
    """Wrap a region in a jax.profiler trace when dir_path is set."""
    if not dir_path:
        yield
        return
    import jax
    with jax.profiler.trace(dir_path):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region (shows up in the trace timeline)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Host-side rolling step timer (the Wtime() analog,
    optimized/utils.c:132-139)."""

    def __init__(self):
        self.t0 = None
        self.laps: list[float] = []

    def start(self):
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - (self.t0 if self.t0 is not None else now)
        self.laps.append(dt)
        self.t0 = now
        return dt

    @property
    def total(self) -> float:
        return sum(self.laps)
