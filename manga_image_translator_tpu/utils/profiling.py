"""Tracing / profiling.

The reference has none (SURVEY.md §5.1 — only tqdm bars). Here:

* per-stage wall timers collected into ``Context.stage_durations`` and
  reported on the progress-hook channel as ``stage-time:{name}:{ms}``;
* optional device profiling: set ``MIT_TPU_PROFILE_DIR`` to capture a JAX
  profiler trace (viewable in TensorBoard/XProf) around each pipeline run.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

from .log import get_logger

logger = get_logger('profiling')

PROFILE_DIR = os.environ.get('MIT_TPU_PROFILE_DIR')


class StageTimer:
    """Accumulates per-stage wall-clock durations for one pipeline run."""

    def __init__(self):
        self.durations: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.durations[name] = self.durations.get(name, 0.0) + dt

    def report(self) -> Dict[str, float]:
        return dict(self.durations)

    def summary(self) -> str:
        total = sum(self.durations.values())
        parts = [f'{k}: {v * 1000:.1f}ms' for k, v in self.durations.items()]
        return f'{" | ".join(parts)} | total {total * 1000:.1f}ms'


@contextlib.contextmanager
def device_trace(name: str):
    """JAX profiler trace around a region when MIT_TPU_PROFILE_DIR is set."""
    if not PROFILE_DIR:
        yield
        return
    import jax
    path = os.path.join(PROFILE_DIR, name)
    os.makedirs(path, exist_ok=True)
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f'device trace written to {path}')


@contextlib.contextmanager
def annotate(name: str):
    """Named region in device traces (no-op without an active trace)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
