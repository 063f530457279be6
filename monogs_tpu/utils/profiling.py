"""Profiling / tracing hooks.

The reference's only instrumentation is a pair of CUDA events around the
whole run (SURVEY.md §5, slam.py:126-132). TPU-native upgrade: jax.profiler
trace capture around arbitrary SLAM phases plus lightweight wall-clock
section timers whose summaries feed the bench/metrics pipeline.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_sections: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def section(name: str, sync: bool = False):
    """Wall-clock section timer. sync=True blocks on device completion so
    the measurement covers dispatched work (use sparingly on the hot path)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            try:
                jax.effects_barrier()
            except Exception:
                pass
        _sections[name].append(time.perf_counter() - t0)


def summary() -> dict:
    return {
        name: {
            "n": len(v),
            "total_s": sum(v),
            "mean_ms": 1e3 * sum(v) / max(len(v), 1),
        }
        for name, v in _sections.items()
    }


def reset():
    _sections.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
