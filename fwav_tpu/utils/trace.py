"""Tracing / profiling (SURVEY.md §5).

The reference's observability is wall-clock deltas around whole files
(fractal.py:1493, 1513). Here every pipeline stage is timed into a
per-thread phase table, and the JAX profiler can wrap any region for
XLA-level traces.

Usage:
    with collect_phases() as phases:
        compress_audio(...)          # stages call phase("vad"), phase("search"), ...
    print(phases)  # {"vad": 0.003, "device": 0.21, ...}

    with jax_profile("/tmp/trace"):  # TensorBoard-compatible XLA trace
        compress_audio(...)
"""

from __future__ import annotations

import contextlib
import threading
import time

_local = threading.local()


@contextlib.contextmanager
def collect_phases():
    """Collect phase timings recorded by `phase(...)` in this thread."""
    prev = getattr(_local, "phases", None)
    _local.phases = {}
    try:
        yield _local.phases
    finally:
        _local.phases = prev


@contextlib.contextmanager
def phase(name: str):
    """Time a pipeline stage. No-op cost when no collector is active."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink = getattr(_local, "phases", None)
        if sink is not None:
            sink[name] = sink.get(name, 0.0) + (time.perf_counter() - t0)


@contextlib.contextmanager
def jax_profile(logdir: str):
    """XLA-level profiler trace (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
