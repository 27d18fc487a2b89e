"""Tracing / profiling / numeric-sanity helpers (SURVEY.md section 5.1-5.2).

The reference has no profiler hooks (debug prints only); the TPU-native
equivalents here are:
  * ``trace(name)`` — a ``jax.profiler.TraceAnnotation`` context that shows
    up in TensorBoard/perfetto traces captured with ``start_trace``;
  * ``Timer`` / ``benchmark`` — block_until_ready-based wall timers for
    micro-benchmarks;
  * ``checked`` — wrap a function with ``jax.experimental.checkify`` NaN/Inf
    checks (the reference's only numeric sanitizer is a NaN guard on the
    adversarial loss, adv_compose_solver.py:345-346; this generalizes it).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax

__all__ = ["trace", "start_trace", "stop_trace", "Timer", "benchmark",
           "checked"]


def trace(name: str):
    """Named region for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def start_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)


def stop_trace():
    jax.profiler.stop_trace()


class Timer:
    """Wall timer that synchronizes device work.

    >>> with Timer() as t:
    ...     out = step(x)
    ...     t.sync(out)
    >>> t.ms
    """

    def __enter__(self):
        self._t0 = time.perf_counter()
        self.ms = None
        return self

    def sync(self, *values):
        for v in values:
            jax.block_until_ready(v)

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self._t0) * 1000.0
        return False


def benchmark(fn: Callable, *args, warmup: int = 1, reps: int = 10,
              **kwargs) -> dict:
    """Compile + time ``fn(*args)``; returns ms statistics."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append((time.perf_counter() - t0) * 1000.0)
    times.sort()
    return {"min_ms": times[0], "median_ms": times[len(times) // 2],
            "mean_ms": sum(times) / len(times), "reps": reps}


def checked(fn: Callable, jit: bool = True):
    """Wrap ``fn`` with checkify float (NaN/Inf) + index checks; the wrapper
    RAISES on the first error instead of propagating silent NaNs.

    >>> safe_step = checked(train_step)
    >>> out = safe_step(state, batch)   # raises JaxRuntimeError on NaN
    """
    from jax.experimental import checkify

    errs = checkify.float_checks | checkify.index_checks
    cf = checkify.checkify(fn, errors=errs)
    if jit:
        cf = jax.jit(cf)

    def wrapper(*args, **kwargs):
        err, out = cf(*args, **kwargs)
        err.throw()
        return out

    return wrapper
