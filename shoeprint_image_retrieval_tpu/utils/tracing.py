"""Timing + profiling hooks.

The reference's only observability is tqdm progress bars and prints
(reference network.py:263, similarity.py:199-217). Here every pipeline stage
gets a wall-clock timer, and ``profile_trace`` exposes ``jax.profiler`` for
TPU timeline capture (SURVEY.md section 5: tracing/profiling implication).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def stage_timer(name: str, verbose: bool = True, sink: dict | None = None):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[name] = sink.get(name, 0.0) + dt
        if verbose:
            print(f"[{name}] {dt:.2f}s")


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace when a log dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
