"""Tracing / profiling helpers.

The reference has no integrated tracing (SURVEY.md §5 — wall-clock meters
only); the TPU-native equivalents are jax.profiler traces and honestly
timed steps.

IMPORTANT for this repo's dev environment: over a remote-device tunnel
``jax.block_until_ready`` may return before execution completes, so honest
timing forces a host transfer per iteration (see
.claude memory axon-tpu-measurement).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_call(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Mean seconds per call, forcing host materialization each call."""
    for _ in range(warmup):
        out = jax.tree_util.tree_map(np.asarray, fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.tree_util.tree_map(np.asarray, fn(*args))
    del out
    return (time.perf_counter() - t0) / iters
