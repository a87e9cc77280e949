"""Profiling & timing harness.

The reference's tracing surface is `torch.autograd.profiler.record_function`
wrappers (/root/reference/torch_utils/misc.py:110-115) and nothing else
(SURVEY.md section 5). The TPU-native surface is richer:

  * `trace(logdir)`   -- context manager around `jax.profiler` producing a
                         Perfetto/TensorBoard-viewable XPlane trace of XLA
                         executions (HLO-level, per-kernel HBM/MXU stats).
  * `annotate(name)`  -- `jax.profiler.TraceAnnotation` region marker, the
                         direct record_function equivalent.
  * `benchmark(fn)`   -- wall-clock timing with compile-excluded warmup and
                         `block_until_ready` on outputs (dispatch on TPU is
                         async; naive timing measures nothing).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace", host_tracer_level: int = 2):
    """Capture a device+host profiler trace under `logdir` (open with
    TensorBoard's profile plugin or Perfetto)."""
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces (record_function analogue)."""
    return jax.profiler.TraceAnnotation(name)


def benchmark(fn: Callable, *args, warmup: int = 2, iters: int = 10,
              **kwargs) -> Dict[str, float]:
    """Time `fn(*args, **kwargs)` with async dispatch flushed each call.

    Returns dict(mean_s, best_s, iters). The first `warmup` calls (jit
    compilation, autotuning) are excluded.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return dict(mean_s=sum(times) / len(times), best_s=min(times),
                iters=float(iters))
