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
import os
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


def top_ops(trace_logdir: str, n: int = 25):
    """Aggregate device-op durations from the newest Perfetto trace under
    `trace_logdir` (written by `trace()`): returns [(total_ms, count, name,
    hlo_long_name)] sorted by total duration, whiles/jit roots excluded.
    Replaces the TensorBoard profile plugin for headless analysis."""
    import collections
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(os.path.join(
        trace_logdir, "plugins/profile/*/perfetto_trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no perfetto trace under {trace_logdir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data if isinstance(data, list) else data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    long_names = {}
    for e in events:
        if (e.get("ph") != "X"
                or "TPU" not in pid_names.get(e.get("pid"), "")):
            continue
        name = e["name"]
        if name.startswith(("while", "jit_")) or name.isdigit():
            continue
        dur[name] += e["dur"]
        cnt[name] += 1
        if "args" in e and name not in long_names:
            long_names[name] = e["args"].get("long_name", "")
    return [(d / 1e3, cnt[name], name, long_names.get(name, ""))
            for name, d in dur.most_common(n)]


def _force_fetch(out) -> None:
    """Copy one leaf to host. On tunneled TPU runtimes block_until_ready can
    return before device completion; a device->host fetch cannot."""
    import numpy as np

    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


def benchmark(fn: Callable, *args, warmup: int = 2, iters: int = 10,
              **kwargs) -> Dict[str, float]:
    """Time `fn(*args, **kwargs)` honestly: each measured batch ends with a
    forced device->host fetch (block_until_ready alone is unreliable on
    tunneled runtimes), and the reported per-call cost is the MARGINAL cost
    between a short and a long run, which subtracts the fixed dispatch+fetch
    overhead. The first `warmup` calls (jit compile, autotune) are excluded.

    Returns dict(mean_s, short_s, long_s, iters). For data-dependent
    chaining (the only way to defeat cross-call pipelining), make `fn`
    consume its own output and call benchmark on the chained wrapper.
    """
    for _ in range(warmup):
        _force_fetch(fn(*args, **kwargs))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args, **kwargs)
        _force_fetch(out)
        return time.perf_counter() - t0

    short = max(iters // 10, 1)
    run(short)
    t_short, t_long = run(short), run(iters)
    mean = (t_long - t_short) / (iters - short)
    return dict(mean_s=mean, short_s=t_short, long_s=t_long,
                iters=float(iters))
