"""Profiling / timing utilities.

The reference's tracing story is the timing harness + TF summaries
(SURVEY.md §5). TPU equivalents here:

    * :func:`trace` — context manager around ``jax.profiler`` writing a
      TensorBoard-loadable trace;
    * :func:`time_fn` — pipelined-throughput and synchronous-latency
      measurement with block_until_ready discipline (the bench.py / timing
      CLI primitive);
    * :func:`log_compile_time` — wall-clock of the first (compiling) call.
"""

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir):
    """Capture a jax.profiler trace into ``logdir`` (TensorBoard format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, repetitions=50, warmup=3):
    """Measure a jitted function.

    Returns dict with:
        sync_mean_s / sync_std_s: per-call latency with a blocking wait
            (includes any host<->device link latency);
        pipelined_mean_s: throughput with async dispatch, one final block —
            the per-frame device cost in a production serving loop.
    """
    jax.block_until_ready(fn(*args))
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))

    sync = []
    for _ in range(repetitions):
        start = time.perf_counter()
        jax.block_until_ready(fn(*args))
        sync.append(time.perf_counter() - start)

    start = time.perf_counter()
    outs = [fn(*args) for _ in range(repetitions)]
    # host readback of the last output: the device executes serially, so
    # this bounds every prior execution (block_until_ready can return
    # early on tunneled devices)
    last = outs[-1]
    if isinstance(last, dict):
        last = next(iter(last.values()))
    elif isinstance(last, (tuple, list)):
        last = last[-1]
    np.asarray(last)
    pipelined = (time.perf_counter() - start) / repetitions

    return {
        "sync_mean_s": float(np.mean(sync)),
        "sync_std_s": float(np.std(sync)),
        "pipelined_mean_s": float(pipelined),
        "pipelined_fps": float(1.0 / pipelined),
    }


def log_compile_time(fn, *args):
    """Wall-clock the first call (compile + execute). Returns (seconds,
    result)."""
    start = time.perf_counter()
    result = jax.block_until_ready(fn(*args))
    return time.perf_counter() - start, result
