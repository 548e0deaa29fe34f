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


@jax.jit
def _scalar_probe(x):
    """Tiny reduction whose value depends on the whole array — a 4-byte
    readback that still bounds all queued device work."""
    import jax.numpy as jnp
    return jnp.sum(x.astype(jnp.float32))


def time_fn(fn, *args, repetitions=50, warmup=3):
    """Measure a jitted function.

    Returns dict with:
        sync_mean_s / sync_std_s: per-call latency with a blocking wait
            (includes any host<->device link latency);
        pipelined_mean_s: throughput with async dispatch, one final block —
            the per-frame device cost in a production serving loop.
    """
    def _force(out):
        # forced scalar readback: on the tunneled axon device
        # block_until_ready can return while compile/execute is still in
        # flight, which leaks the ~60 s first compile into the timed
        # region (observed: 6.58 s/frame "pipelined" at repetitions=10
        # with a 0.0000 s sync mean). A host readback that depends on the
        # output cannot return early.
        if isinstance(out, dict):
            out = next(iter(out.values()))
        elif isinstance(out, (tuple, list)):
            out = out[-1]
        np.asarray(_scalar_probe(out))

    _force(fn(*args))
    for _ in range(warmup):
        _force(fn(*args))

    sync = []
    for _ in range(repetitions):
        start = time.perf_counter()
        _force(fn(*args))
        sync.append(time.perf_counter() - start)

    start = time.perf_counter()
    outs = [fn(*args) for _ in range(repetitions)]
    # Bound the measurement with a host readback that DEPENDS on the last
    # output: the device executes serially, so this bounds every prior
    # execution. Read back a scalar reduction, not the full output —
    # downloading a multi-MB prediction over a ~30 ms tunnel would
    # otherwise be billed to the chip.
    _force(outs[-1])
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


def device_time_fn(fn, *args, iters=20, repetitions=3):
    """Time ``fn(*args)`` with the iteration loop ON THE DEVICE.

    ``lax.fori_loop`` runs ``iters`` serial evaluations inside ONE compiled
    program, so the measurement contains exactly one dispatch + one 4-byte
    readback — immune to host<->device link latency and jitter (the ~30 ms
    tunnel of this environment makes per-dispatch timing unreliable).
    A vanishing carry perturbation (x + carry * 1e-30) chains iterations so
    XLA can neither hoist the body out of the loop nor dead-code it.

    Returns seconds per single fn evaluation (min over repetitions, loop
    overhead removed via an iters=1 calibration run).
    """
    import jax.numpy as jnp
    from jax import lax

    first = jax.tree_util.tree_leaves(args)[0]

    def make(n):
        @jax.jit
        def run():
            def body(_, carry):
                perturbed = jax.tree_util.tree_map(
                    lambda a: (a + (carry * 1e-30).astype(a.dtype)
                               if jnp.issubdtype(a.dtype, jnp.floating)
                               else a),
                    args)
                out = fn(*perturbed)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return jnp.sum(leaf.astype(jnp.float32)) * 1e-30
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    looped, single = make(iters), make(1)
    np.asarray(looped())  # compile
    np.asarray(single())
    best = float("inf")
    for _ in range(repetitions):
        start = time.perf_counter()
        np.asarray(single())
        t1 = time.perf_counter() - start
        start = time.perf_counter()
        np.asarray(looped())
        tn = time.perf_counter() - start
        best = min(best, (tn - t1) / (iters - 1))
    del first
    return best
