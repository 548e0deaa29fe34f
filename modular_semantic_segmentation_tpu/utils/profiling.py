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


def device_time_fn(fn, *args, iters=50, repetitions=5, n2=None):
    """Time ``fn(*args)`` with the iteration loop ON THE DEVICE.

    ``lax.fori_loop`` runs the evaluations inside ONE compiled program, so
    a measurement contains exactly one dispatch + one 4-byte readback —
    immune to host<->device link latency (the ~30 ms tunnel of this
    environment makes per-dispatch timing unreliable). A vanishing carry
    perturbation (x + carry * 1e-30; runtime-dependent, numerically zero)
    chains iterations so XLA can neither hoist the body out of the loop
    nor CSE it across iterations.

    Loop-difference method: runs loops of ``iters`` and ``n2`` (default
    4*iters) iterations, takes the MIN wall time over ``repetitions`` for
    each length separately, and divides the difference of the two floors
    by the iteration delta. Dispatch overhead is a constant floor plus
    positive jitter, so it cancels exactly — the earlier
    calibration-subtraction variant paired single measurements and
    produced negative times for sub-ms kernels on this tunnel.

    ``args`` are passed as real jit parameters (closing over device arrays
    would bake them into the HLO as constants and can exceed the remote
    compiler's request-size limit).

    Returns seconds per single fn evaluation.
    """
    import jax.numpy as jnp
    from jax import lax

    n2 = 4 * iters if n2 is None else n2
    if n2 <= iters:
        raise ValueError(f"n2 ({n2}) must exceed iters ({iters})")

    def make(n):
        @jax.jit
        def run(*a):
            def body(_, carry):
                def perturb(x):
                    z = carry * 1e-30
                    if jnp.issubdtype(x.dtype, jnp.floating):
                        return x + z.astype(x.dtype)
                    if jnp.issubdtype(x.dtype, jnp.integer):
                        return x + z.astype(jnp.int32).astype(x.dtype)
                    return x
                out = fn(*jax.tree_util.tree_map(perturb, a))
                # feed EVERY output leaf into the carry: chaining only one
                # leaf lets XLA dead-code-eliminate the rest of the program
                # (observed: grad pytrees timed as ~0 because only one
                # gradient array stayed live)
                leaves = jax.tree_util.tree_leaves(out)
                total = jnp.float32(0.0)
                for leaf in leaves:
                    total = total + jnp.sum(leaf.astype(jnp.float32))
                return total * 1e-30
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    runs = {n: make(n) for n in (iters, n2)}
    for r in runs.values():
        np.asarray(r(*args))  # compile + warm
    floors = {}
    for n, r in runs.items():
        best = float("inf")
        for _ in range(repetitions):
            start = time.perf_counter()
            np.asarray(r(*args))
            best = min(best, time.perf_counter() - start)
        floors[n] = best
    return (floors[n2] - floors[iters]) / (n2 - iters)
