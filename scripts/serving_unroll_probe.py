"""Probe: does a deeper serving unroll buy wall fps at the bench shapes?

The bench serving program statically unrolls UNROLL=4 batch-1 frames per
dispatch (bench.py prepare_serving; the reference's per-call semantics are
experiments/timing.py:49-83). Round-5 walls sit 0.1-0.2 ms/frame above the
device floors — exactly the amortized per-dispatch tunnel cost, so doubling
the unroll halves the remaining gap IF the compile cost and program size
stay sane. This probe measures unroll {4, 8} for bf16 and int8 with the
bench's own window discipline (>=2 s windows, min-of-N, spaced), plus each
program's compile wall, so the decision is made on numbers.

Run exclusively (no CPU contention): python scripts/serving_unroll_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import bench  # noqa: E402  (sets the persistent compile cache env)


def prepare(net, batch, rng, unroll):
    import jax

    from modular_semantic_segmentation_tpu.serving import InferenceServer

    program = InferenceServer(net, unroll=unroll).group_program
    variables = {k: jax.device_put(v) for k, v in net.variables.items()}
    rng_np = np.random.RandomState(1)
    batches = [{k: jax.device_put(np.asarray(
        rng_np.rand(*np.shape(v)) * (255 if k == "rgb" else 1), np.float32))
        for k, v in batch.items()} for _ in range(2 * unroll)]
    groups = [batches[:unroll], batches[unroll:]]

    def run(i):
        return program(variables, groups[i % 2], rng)

    t0 = time.perf_counter()
    np.asarray(run(0)[-1])
    compile_s = time.perf_counter() - t0
    np.asarray(run(1)[-1])
    return run, compile_s


def wall(run, unroll, floor, window_s=2.0):
    """One >=window_s wall window (bench.wall_window discipline)."""
    calls = max(4, int(np.ceil(window_s / (floor * unroll))))
    start = time.perf_counter()
    outs = [run(i) for i in range(calls)]
    np.asarray(outs[-1][-1])
    return (time.perf_counter() - start) / (calls * unroll)


def main():
    import jax

    net, batch = bench.build_flagship()
    rng = jax.random.PRNGKey(0)

    modes = {}
    floors = {}
    floors["bf16"] = bench.measure_device_floor(net, batch, rng)
    for unroll in (4, 8):
        modes[("bf16", unroll)] = prepare(net, batch, rng, unroll)
    net.quantize_for_serving(batch, num_batches=1)
    floors["int8"] = bench.measure_device_floor(net, batch, rng)
    for unroll in (4, 8):
        modes[("int8", unroll)] = prepare(net, batch, rng, unroll)

    print(f"floors: bf16 {floors['bf16']*1e3:.2f} ms  "
          f"int8 {floors['int8']*1e3:.2f} ms")
    # interleave the four configs round-robin so one tunnel period cannot
    # favor a config (same defense as bench.measure_walls)
    results = {k: [] for k in modes}
    for _ in range(5):
        for (dtype, unroll), (run, _) in modes.items():
            results[(dtype, unroll)].append(
                wall(run, unroll, floors[dtype]))
        time.sleep(6.0)
    for (dtype, unroll), (run, compile_s) in modes.items():
        spfs = results[(dtype, unroll)]
        fps = sorted((1.0 / s for s in spfs), reverse=True)
        print(f"{dtype} unroll={unroll}: best {min(spfs)*1e3:.3f} ms/frame "
              f"({1.0/min(spfs):.1f} fps), windows {[round(f,1) for f in fps]}, "
              f"overhead vs floor {(min(spfs)-floors[dtype])*1e3:.3f} ms, "
              f"compile {compile_s:.1f} s")


if __name__ == "__main__":
    main()
