"""Measure fused Bayes RGB-D inference with int8-quantized experts.

Builds the same flagship program as bench.py (two SimpleFCN experts +
Bayes fusion @1x768x384), calibrates PTQ scales on random frames, and
device-times the float vs quantized serving paths. Also reports batch-8
per-frame cost for the throughput-serving regime.

Run on the TPU: python scripts/int8_serving_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

from modular_semantic_segmentation_tpu.utils.profiling import \
    device_time_fn  # loop-difference method (stable over the tunnel)


def main():
    import jax
    import bench
    from modular_semantic_segmentation_tpu.ops.variables import Ctx

    print("devices:", jax.devices(), file=sys.stderr)

    for batch_size in (1, 8):
        net, _ = bench.build_flagship()
        rng_np = np.random.RandomState(1)
        batch = {
            "rgb": np.asarray(
                rng_np.rand(batch_size, 768, 384, 3) * 255, np.float32),
            "depth": np.asarray(
                rng_np.rand(batch_size, 768, 384, 1), np.float32),
        }
        rng = jax.random.PRNGKey(0)

        def forward(variables, batch, act_scales=None):
            ctx = Ctx(variables, train=False, rng=rng,
                      compute_dtype=net.compute_dtype,
                      act_scales=act_scales)
            return net._test_outputs(ctx, batch)["prediction"]

        variables = {k: jax.device_put(v) for k, v in net.variables.items()}
        dbatch = {k: jax.device_put(v) for k, v in batch.items()}

        t_float = device_time_fn(forward, variables, dbatch, iters=20, n2=60)

        # calibrate on the same frames (scale quality is irrelevant for
        # timing; accuracy parity is locked by tests/test_quantized_serving)
        net.config["batchsize"] = batch_size
        scales = net.quantize_for_serving(batch, num_batches=1)
        print(f"quantized convs: {len(scales)}", file=sys.stderr)

        t_int8 = device_time_fn(
            lambda v, b: forward(v, b, act_scales=net.act_scales),
            variables, dbatch, iters=20, n2=60)

        def fps(t):
            return batch_size / t

        print(f"batch {batch_size}: float {t_float * 1e3 / batch_size:6.2f} "
              f"ms/frame ({fps(t_float):6.1f} fps) | int8 "
              f"{t_int8 * 1e3 / batch_size:6.2f} ms/frame "
              f"({fps(t_int8):6.1f} fps) | speedup {t_float / t_int8:5.2f}x")


if __name__ == "__main__":
    main()
