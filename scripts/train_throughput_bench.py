"""Training-step throughput of SimpleFCN on the TPU at 768x384.

The reference never published training throughput (its 60k-iteration runs
were just left overnight on a GTX 1080 Ti); this measures ours so the
framework's training story has a number next to the inference table in
docs/TIMING.md. Uses the loop-difference device timer (the iteration loop
runs on the device inside one program — immune to the ~30 ms tunnel RTT).

Run: python scripts/train_throughput_bench.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from modular_semantic_segmentation_tpu.models import get_model  # noqa: E402
from modular_semantic_segmentation_tpu.utils.profiling import (  # noqa: E402
    device_time_fn)


def measure(batchsize, compute_dtype, height=768, width=384, num_classes=14,
            iters=8):
    import jax

    data_description = (
        {"labels": np.int32, "rgb": np.float32},
        {"rgb": (None, None, 3), "labels": (None, None)}, num_classes)
    net = get_model("simple_fcn")(
        prefix="rgb", modality="rgb", num_units=64,
        data_description=data_description, batchsize=batchsize,
        learning_rate=1e-4, compute_dtype=compute_dtype)
    rng = np.random.RandomState(0)
    batch = {
        "rgb": jax.device_put(np.asarray(
            rng.rand(batchsize, height, width, 3) * 255, np.float32)),
        "labels": jax.device_put(rng.randint(
            0, num_classes, (batchsize, height, width)).astype(np.int32)),
    }
    variables = {k: jax.device_put(v) for k, v in net.variables.items()}
    opt_state = jax.device_put(net.opt_state)
    key = jax.random.PRNGKey(0)
    spf = device_time_fn(net._train_step, variables, opt_state, batch, key,
                         iters=iters, repetitions=3)
    return spf


def main():
    print(f"{'batch':>5} {'dtype':>9} {'s/step':>9} {'img/s':>8}")
    for compute_dtype in ("bfloat16", "float32"):
        for batchsize in (1, 4, 8):
            spf = measure(batchsize, compute_dtype)
            print(f"{batchsize:>5} {compute_dtype:>9} {spf:>9.4f} "
                  f"{batchsize / spf:>8.1f}")


if __name__ == "__main__":
    main()
