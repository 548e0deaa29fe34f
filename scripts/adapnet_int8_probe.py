"""Device-time AdapNet fused-Bayes inference: bf16 vs int8 at several
min_pixels eligibility floors (models/quantize.select_scales).

Round-2 finding (docs/TIMING.md): whole-model int8 REGRESSED AdapNet
(7.6 vs 6.8 ms/frame wall) — its quantizable convs are mostly 1x1
bottlenecks at small spatial sizes where the MXU is underfed and the
quantize ops at residual junctions dominate. The min_pixels floor keeps
those on the float path; this probe measures where the floor should sit.

Run on the TPU: python scripts/adapnet_int8_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

from modular_semantic_segmentation_tpu.utils.profiling import device_time_fn


def main():
    import jax

    from modular_semantic_segmentation_tpu.models import get_model
    from modular_semantic_segmentation_tpu.models import quantize as q
    from modular_semantic_segmentation_tpu.ops.variables import Ctx

    print("devices:", jax.devices(), file=sys.stderr)
    num_classes = 14
    data_description = (
        {"labels": np.int32, "rgb": np.float32, "depth": np.float32},
        {"rgb": (None, None, 3), "depth": (None, None, 1),
         "labels": (None, None)}, num_classes)
    rng_np = np.random.RandomState(0)
    cms = {m: rng_np.rand(num_classes, num_classes)
           + np.eye(num_classes) * 5 for m in ("rgb", "depth")}
    net = get_model("bayes_mix")(
        data_description=data_description, confusion_matrices=cms,
        expert_model="adapnet", num_units=64,
        prefixes={"rgb": "rgb", "depth": "depth"}, batchsize=1)
    batch = {
        "rgb": np.asarray(rng_np.rand(1, 768, 384, 3) * 255, np.float32),
        "depth": np.asarray(rng_np.rand(1, 768, 384, 1), np.float32)}
    rng = jax.random.PRNGKey(0)

    def forward(variables, batch, act_scales=None):
        ctx = Ctx(variables, train=False, rng=rng,
                  compute_dtype=net.compute_dtype, act_scales=act_scales)
        return net._test_outputs(ctx, batch)["prediction"]

    variables = {k: jax.device_put(v) for k, v in net.variables.items()}
    dbatch = {k: jax.device_put(v) for k, v in batch.items()}

    t_float = device_time_fn(forward, variables, dbatch, iters=10, n2=30)
    print(f"bf16: {t_float * 1e3:6.2f} ms/frame")

    amax = q.calibrate_amax(net, batch, num_batches=1)
    # AdapNet conv-input spatial sizes at 768x384 are 18432/4608/1152, so
    # 2048 and 4096 select identical conv sets — sweep the distinct floors
    # (override on the command line; each config is a full remote compile)
    floors = tuple(int(a) for a in sys.argv[1:]) or (0, 2048, 16384)
    for min_pixels in floors:
        scales = q.select_scales(amax, net.variables, min_pixels=min_pixels)
        if not scales:
            print(f"min_pixels {min_pixels:6d}: no convs quantized")
            continue
        t = device_time_fn(
            lambda v, b: forward(v, b, act_scales=scales),
            variables, dbatch, iters=10, n2=30)
        print(f"min_pixels {min_pixels:6d}: {len(scales):3d} convs int8, "
              f"{t * 1e3:6.2f} ms/frame ({t_float / t:4.2f}x vs bf16)")


if __name__ == "__main__":
    main()
