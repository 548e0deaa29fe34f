"""Which convs actually win int8? Per-group toggles at the flagship shape.

int8_decoder_probe measured the bundle effects: min_pixels=0 (adds the
conv5 block + score_conv5, 48x24) wins 3.73 -> 3.65 ms, while
min_channels=64 (adds the 768x384 decoder score conv) regresses to 4.58.
This probe decomposes the bundles into per-group deltas so the
eligibility rule can be set from measurements instead of thresholds:

    S0  production gates (mc=128, mp=2048)          — includes score_conv4
    S1  S0 minus score_conv4 (1x1 512->64 @96x48)
    S2  S0 plus conv5_1/2/3 (3x3 512->512 @48x24)
    S3  S2 plus score_conv5 (1x1 512->64 @48x24)    == mp=0 bundle

Run on the TPU: python scripts/int8_gate_probe.py
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
    import bench
    from modular_semantic_segmentation_tpu.ops.variables import Ctx

    print("devices:", jax.devices(), file=sys.stderr)

    net, batch = bench.build_flagship()
    rng = jax.random.PRNGKey(0)
    variables = {k: jax.device_put(v) for k, v in net.variables.items()}
    dbatch = {k: jax.device_put(v) for k, v in batch.items()}

    def forward_with(act_scales):
        def forward(variables, b):
            ctx = Ctx(variables, train=False, rng=rng,
                      compute_dtype=net.compute_dtype,
                      act_scales=act_scales)
            return net._test_outputs(ctx, b)["prediction"]
        return forward

    def floor(scales, name):
        t = device_time_fn(forward_with(scales), variables, dbatch,
                           iters=20, n2=60, repetitions=6)
        n = len(scales) if scales else 0
        print(f"{name:44s} {t * 1e3:6.2f} ms/frame "
              f"({1.0 / t:6.1f} fps) [{n} convs]", flush=True)
        return t

    net.act_scales = None
    prod = dict(net.quantize_for_serving(batch, num_batches=1,
                                         min_channels=128, min_pixels=2048))
    net.act_scales = None
    wide = dict(net.quantize_for_serving(batch, num_batches=1,
                                         min_channels=128, min_pixels=0))
    net.act_scales = None

    def drop(scales, *names):
        return {k: v for k, v in scales.items()
                if not any(k.endswith(f"/{n}/input_amax") for n in names)}

    def add(scales, source, *names):
        out = dict(scales)
        out.update({k: v for k, v in source.items()
                    if any(k.endswith(f"/{n}/input_amax") for n in names)})
        return out

    s0 = prod
    s1 = drop(prod, "score_conv4")
    s2 = add(prod, wide, "conv5_1", "conv5_2", "conv5_3")
    s3 = add(s2, wide, "score_conv5")
    assert set(s3) == set(wide), (set(wide) - set(s3), set(s3) - set(wide))

    floor(s0, "S0 production (incl score_conv4)")
    floor(s1, "S1 = S0 - score_conv4")
    floor(s2, "S2 = S0 + conv5 block")
    floor(s3, "S3 = S2 + score_conv5 (== mp=0)")


if __name__ == "__main__":
    main()
