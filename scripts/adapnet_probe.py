"""Where do AdapNet's 29 ms/frame go? Piecewise device timing on the v5e.

The reference's headline quality tables (I-III) use AdapNet experts
(reference xview/models/adapnet.py), but its timing table (Table V) only
covers the SimpleFCN family — so AdapNet never got the perf treatment.
Our first TPU measurement (experiments/timing.py time_adapnet) shows
29.4 ms/frame at 768x384: ~4 TFLOP/s effective on a ~115 GFLOP forward,
i.e. something lowers pathologically. This probe times each architecture
segment in isolation (same conv2d/deconv2d code paths, same bf16
discipline) to locate the sink before optimizing.

Run: python scripts/adapnet_probe.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import modular_semantic_segmentation_tpu  # noqa: E402,F401  (platform cfg)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from modular_semantic_segmentation_tpu.models.adapnet import (  # noqa: E402
    adapnet, block_a, block_b)
from modular_semantic_segmentation_tpu.ops import layers as ll  # noqa: E402
from modular_semantic_segmentation_tpu.ops.variables import Ctx  # noqa: E402
from modular_semantic_segmentation_tpu.utils.profiling import (  # noqa: E402
    device_time_fn)

H, W = 768, 384
NUM_UNITS, NUM_CLASSES = 64, 14
DTYPE = jnp.bfloat16


def init_variables():
    rng = jax.random.PRNGKey(0)
    ctx = Ctx(train=False, rng=rng, init=True, compute_dtype=DTYPE)
    x = jnp.zeros((1, H, W, 3), jnp.float32)
    adapnet(ctx, x, "rgb", NUM_UNITS, NUM_CLASSES)
    return {k: jax.device_put(v) for k, v in ctx.created.items()}


def capture_intermediates(variables):
    @jax.jit
    def fwd(variables, x):
        ctx = Ctx(variables, train=False, compute_dtype=DTYPE)
        return adapnet(ctx, x, "rgb", NUM_UNITS, NUM_CLASSES)
    x = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 3), jnp.float32)
    layers = fwd(variables, x)
    return x, {k: jax.device_put(v) for k, v in layers.items()}


def seg(fn):
    return jax.jit(fn)


def main():
    variables = init_variables()
    x, l = capture_intermediates(variables)
    print(f"{'segment':<42} {'ms':>8} {'GFLOP':>8} {'TFLOP/s':>8}")

    def time_seg(name, fn, inp, gflop=None):
        spf = device_time_fn(seg(fn), variables, inp, iters=8,
                             repetitions=3)
        eff = f"{gflop / spf / 1e3:>8.1f}" if gflop else f"{'—':>8}"
        gf = f"{gflop:>8.1f}" if gflop else f"{'—':>8}"
        print(f"{name:<42} {spf * 1e3:>8.3f} {gf} {eff}")
        return spf

    def in_scope(builder):
        def fn(variables, inp):
            ctx = Ctx(variables, train=False, compute_dtype=DTYPE)
            with ctx.scope("rgb"):
                return builder(ctx, inp)
        return fn

    total = 0.0

    # --- stem
    def stem(ctx, inp):
        p = {"activation": jax.nn.relu, "batch_normalization": True}
        a = ll.conv2d(ctx, inp, 64, 3, "block_0_1", **p)
        b = ll.conv2d(ctx, a, 64, 7, "block_0_2", strides=2, **p)
        return ll.max_pool2d(ctx, b, 2, 2)
    # 3x3 3->64 @768x384 + 7x7 64->64 /2 + pool
    total += time_seg("stem (3x3 + 7x7/s2 + pool)", in_scope(stem), x,
                      gflop=1.0 + 29.6)

    def only_7x7(ctx, inp):
        p = {"activation": jax.nn.relu, "batch_normalization": True}
        return ll.conv2d(ctx, inp, 64, 7, "block_0_2", strides=2, **p)
    time_seg("  7x7/s2 64->64 alone", in_scope(only_7x7), l["block_0_1"],
             gflop=29.6)

    # --- blocks 1-3 (C=256 @192x96)
    def blocks_1_3(ctx, inp):
        b1 = block_a(ctx, inp, 64, 256, 1, "block_layer_1",
                     shortcut_conv=True)
        b2 = block_a(ctx, b1, 64, 256, 1, "block_layer_2")
        return block_a(ctx, b2, 64, 256, 1, "block_layer_3")
    total += time_seg("blocks 1-3 (a, 256ch @192x96)",
                      in_scope(blocks_1_3), l["block_0_pool"], gflop=8.0)

    # --- blocks 4-7 (C=512 @96x48)
    def blocks_4_7(ctx, inp):
        b4 = block_a(ctx, inp, 128, 512, 2, "block_layer_4",
                     shortcut_conv=True)
        b5 = block_a(ctx, b4, 128, 512, 1, "block_layer_5")
        b6 = block_a(ctx, b5, 128, 512, 1, "block_layer_6")
        return block_b(ctx, b6, 128, 64, 512, 1, 2, "block_layer_7")
    total += time_seg("blocks 4-7 (512ch @96x48, one dil-2)",
                      in_scope(blocks_4_7), l["block_1"], gflop=10.3)

    # --- blocks 8-13 (C=1024 @48x24, dilations 2..16)
    def blocks_8_13(ctx, inp):
        b8 = block_a(ctx, inp, 256, 1024, 2, "block_layer_8",
                     shortcut_conv=True)
        b9 = block_a(ctx, b8, 256, 1024, 1, "block_layer_9")
        b10 = block_b(ctx, b9, 256, 256, 1024, 1, 2, "block_layer_10")
        b11 = block_b(ctx, b10, 256, 256, 1024, 1, 4, "block_layer_11")
        b12 = block_b(ctx, b11, 256, 256, 1024, 1, 8, "block_layer_12")
        return block_b(ctx, b12, 256, 256, 1024, 1, 16, "block_layer_13")
    total += time_seg("blocks 8-13 (1024ch @48x24, dil<=16)",
                      in_scope(blocks_8_13), l["block_7"], gflop=16.5)

    # --- blocks 14-16 (C=2048 @48x24, dilations 2..16)
    def blocks_14_16(ctx, inp):
        b14 = block_b(ctx, inp, 512, 512, 2048, 2, 4, "block_layer_14",
                      shortcut_conv=True)
        b15 = block_b(ctx, b14, 512, 512, 2048, 2, 8, "block_layer_15")
        return block_b(ctx, b15, 512, 512, 2048, 2, 16, "block_layer_16")
    total += time_seg("blocks 14-16 (2048ch @48x24, dil<=16)",
                      in_scope(blocks_14_16), l["block_13"], gflop=34.2)

    # isolated dilated convs: same shape, dilation 1 vs 16
    def dil_conv(dil):
        def fn(ctx, inp):
            p = {"activation": jax.nn.relu, "batch_normalization": True,
                 "use_bias": False}
            with ctx.scope("block_layer_13"):
                return ll.conv2d(ctx, inp, 128, 3, "stage_2_2",
                                 dilation_rate=dil, **p)
        return fn
    stage1_13 = jnp.zeros((1, 48, 24, 256), jnp.float32)
    for d in (1, 2, 16):
        time_seg(f"  3x3 256->128 @48x24 dil={d}", in_scope(dil_conv(d)),
                 stage1_13, gflop=0.68)

    # --- head: 1x1 2048->2048, trainable 4x4/s2 deconv, 16x16/s8 deconv
    def head(ctx, inp):
        p = {"activation": jax.nn.relu, "batch_normalization": True}
        d1 = ll.conv2d(ctx, inp, 2048, 1, "first_deconvolution_conv", **p)
        up1 = ll.deconv2d(ctx, d1, NUM_UNITS, 4,
                          "first_deconvolution_upconv", strides=2,
                          activation=None, batch_normalization=True,
                          trainable=True)
        sc = ll.conv2d(ctx, l["block_7"], NUM_UNITS, 1, "shortcut",
                       activation=None, batch_normalization=True)
        return ll.deconv2d(ctx, up1 + sc, NUM_CLASSES, 16,
                           "second_deconvolution_upconv", strides=8,
                           activation=None, batch_normalization=True,
                           trainable=True)
    total += time_seg("head (1x1 2048 + deconv x2 + deconv x8)",
                      in_scope(head), l["block_16"],
                      gflop=9.7 + 4.8 + 0.3 + 4.2)

    def deconv8(ctx, inp):
        return ll.deconv2d(ctx, inp, NUM_CLASSES, 16,
                           "second_deconvolution_upconv", strides=8,
                           activation=None, batch_normalization=True,
                           trainable=True)
    time_seg("  16x16/s8 deconv 64->14 alone", in_scope(deconv8),
             l["merge"], gflop=4.2)

    def deconv2(ctx, inp):
        return ll.deconv2d(ctx, inp, NUM_UNITS, 4,
                           "first_deconvolution_upconv", strides=2,
                           activation=None, batch_normalization=True,
                           trainable=True)
    d1 = jnp.zeros((1, 48, 24, 2048), jnp.float32)
    time_seg("  4x4/s2 deconv 2048->64 alone", in_scope(deconv2), d1,
             gflop=4.8)

    # --- full forward for comparison
    def full(variables, inp):
        ctx = Ctx(variables, train=False, compute_dtype=DTYPE)
        out = adapnet(ctx, inp, "rgb", NUM_UNITS, NUM_CLASSES)
        return out["score"]
    spf = device_time_fn(jax.jit(full), variables, x, iters=8,
                        repetitions=3)
    print(f"{'FULL forward':<42} {spf * 1e3:>8.3f}")
    print(f"{'sum of segments':<42} {total * 1e3:>8.3f}")


if __name__ == "__main__":
    main()
