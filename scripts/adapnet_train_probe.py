"""Where does AdapNet's 12.1 ms train step go? Forward vs backward per segment.

The forward is 1.89 ms but the full train step measures 12.1 ms — a
6.4x ratio where SimpleFCN shows 3.5x. The usual suspect on TPU is the
input-gradient of strided convs: jax lowers it as an lhs-dilated conv,
the exact pathology that cost the trainable deconvs 25x
(ops/fast_upsample.py). This probe times value_and_grad of each
architecture segment in isolation (sum-of-squares loss on the segment
output, gradients w.r.t. both the variables and the segment input).

Run: python scripts/adapnet_train_probe.py
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


def main():
    variables = init_variables()
    x, l = capture_intermediates(variables)
    rng = jax.random.PRNGKey(1)
    print(f"{'segment':<42} {'fwd ms':>8} {'f+b ms':>8} {'ratio':>6}")

    def in_scope(builder):
        def fn(variables, inp):
            ctx = Ctx(variables, train=True, rng=rng, compute_dtype=DTYPE)
            with ctx.scope("rgb"):
                return builder(ctx, inp)
        return fn

    def time_seg(name, builder, inp):
        fn = in_scope(builder)
        fwd_t = device_time_fn(jax.jit(fn), variables, inp, iters=8,
                               repetitions=3)

        def loss(variables, inp):
            return jnp.sum(fn(variables, inp).astype(jnp.float32) ** 2)

        grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
        fb_t = device_time_fn(grad_fn, variables, inp, iters=8,
                              repetitions=3)
        print(f"{name:<42} {fwd_t * 1e3:>8.3f} {fb_t * 1e3:>8.3f} "
              f"{fb_t / fwd_t:>6.1f}")
        return fb_t

    def stem(ctx, inp):
        p = {"activation": jax.nn.relu, "batch_normalization": True}
        a = ll.conv2d(ctx, inp, 64, 3, "block_0_1", **p)
        b = ll.conv2d(ctx, a, 64, 7, "block_0_2", strides=2, **p)
        return ll.max_pool2d(ctx, b, 2, 2)

    def only_7x7(ctx, inp):
        p = {"activation": jax.nn.relu, "batch_normalization": True}
        return ll.conv2d(ctx, inp, 64, 7, "block_0_2", strides=2, **p)

    def blocks_1_3(ctx, inp):
        b1 = block_a(ctx, inp, 64, 256, 1, "block_layer_1",
                     shortcut_conv=True)
        b2 = block_a(ctx, b1, 64, 256, 1, "block_layer_2")
        return block_a(ctx, b2, 64, 256, 1, "block_layer_3")

    def blocks_4_7(ctx, inp):
        b4 = block_a(ctx, inp, 128, 512, 2, "block_layer_4",
                     shortcut_conv=True)
        b5 = block_a(ctx, b4, 128, 512, 1, "block_layer_5")
        b6 = block_a(ctx, b5, 128, 512, 1, "block_layer_6")
        return block_b(ctx, b6, 128, 64, 512, 1, 2, "block_layer_7")

    def blocks_8_16(ctx, inp):
        b8 = block_a(ctx, inp, 256, 1024, 2, "block_layer_8",
                     shortcut_conv=True)
        b9 = block_a(ctx, b8, 256, 1024, 1, "block_layer_9")
        b10 = block_b(ctx, b9, 256, 256, 1024, 1, 2, "block_layer_10")
        b11 = block_b(ctx, b10, 256, 256, 1024, 1, 4, "block_layer_11")
        b12 = block_b(ctx, b11, 256, 256, 1024, 1, 8, "block_layer_12")
        b13 = block_b(ctx, b12, 256, 256, 1024, 1, 16, "block_layer_13")
        b14 = block_b(ctx, b13, 512, 512, 2048, 2, 4, "block_layer_14",
                      shortcut_conv=True)
        b15 = block_b(ctx, b14, 512, 512, 2048, 2, 8, "block_layer_15")
        return block_b(ctx, b15, 512, 512, 2048, 2, 16, "block_layer_16")

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

    total = 0.0
    total += time_seg("stem (3x3 + 7x7/s2 + pool)", stem, x)
    time_seg("  7x7/s2 64->64 alone", only_7x7, l["block_0_1"])
    total += time_seg("blocks 1-3 (256ch @192x96)", blocks_1_3,
                      l["block_0_pool"])
    total += time_seg("blocks 4-7 (512ch @96x48)", blocks_4_7, l["block_1"])
    total += time_seg("blocks 8-16 (1024/2048ch @48x24)", blocks_8_16,
                      l["block_7"])
    total += time_seg("head (1x1 2048 + deconv x2 + x8)", head,
                      l["block_16"])
    print(f"{'sum of f+b segments':<42} {'':>8} {total * 1e3:>8.3f}")


if __name__ == "__main__":
    main()
