"""Where does SimpleFCN's 14.0 ms train step go? Forward vs backward per segment.

Companion to scripts/adapnet_train_probe.py: the forward is 2.72 ms but
the full train step measures 14.0 ms (5.1x). All convs here are stride-1
(no strided-VJP pathology) and the pool-gradient custom_vjp experiment
REGRESSED (scripts/pool_grad_probe.py) — so this probe locates the
remaining backward cost per VGG stage with value_and_grad of each segment
in isolation (sum-of-squares loss, grads w.r.t. variables and input).

Run: python scripts/fcn_train_probe.py
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

from modular_semantic_segmentation_tpu.models.simple_fcn import (  # noqa: E402
    fcn)
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
    fcn(ctx, x, "rgb", NUM_UNITS, NUM_CLASSES)
    return {k: jax.device_put(v) for k, v in ctx.created.items()}


def capture_intermediates(variables):
    @jax.jit
    def fwd(variables, x):
        ctx = Ctx(variables, train=False, compute_dtype=DTYPE)
        return fcn(ctx, x, "rgb", NUM_UNITS, NUM_CLASSES)
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

    P = {"trainable": True, "batch_normalization": True,
         "activation": jax.nn.relu}

    def stage1(ctx, inp):
        a = ll.conv2d(ctx, inp, 64, 3, "conv1_1", **P)
        b = ll.conv2d(ctx, a, 64, 3, "conv1_2", **P)
        return ll.max_pool2d(ctx, b, 2, 2)

    def conv1_2_alone(ctx, inp):
        return ll.conv2d(ctx, inp, 64, 3, "conv1_2", **P)

    def stage2(ctx, inp):
        a = ll.conv2d(ctx, inp, 128, 3, "conv2_1", **P)
        b = ll.conv2d(ctx, a, 128, 3, "conv2_2", **P)
        return ll.max_pool2d(ctx, b, 2, 2)

    def stage3(ctx, inp):
        a = ll.conv2d(ctx, inp, 256, 3, "conv3_1", **P)
        b = ll.conv2d(ctx, a, 256, 3, "conv3_2", **P)
        c = ll.conv2d(ctx, b, 256, 3, "conv3_3", **P)
        return ll.max_pool2d(ctx, c, 2, 2)

    def stage4(ctx, inp):
        a = ll.conv2d(ctx, inp, 512, 3, "conv4_1", **P)
        b = ll.conv2d(ctx, a, 512, 3, "conv4_2", **P)
        c = ll.conv2d(ctx, b, 512, 3, "conv4_3", **P)
        return ll.max_pool2d(ctx, c, 2, 2)

    def stage5(ctx, inp):
        a = ll.conv2d(ctx, inp, 512, 3, "conv5_1", **P)
        b = ll.conv2d(ctx, a, 512, 3, "conv5_2", **P)
        return ll.conv2d(ctx, b, 512, 3, "conv5_3", **P)

    def head(ctx, inp):
        score_conv4 = ll.conv2d(ctx, l["conv4_3"], NUM_UNITS, 1,
                                "score_conv4", **P)
        score_conv5 = ll.conv2d(ctx, inp, NUM_UNITS, 1, "score_conv5", **P)
        up5 = ll.deconv2d(ctx, score_conv5, NUM_UNITS, 4, "upscore_conv5",
                          strides=2, activation=jax.nn.relu,
                          batch_normalization=True, trainable=False)
        fused = score_conv4 + up5
        up = ll.deconv2d(ctx, fused, NUM_UNITS, 16, "upscore", strides=8,
                         activation=jax.nn.relu, batch_normalization=True,
                         trainable=False)
        return ll.conv2d(ctx, up, NUM_CLASSES, 1, "score",
                         activation=None, batch_normalization=True)

    total = 0.0
    total += time_seg("stage1 (2x conv64 + pool @768x384)", stage1, x)
    time_seg("  conv1_2 64->64 alone", conv1_2_alone, l["conv1_1"])
    total += time_seg("stage2 (2x conv128 + pool @384x192)", stage2,
                      l["pool1"])
    total += time_seg("stage3 (3x conv256 + pool @192x96)", stage3,
                      l["pool2"])
    total += time_seg("stage4 (3x conv512 + pool @96x48)", stage4,
                      l["pool3"])
    total += time_seg("stage5 (3x conv512 @48x24)", stage5, l["pool4"])
    total += time_seg("head (scores + frozen deconvs)", head, l["conv5_3"])
    print(f"{'sum of f+b segments':<42} {'':>8} {total * 1e3:>8.3f}")


if __name__ == "__main__":
    main()
