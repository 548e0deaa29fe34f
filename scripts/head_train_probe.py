"""Probe: SimpleFCN head cost in train mode (scripts/fcn_train_probe.py
found 1.68 ms forward / 3.9 ms f+b against a 0.16 ms eval decoder).

Times each head component at its real shape, forward and
forward+backward, to locate the cost: the 1x1 score convs, the frozen
4x4/s2 and 16x16/s8 diagonal upsamples, and train-mode batch norm at
full 768x384 resolution (f32 statistics over 295k pixels).

Run: python scripts/head_train_probe.py
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

from modular_semantic_segmentation_tpu.ops import layers as ll  # noqa: E402
from modular_semantic_segmentation_tpu.ops.variables import Ctx  # noqa: E402
from modular_semantic_segmentation_tpu.utils.profiling import (  # noqa: E402
    device_time_fn)

DTYPE = jnp.bfloat16
NUM_UNITS, NUM_CLASSES = 64, 14


def time_piece(name, builder, *inputs):
    rng = jax.random.PRNGKey(0)
    ctx = Ctx(train=True, rng=rng, init=True, compute_dtype=DTYPE)
    builder(ctx, *inputs)
    variables = {k: jax.device_put(v) for k, v in ctx.created.items()}

    def fn(variables, *inputs):
        c = Ctx(variables, train=True, rng=rng, compute_dtype=DTYPE)
        return builder(c, *inputs)

    fwd_t = device_time_fn(jax.jit(fn), variables, *inputs, iters=8,
                           repetitions=3)

    def loss(variables, *inputs):
        return jnp.sum(fn(variables, *inputs).astype(jnp.float32) ** 2)

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    fb_t = device_time_fn(grad_fn, variables, *inputs, iters=8,
                          repetitions=3)
    print(f"{name:<46} {fwd_t * 1e3:>8.3f} {fb_t * 1e3:>8.3f} "
          f"{fb_t / fwd_t:>6.1f}")


def main():
    rng = np.random.RandomState(0)
    conv4_3 = jnp.asarray(rng.rand(1, 96, 48, 512), DTYPE)
    conv5_3 = jnp.asarray(rng.rand(1, 48, 24, 512), DTYPE)
    fused = jnp.asarray(rng.rand(1, 96, 48, NUM_UNITS), DTYPE)
    full = jnp.asarray(rng.rand(1, 768, 384, NUM_UNITS), DTYPE)

    print(f"{'piece':<46} {'fwd ms':>8} {'f+b ms':>8} {'ratio':>6}")
    P = {"trainable": True, "batch_normalization": True,
         "activation": jax.nn.relu}

    time_piece("score_conv4 1x1 512->64 @96x48 (+BN)",
               lambda c, x: ll.conv2d(c, x, NUM_UNITS, 1, "sc4", **P),
               conv4_3)
    time_piece("score_conv5 + frozen 4x4/s2 deconv (+BN)",
               lambda c, x: ll.deconv2d(
                   c, ll.conv2d(c, x, NUM_UNITS, 1, "sc5", **P),
                   NUM_UNITS, 4, "up5", strides=2,
                   activation=jax.nn.relu, batch_normalization=True,
                   trainable=False), conv5_3)
    time_piece("frozen 16x16/s8 deconv 64ch ->768x384 (+BN)",
               lambda c, x: ll.deconv2d(
                   c, x, NUM_UNITS, 16, "up", strides=8,
                   activation=jax.nn.relu, batch_normalization=True,
                   trainable=False), fused)
    time_piece("  same, no BN/act",
               lambda c, x: ll.deconv2d(
                   c, x, NUM_UNITS, 16, "up", strides=8, activation=None,
                   batch_normalization=False, trainable=False), fused)
    time_piece("train-mode BN alone @768x384x64",
               lambda c, x: ll.batch_norm(c, x, "bn"), full)
    time_piece("score 1x1 64->14 @768x384 (+BN)",
               lambda c, x: ll.conv2d(c, x, NUM_CLASSES, 1, "score",
                                      activation=None,
                                      batch_normalization=True), full)


if __name__ == "__main__":
    main()
