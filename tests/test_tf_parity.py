"""Lock our layer semantics to TF1 behavior using TF (CPU) as the oracle.

The reference is TF1 graph code; mIoU parity hinges on SAME padding, BN
defaults (momentum 0.99, eps 1e-3) and the frozen bilinear deconv behaving
identically (SURVEY.md §7 'hard parts'). These tests compare against
tf.nn eager ops with identical weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops.variables import Ctx
from modular_semantic_segmentation_tpu.ops import layers
from modular_semantic_segmentation_tpu.ops.init import bilinear_filter

tf = pytest.importorskip("tensorflow")


def _conv_ours(x, kernel, bias=None, strides=1, dilation=1):
    variables = {"c/kernel": jnp.asarray(kernel)}
    if bias is not None:
        variables["c/bias"] = jnp.asarray(bias)
    ctx = Ctx(variables)
    return np.asarray(layers.conv2d(
        ctx, jnp.asarray(x), kernel.shape[-1], kernel.shape[:2], "c",
        strides=strides, dilation_rate=dilation, activation=None,
        use_bias=bias is not None))


@pytest.mark.parametrize("strides,dilation,size", [
    (1, 1, (5, 8)), (2, 1, (6, 8)), (2, 1, (7, 9)), (1, 2, (9, 9)),
    (1, 16, (48, 48)),
])
def test_conv2d_same_padding_matches_tf(strides, dilation, size):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *size, 3).astype(np.float32)
    k = rng.randn(3, 3, 3, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    ours = _conv_ours(x, k, b, strides=strides, dilation=dilation)
    theirs = tf.nn.conv2d(x, k, strides=strides, padding="SAME",
                          dilations=dilation).numpy() + b
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ksize,stride,size,cin,cout", [
    ((4, 4), 2, (6, 8), 3, 3), ((16, 16), 8, (4, 6), 3, 3),
    ((4, 4), 2, (7, 5), 3, 3), ((4, 4), 2, (5, 6), 8, 3),
])
def test_deconv2d_bilinear_matches_tf(ksize, stride, size, cin, cout):
    rng = np.random.RandomState(1)
    x = rng.randn(2, *size, cin).astype(np.float32)
    # use a random kernel for the asymmetric case to catch layout bugs
    kernel = (bilinear_filter((*ksize, cout, cin)) if cin == cout
              else rng.randn(*ksize, cout, cin).astype(np.float32))
    ctx = Ctx({"d/kernel": jnp.asarray(kernel)})
    ours = np.asarray(layers.deconv2d(
        ctx, jnp.asarray(x), cout, ksize, "d", strides=stride,
        batch_normalization=False))
    out_shape = (2, size[0] * stride, size[1] * stride, cout)
    theirs = tf.nn.conv2d_transpose(
        x, kernel, output_shape=out_shape,
        strides=[1, stride, stride, 1], padding="SAME").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_batch_norm_eval_matches_tf():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 5, 4).astype(np.float32)
    gamma = rng.rand(4).astype(np.float32) + 0.5
    beta = rng.randn(4).astype(np.float32)
    mean = rng.randn(4).astype(np.float32)
    var = rng.rand(4).astype(np.float32) + 0.1
    ctx = Ctx({"bn/gamma": gamma, "bn/beta": beta, "bn/moving_mean": mean,
               "bn/moving_variance": var}, train=False)
    ours = np.asarray(layers.batch_norm(ctx, jnp.asarray(x), "bn"))
    theirs = tf.nn.batch_normalization(x, mean, var, beta, gamma,
                                       layers.BN_EPSILON).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_batch_norm_train_uses_batch_stats_and_updates_moving():
    rng = np.random.RandomState(3)
    x = rng.randn(8, 4, 4, 2).astype(np.float32) * 3 + 1
    gamma = np.ones(2, np.float32)
    beta = np.zeros(2, np.float32)
    ctx = Ctx({"bn/gamma": gamma, "bn/beta": beta,
               "bn/moving_mean": np.zeros(2, np.float32),
               "bn/moving_variance": np.ones(2, np.float32)}, train=True)
    out = np.asarray(layers.batch_norm(ctx, jnp.asarray(x), "bn"))
    batch_mean = x.mean((0, 1, 2))
    batch_var = x.var((0, 1, 2))
    expect = (x - batch_mean) / np.sqrt(batch_var + layers.BN_EPSILON)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ctx.updates["bn/moving_mean"]),
        0.99 * 0 + 0.01 * batch_mean, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ctx.updates["bn/moving_variance"]),
        0.99 * 1 + 0.01 * batch_var, rtol=1e-4)


def test_max_pool_matches_tf():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 10, 3).astype(np.float32)
    ours = np.asarray(layers.max_pool2d(Ctx({}), jnp.asarray(x), 2, 2))
    theirs = tf.nn.max_pool2d(x, 2, 2, "VALID").numpy()
    np.testing.assert_allclose(ours, theirs)
