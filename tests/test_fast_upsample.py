"""The phase-decomposed diagonal upsample must be exactly equivalent to the
dense transposed conv for diagonal kernels (the frozen bilinear deconvs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops.fast_upsample import (
    dense_phase_upsample, diagonal_upsample, strided_conv_packed)
from modular_semantic_segmentation_tpu.ops.init import bilinear_filter
from modular_semantic_segmentation_tpu.ops.variables import Ctx
from modular_semantic_segmentation_tpu.ops import layers


@pytest.mark.parametrize("k,s,size,c", [
    (16, 8, (6, 5), 4), (4, 2, (7, 9), 3), (8, 4, (5, 5), 2),
    (16, 8, (12, 6), 64),
])
def test_matches_dense_conv_transpose_bilinear(k, s, size, c):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, *size, c).astype(np.float32))
    dense = bilinear_filter((k, k, c, c))
    want = jax.lax.conv_transpose(
        x, jnp.asarray(dense), (s, s), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    diag = dense[:, :, np.arange(c), np.arange(c)]
    got = diagonal_upsample(x, jnp.asarray(diag), s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_matches_for_asymmetric_diagonal_kernel():
    """Not just bilinear: any channel-diagonal kernel must match (guards
    the correlation/flip convention)."""
    rng = np.random.RandomState(1)
    k, s, c = 4, 2, 3
    diag = rng.randn(k, k, c).astype(np.float32)
    dense = np.zeros((k, k, c, c), np.float32)
    for i in range(c):
        dense[:, :, i, i] = diag[:, :, i]
    x = jnp.asarray(rng.randn(1, 6, 7, c).astype(np.float32))
    want = jax.lax.conv_transpose(
        x, jnp.asarray(dense), (s, s), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    got = diagonal_upsample(x, jnp.asarray(diag), s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,s,size,cin,cout", [
    (16, 8, (6, 5), 4, 3), (4, 2, (7, 9), 5, 2), (8, 4, (5, 5), 2, 6),
    (6, 2, (4, 6), 3, 3),  # k = 3s: 3-tap phases, wider offset window
])
def test_dense_phase_upsample_matches_conv_transpose(k, s, size, cin, cout):
    """The dense-kernel phase decomposition (AdapNet's TRAINABLE deconvs)
    equals lax.conv_transpose for arbitrary dense kernels, cin != cout."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, *size, cin).astype(np.float32))
    kernel = rng.randn(k, k, cout, cin).astype(np.float32)
    want = jax.lax.conv_transpose(
        x, jnp.asarray(kernel), (s, s), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    got = dense_phase_upsample(x, jnp.asarray(kernel), s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_dense_phase_upsample_gradients_match():
    """The trainable-deconv path must differentiate: kernel gradients of
    the phase-decomposed form equal the conv_transpose gradients."""
    rng = np.random.RandomState(4)
    k, s, cin, cout = 4, 2, 3, 2
    x = jnp.asarray(rng.randn(1, 5, 6, cin).astype(np.float32))
    kernel = jnp.asarray(rng.randn(k, k, cout, cin).astype(np.float32))

    def loss_fast(kern):
        return jnp.sum(dense_phase_upsample(x, kern, s) ** 2)

    def loss_ref(kern):
        out = jax.lax.conv_transpose(
            x, kern, (s, s), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        return jnp.sum(out ** 2)

    g_fast = jax.grad(loss_fast)(kernel)
    g_ref = jax.grad(loss_ref)(kernel)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_deconv2d_trainable_dense_path_matches_conv_transpose():
    """deconv2d with a trainable non-diagonal kernel (AdapNet's
    upconvolutions) routes through dense_phase_upsample, unchanged."""
    rng = np.random.RandomState(5)
    cin, cout = 5, 3
    x = jnp.asarray(rng.randn(1, 6, 4, cin).astype(np.float32))
    kernel = rng.randn(4, 4, cout, cin).astype(np.float32)
    variables = {"d/kernel": jnp.asarray(kernel)}

    got = jax.jit(lambda v, x: layers.deconv2d(
        Ctx(v), x, cout, 4, "d", strides=2, batch_normalization=False,
        trainable=True))(variables, x)
    want = jax.lax.conv_transpose(
        x, jnp.asarray(kernel), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,s,size,cin,cout", [
    (7, 2, (8, 12), 5, 4),   # AdapNet stem shape class (odd k, asym pads)
    (4, 2, (6, 6), 3, 2),    # k % s == 0
    (3, 2, (10, 8), 4, 3),   # k > s, k < 2s
    (5, 5, (10, 5), 2, 2),   # k == s: pure space-to-depth
    (9, 3, (9, 12), 3, 5),
])
def test_strided_conv_packed_matches_direct(k, s, size, cin, cout):
    """The space-to-depth packed strided conv (the training-path
    formulation in conv2d) equals the direct SAME strided conv."""
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, *size, cin).astype(np.float32))
    kernel = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, kernel, (s, s), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = strided_conv_packed(x, kernel, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_strided_conv_packed_gradients_match():
    """Input and kernel gradients of the packed form equal the direct
    conv's gradients (the whole point: the direct VJPs are slow on TPU,
    the packed ones must be *equal*, just faster)."""
    rng = np.random.RandomState(7)
    k, s, cin, cout = 7, 2, 4, 3
    x = jnp.asarray(rng.randn(1, 8, 10, cin).astype(np.float32))
    kernel = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32))

    def loss_packed(x, kernel):
        return jnp.sum(strided_conv_packed(x, kernel, s) ** 2)

    def loss_direct(x, kernel):
        out = jax.lax.conv_general_dilated(
            x, kernel, (s, s), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(out ** 2)

    gx1, gk1 = jax.grad(loss_packed, argnums=(0, 1))(x, kernel)
    gx2, gk2 = jax.grad(loss_direct, argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               rtol=1e-4, atol=1e-3)


def test_conv2d_train_path_matches_eval_path():
    """conv2d routes strided convs through strided_conv_packed only in
    train mode; both modes produce the same output."""
    from modular_semantic_segmentation_tpu.ops.variables import Ctx

    rng = np.random.RandomState(8)
    cin, cout = 32, 16
    x = jnp.asarray(rng.randn(1, 8, 8, cin).astype(np.float32))
    kernel = rng.randn(7, 7, cin, cout).astype(np.float32)
    variables = {"c/kernel": jnp.asarray(kernel),
                 "c/bias": jnp.zeros((cout,), jnp.float32)}

    def run(train):
        return jax.jit(lambda v, x: layers.conv2d(
            Ctx(v, train=train, rng=jax.random.PRNGKey(0)), x, cout, 7,
            "c", strides=2, activation=None,
            batch_normalization=False))(variables, x)

    # tolerance is f32 summation-order noise between the two formulations
    np.testing.assert_allclose(np.asarray(run(True)),
                               np.asarray(run(False)),
                               rtol=1e-4, atol=1e-4)


def test_deconv2d_uses_fast_path_and_stays_exact():
    """deconv2d output is unchanged by the fast path (frozen square
    deconv), and works under jit."""
    rng = np.random.RandomState(2)
    c = 8
    x = jnp.asarray(rng.randn(1, 6, 6, c).astype(np.float32))
    kernel = bilinear_filter((4, 4, c, c))
    variables = {"d/kernel": jnp.asarray(kernel)}

    fast = jax.jit(lambda v, x: layers.deconv2d(
        Ctx(v), x, c, 4, "d", strides=2, batch_normalization=False,
        trainable=False))(variables, x)
    dense = jax.lax.conv_transpose(
        x, jnp.asarray(kernel), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)

