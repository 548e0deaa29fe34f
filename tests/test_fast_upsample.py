"""The phase-decomposed diagonal upsample must be exactly equivalent to the
dense transposed conv for diagonal kernels (the frozen bilinear deconvs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops.fast_upsample import \
    diagonal_upsample
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
