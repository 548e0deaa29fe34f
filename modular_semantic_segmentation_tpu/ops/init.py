"""Initializers.

Match the reference's initialization behavior (xview/models/custom_layers.py):
glorot-uniform conv kernels (TF layers default), zero biases, the frozen
bilinear-interpolation kernel for transposed convolutions
(custom_layers.py:8-25), the random-pick ``Selection`` initializer
(custom_layers.py:28-68) and the progressive-net ``half_zeros`` initializer
(custom_layers.py:162-195).

An initializer is ``fn(ctx, shape) -> array``; ``ctx`` supplies rng.
"""

import jax
import jax.numpy as jnp
import numpy as np


def zeros(ctx, shape):
    return np.zeros(shape, np.float32)


def ones(ctx, shape):
    return np.ones(shape, np.float32)


def glorot_uniform(ctx, shape):
    """TF glorot/xavier uniform: limit = sqrt(6 / (fan_in + fan_out)).

    For conv kernels [H, W, in, out]: fan_in = H*W*in, fan_out = H*W*out.
    """
    if len(shape) >= 2:
        receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
        fan_in = receptive * shape[-2]
        fan_out = receptive * shape[-1]
    else:
        fan_in = fan_out = int(np.prod(shape))
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(ctx.next_rng(), shape, jnp.float32, -limit, limit)


def bilinear_filter(shape):
    """Frozen bilinear-interpolation kernel for transposed convolution.

    ``shape`` is [height, width, out_channels, in_channels] (TF
    conv2d_transpose layout — the npz export contract). The kernel is
    diagonal over channels: channel i upsamples channel i.
    Mirrors reference custom_layers.py:8-25.
    """
    height, width = shape[0], shape[1]
    factor = np.ceil(width / 2.0)
    center = (2 * factor - 1 - factor % 2) / (2.0 * factor)
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    bilinear = ((1 - np.abs(yy / factor - center)) *
                (1 - np.abs(xx / factor - center)))
    weights = np.zeros(shape, np.float32)
    diag = min(shape[2], shape[3])
    for i in range(diag):
        weights[:, :, i, i] = bilinear
    return weights


def bilinear_filter_initializer(ctx, shape):
    return bilinear_filter(shape)


def selection(values):
    """Initialize to a random pick from ``values`` (scalars broadcast to the
    full requested shape). Reference custom_layers.py:28-68. Trace-safe."""
    def _init(ctx, shape):
        idx = jax.random.randint(ctx.next_rng(), (), 0, len(values))
        if isinstance(values[0], (int, float)):
            vals = jnp.asarray(values, jnp.float32)
            return jnp.full(shape, vals[idx])
        stacked = jnp.asarray(np.stack([np.asarray(v, np.float32)
                                        for v in values]))
        return stacked[idx]
    return _init


def half_zeros(only_dampened=True):
    """Progressive-net combination-kernel initializer.

    First half of the input-channel dim is zero (or 0.1 * xavier when
    ``only_dampened``), second half is identity at the kernel center when
    dim_in == 2 * dim_out, otherwise xavier. Reference
    custom_layers.py:162-195.
    """
    def _init(ctx, shape):
        kh, kw, dim_in, dim_out = shape
        assert dim_in % 2 == 0
        half = dim_in // 2

        def xavier():
            return glorot_uniform(ctx, (kh, kw, half, dim_out))

        first = (0.1 * xavier() if only_dampened
                 else jnp.zeros((kh, kw, half, dim_out), jnp.float32))
        if dim_in == 2 * dim_out:
            second = np.zeros((kh, kw, half, dim_out), np.float32)
            second[kh // 2, kw // 2, :, :] = np.eye(dim_out)
            second = jnp.asarray(second)
        else:
            second = xavier()
        return jnp.concatenate([jnp.asarray(first, jnp.float32), second],
                               axis=2)
    return _init
