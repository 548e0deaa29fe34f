"""Probe: int8 quantization of the cross-expert PACKED stem.

After block-diagonal packing (models/packed_experts.py) the fused
experts' conv1_2 and conv2_1 run at 128 input channels — exactly the
width where the int8 conv-chain probe measured 1.38x
(scripts/int8_chain_probe.py) but which the per-expert int8 eligibility
rule (>=128 input channels) excluded at their unpacked 64-ch width. The
bf16 packed stem is ~1.66 ms of the 3.99 ms int8 serving floor (42%):
quantizing it is the largest remaining serving lever.

This probe measures the packed stem with conv1_2 + conv2_1 running the
int8 recipe (symmetric per-tensor activation scale, per-output-channel
weight scales, requant fused into the epilogues; conv1_1's thin 54-row
im2col matmul stays bf16 — it is bandwidth-bound, int8 operands would
halve its traffic but the quantize op costs more at 3/1 channels) and
compares device time + numerics against the all-bf16 packed stem.

Run on the TPU:  python scripts/int8_stem_probe.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import modular_semantic_segmentation_tpu  # noqa: F401  platform setup
import jax
import jax.numpy as jnp
import numpy as np

from modular_semantic_segmentation_tpu.utils.profiling import device_time_fn
from scripts.expert_pack_probe import (H, W, _block_diag, _im2col9, _pool,
                                       _relu_bias, make_params)


def _conv_int8(x, k, ascale_in, ascale_out):
    """int8 conv for a BLOCK-DIAGONAL kernel with PER-EXPERT input scales.

    A shared per-tensor activation scale across the packed experts fails
    hard: rgb activations (0..255-scaled inputs) dwarf depth's, so the
    depth half quantizes to ~zero (measured 0.99 rel err). Per-input-
    channel scales normally don't commute through a dense conv, but a
    block-diagonal kernel routes input block e only to output block e —
    so quantizing each expert's channels with its own scale and
    dequantizing per OUTPUT channel with (input-block scale x weight
    scale) is exact int8 arithmetic at per-expert granularity.

    ``ascale_in``: [Cin] per-channel (per-expert constant within each
    block); ``ascale_out``: [Cout] the input-block scale replicated onto
    each output block."""
    kscale = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-12) / 127.0
    kq = jnp.clip(jnp.round(k / kscale), -127, 127).astype(jnp.int8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale_in),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, kq, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (ascale_out * kscale)


def packed_stem(xr, xd, p, dtype, int8=False, ascales=None):
    """Packed conv1_1(bf16 im2col) -> conv1_2 -> pool -> conv2_1."""
    pr, pd = _im2col9(xr, dtype), _im2col9(xd, dtype)
    patches = jnp.concatenate([pr, pd], axis=-1)
    cr, cd = xr.shape[-1], xd.shape[-1]
    k11 = jnp.zeros((9 * (cr + cd), 128), jnp.float32)
    k11 = k11.at[:9 * cr, :64].set(p["rgb/k11"].reshape(9 * cr, 64))
    k11 = k11.at[9 * cr:, 64:].set(p["depth/k11"].reshape(9 * cd, 64))
    b11 = jnp.concatenate([p["rgb/b11"], p["depth/b11"]]).astype(dtype)
    c11 = _relu_bias(jnp.einsum("nhwp,pf->nhwf", patches,
                                k11.astype(dtype),
                                preferred_element_type=dtype), b11)
    k12 = _block_diag(p["rgb/k12"], p["depth/k12"])
    b12 = jnp.concatenate([p["rgb/b12"], p["depth/b12"]]).astype(jnp.float32)
    k21 = _block_diag(p["rgb/k21"], p["depth/k21"])
    b21 = jnp.concatenate([p["rgb/b21"], p["depth/b21"]]).astype(jnp.float32)
    if int8:
        # per-expert scales broadcast onto the packed channel layout
        def vec(scales, widths):
            return jnp.concatenate([jnp.full((w,), s, jnp.float32)
                                    for s, w in zip(scales, widths)])
        a12_in = vec(ascales["c12"], (64, 64))
        a12_out = vec(ascales["c12"], (64, 64))
        a21_in = vec(ascales["c21"], (64, 64))
        a21_out = vec(ascales["c21"], (128, 128))
        c12 = jax.nn.relu(_conv_int8(c11, k12, a12_in, a12_out) + b12
                          ).astype(dtype)
        pl1 = _pool(c12)
        c21 = jax.nn.relu(_conv_int8(pl1, k21, a21_in, a21_out) + b21
                          ).astype(dtype)
    else:
        c12 = _relu_bias(jax.lax.conv_general_dilated(
            c11, k12.astype(dtype), window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype), b12.astype(dtype))
        pl1 = _pool(c12)
        c21 = _relu_bias(jax.lax.conv_general_dilated(
            pl1, k21.astype(dtype), window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype), b21.astype(dtype))
    return c21[..., :128], c21[..., 128:]


def main():
    rng = np.random.RandomState(0)
    xr = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
    xd = jnp.asarray(rng.rand(1, H, W, 1).astype(np.float32))
    p = {k: jnp.asarray(v) for k, v in make_params(rng).items()}

    # calibration: activation maxima of the bf16 reference run
    bf16 = jax.jit(functools.partial(packed_stem, dtype=jnp.bfloat16))
    ref = bf16(xr, xd, p)

    # per-tensor amax of conv1_2/conv2_1 inputs, measured like
    # quantize_for_serving does (max |input| on the measure batch)
    def amax_fn(xr, xd, p):
        pr, pd = _im2col9(xr, jnp.float32), _im2col9(xd, jnp.float32)
        patches = jnp.concatenate([pr, pd], axis=-1)
        cr, cd = xr.shape[-1], xd.shape[-1]
        k11 = jnp.zeros((9 * (cr + cd), 128), jnp.float32)
        k11 = k11.at[:9 * cr, :64].set(p["rgb/k11"].reshape(9 * cr, 64))
        k11 = k11.at[9 * cr:, 64:].set(p["depth/k11"].reshape(9 * cd, 64))
        b11 = jnp.concatenate([p["rgb/b11"], p["depth/b11"]])
        c11 = _relu_bias(jnp.einsum("nhwp,pf->nhwf", patches, k11), b11)
        k12 = _block_diag(p["rgb/k12"], p["depth/k12"])
        b12 = jnp.concatenate([p["rgb/b12"], p["depth/b12"]])
        c12 = _relu_bias(jax.lax.conv_general_dilated(
            c11, k12, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), b12)
        pl1 = _pool(c12)
        return (jnp.max(jnp.abs(c11[..., :64])) / 127.0,
                jnp.max(jnp.abs(c11[..., 64:])) / 127.0,
                jnp.max(jnp.abs(pl1[..., :64])) / 127.0,
                jnp.max(jnp.abs(pl1[..., 64:])) / 127.0)
    a12r, a12d, a21r, a21d = jax.jit(amax_fn)(xr, xd, p)
    ascales = {"c12": (jnp.float32(a12r), jnp.float32(a12d)),
               "c21": (jnp.float32(a21r), jnp.float32(a21d))}

    q = jax.jit(functools.partial(packed_stem, dtype=jnp.bfloat16,
                                  int8=True))
    out = q(xr, xd, p, ascales=ascales)
    for i, name in enumerate(("rgb", "depth")):
        a = np.asarray(ref[i], np.float32)
        b = np.asarray(out[i], np.float32)
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-9)
        print(f"{name}: int8-vs-bf16 stem rel max err = {rel:.3f}")

    t_bf16 = device_time_fn(bf16, xr, xd, p, iters=30)
    t_int8 = device_time_fn(lambda xr, xd, p, s: q(xr, xd, p, ascales=s),
                            xr, xd, p, ascales, iters=30)
    print(f"packed stem bf16 {t_bf16 * 1e3:.3f} ms, int8 "
          f"{t_int8 * 1e3:.3f} ms, speedup {t_bf16 / t_int8:.2f}x")


if __name__ == "__main__":
    main()
