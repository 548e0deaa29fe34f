"""Probe 2: int8 CONV CHAINS vs bf16 on the real TPU.

The isolated-conv probe (int8_probe.py) showed int8 winning only on deep
convs once the quantize/dequantize epilogue is charged. In a real network
the accounting is different:
  - the dequant multiply folds into the BN scale (both per-channel affine)
  - the next layer's quantize folds into the same epilogue as the ReLU
  - intermediate activations are STORED int8 -> half the HBM traffic of
    bf16 between layers
This probe times an N-conv chain with fused scale+ReLU+requant epilogues
(int8 residency) against the bf16 chain with BN-style scale+ReLU
epilogues, at SimpleFCN shapes and batch {1, 8}.

Run on the TPU: python scripts/int8_chain_probe.py
"""

import os
import sys
import jax
import jax.numpy as jnp
import numpy as np

from modular_semantic_segmentation_tpu.utils.profiling import \
    device_time_fn  # loop-difference method (stable over the tunnel)


def conv_raw(x, k, accum):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum)


def bf16_chain(x, ks, scales):
    """bf16 residency: conv -> per-channel scale (BN-fold) + ReLU."""
    for k, s in zip(ks, scales):
        a = conv_raw(x, k, jnp.float32)
        x = jax.nn.relu(a * s).astype(jnp.bfloat16)
    return x


def int8_chain(xq, ks_q, scales):
    """int8 residency: conv(int8) -> int32 -> scale (dequant*BN fused)
    + ReLU -> requantize to int8 for the next conv."""
    for k, s in zip(ks_q, scales):
        a = conv_raw(xq, k, jnp.int32)
        y = jax.nn.relu(a.astype(jnp.float32) * s)
        xq = jnp.clip(jnp.round(y * 127.0), -127, 127).astype(jnp.int8)
    return xq


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.RandomState(0)
    cases = [
        # (batch, H, W, C, n_convs) — SimpleFCN conv blocks
        (1, 768, 384, 64, 2),
        (1, 384, 192, 128, 2),
        (1, 192, 96, 256, 3),
        (1, 96, 48, 512, 3),
        (8, 768, 384, 64, 2),
        (8, 96, 48, 512, 3),
    ]
    for b, h, w, c, n in cases:
        flops = n * 2 * b * h * w * c * c * 9
        x = (rng.rand(b, h, w, c).astype(np.float32)).clip(0, 1)
        ks = [rng.rand(3, 3, c, c).astype(np.float32) * 0.05 - 0.025
              for _ in range(n)]
        scales = [jax.device_put(jnp.asarray(
            rng.rand(c).astype(np.float32) * 0.01 + 0.005)) for _ in range(n)]

        xb = jax.device_put(jnp.asarray(x, jnp.bfloat16))
        kbs = [jax.device_put(jnp.asarray(k, jnp.bfloat16)) for k in ks]
        t_bf = device_time_fn(bf16_chain, xb, kbs, scales)

        xq = jax.device_put(jnp.asarray(
            np.clip(np.round(x * 127), -127, 127), jnp.int8))
        kqs = [jax.device_put(jnp.asarray(
            np.clip(np.round(k / np.abs(k).max() * 127), -127, 127),
            jnp.int8)) for k in ks]
        t_i8 = device_time_fn(int8_chain, xq, kqs, scales)

        print(f"b{b} {h}x{w} c{c} x{n}: "
              f"bf16 {t_bf * 1e3:7.3f} ms {flops / t_bf / 1e12:6.1f} TF/s | "
              f"int8 {t_i8 * 1e3:7.3f} ms {flops / t_i8 / 1e12:6.1f} TF/s | "
              f"speedup {t_bf / t_i8:5.2f}x")


if __name__ == "__main__":
    main()
