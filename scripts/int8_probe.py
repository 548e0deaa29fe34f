"""Probe: int8 vs bf16 conv throughput on the real TPU at SimpleFCN shapes.

The docs/TIMING.md roofline puts the deep conv blocks at 140-286 TFLOP/s
bf16 — near the v5e's practical conv ceiling. The v5e MXU runs int8 at
~2x the bf16 rate (394 TOPS peak), so a post-training-quantized serving
path is the one remaining >20% lever. This script measures whether XLA
actually delivers int8 conv speedups at our shapes before we build it.

Run on the TPU: python scripts/int8_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

from modular_semantic_segmentation_tpu.utils.profiling import \
    device_time_fn  # loop-difference method (stable over the tunnel)


def conv(accum):
    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=accum)
    return f


def int8_conv(x, k, noise):
    # Perturb the int8 operands with a runtime-dependent (but numerically
    # zero) value so the loop body cannot be hoisted: device_time_fn only
    # perturbs floating inputs.
    xq = x + noise.astype(jnp.int8)
    return jax.lax.conv_general_dilated(
        xq, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.RandomState(0)
    shapes = [
        # (H, W, Cin, Cout) — SimpleFCN hot convs at num_units=64
        (768, 384, 64, 64),     # conv1_2
        (384, 192, 128, 128),   # conv2
        (192, 96, 256, 256),    # conv3
        (96, 48, 512, 512),     # conv4
        (48, 24, 512, 512),     # conv5
    ]
    for h, w, cin, cout in shapes:
        x = rng.rand(1, h, w, cin).astype(np.float32) * 2 - 1
        k = rng.rand(3, 3, cin, cout).astype(np.float32) * 0.1 - 0.05
        flops = 2 * h * w * cin * cout * 9

        xb = jax.device_put(jnp.asarray(x, jnp.bfloat16))
        kb = jax.device_put(jnp.asarray(k, jnp.bfloat16))
        t_bf16 = device_time_fn(conv(jnp.float32), xb, kb, iters=100)
        t_bf16o = device_time_fn(conv(jnp.bfloat16), xb, kb, iters=100)

        xi = jax.device_put(jnp.asarray(
            np.clip(np.round(x * 127), -127, 127), jnp.int8))
        ki = jax.device_put(jnp.asarray(
            np.clip(np.round(k * 2540), -127, 127), jnp.int8))
        noise = jax.device_put(jnp.zeros((), jnp.float32))
        try:
            t_int8 = device_time_fn(int8_conv, xi, ki, noise, iters=100)
        except Exception as e:  # noqa: BLE001 — probing compiler support
            t_int8 = None
            print(f"int8 conv failed at {h}x{w}x{cin}->{cout}: {e}",
                  file=sys.stderr)

        # int8 with the quantize/dequantize epilogue included (static
        # per-tensor activation scale as a calibrated PTQ path would use,
        # per-channel weight scale), bf16 result.
        kscale = jax.device_put(
            jnp.asarray(np.abs(k).max(axis=(0, 1, 2)) / 127, jnp.float32))
        ascale = jax.device_put(jnp.float32(1 / 127))
        xf = jax.device_put(jnp.asarray(x, jnp.float32))

        def qdq_conv(xf, ki, kscale, ascale):
            xq = jnp.clip(jnp.round(xf / ascale), -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xq, ki, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (ascale * kscale)
                    ).astype(jnp.bfloat16)

        try:
            t_qdq = device_time_fn(qdq_conv, xf, ki, kscale, ascale, iters=100)
        except Exception as e:  # noqa: BLE001
            t_qdq = None
            print(f"qdq conv failed: {e}", file=sys.stderr)

        def r(t):
            return (f"{t * 1e3:7.3f} ms {flops / t / 1e12:6.1f} TFLOP/s"
                    if t else "   failed")
        print(f"{h}x{w} {cin:3d}->{cout:3d}: bf16->f32 {r(t_bf16)} | "
              f"bf16->bf16 {r(t_bf16o)} | int8 {r(t_int8)} | "
              f"int8+qdq {r(t_qdq)}")


if __name__ == "__main__":
    main()
