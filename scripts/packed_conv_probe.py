"""Probe: W-pair-packed formulations of the 64-channel 3x3 conv.

conv1_2 (64->64 @768x384) runs at ~40 TFLOP/s bf16: C=64 fills half of
the 128-wide lanes and batch-1 spatial tiling does not recover it
(docs/TIMING.md roofline). Space-to-depth with a zero-blocked dense
kernel was measured and rejected (2x FLOP inflation cancels the gain).

This probe tests the DENSE pair-packing decomposition: pack two
neighbouring W pixels into the channel dim — in NHWC row-major that is a
FREE reshape [h, 384, 64] -> [h, 192, 128] — and express the conv as
per-tap matmuls with no zero blocks:

  y[2j]   = sum_kh ( x[2j-1] K-1 + x[2j] K0 + x[2j+1] K+1 )
  y[2j+1] = sum_kh ( x[2j]  K-1 + x[2j+1] K0 + x[2j+2] K+1 )

  packed col j = (x[2j] | x[2j+1]):
    dj= 0 tap: dense 128->128 block matrix [[K0, K-1], [K+1, K0]]
    dj=-1 tap: only second-half -> first-half (K-1 for y[2j])
    dj=+1 tap: only first-half -> second-half (K+1 for y[2j+1])

  variant A (3 convs): [3,1,128,128] dense center + two [3,1,64,64]
      shifted side convs — FLOP-neutral vs the original conv.
  variant B (1 conv, concat-256): concat the shifted halves onto the
      packed input -> [h,192,256], one [3,1,256,128] conv — 1.33x FLOPs
      but every matmul 128-wide.

Run on the TPU: python scripts/packed_conv_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

from modular_semantic_segmentation_tpu.utils.profiling import device_time_fn

H, W, C = 768, 384, 64


def conv(x, k, wpad=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=[(1, 1), wpad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def baseline(x, k):
    return conv(x, k)


def pack(x):
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 2, 2 * c)


def unpack(xp):
    n, h, wp, c2 = xp.shape
    return xp.reshape(n, h, wp * 2, c2 // 2)


def make_packed_kernels(k):
    """k: [3,3,64,64] HWIO -> center [3,1,128,128], side kernels."""
    km1, k0, kp1 = k[:, 0], k[:, 1], k[:, 2]  # each [3,64,64]
    # center tap (dj=0): [[k0, km1], [kp1, k0]] as [in 128, out 128]
    top = jnp.concatenate([k0, km1], axis=2)      # in 0:64 -> out both
    bot = jnp.concatenate([kp1, k0], axis=2)      # in 64:128 -> out both
    kc = jnp.concatenate([top, bot], axis=1)[:, None]  # [3,1,128,128]
    ks_m1 = km1[:, None]   # [3,1,64,64]  packed col j-1 2nd half -> out 1st
    ks_p1 = kp1[:, None]   # [3,1,64,64]  packed col j+1 1st half -> out 2nd
    return kc, ks_m1, ks_p1


def variant_a(x, kc, ks_m1, ks_p1):
    xp = pack(x)
    center = conv(xp, kc, wpad=(0, 0))
    # side contributions: shift packed cols by +-1
    left_in = xp[:, :, :, C:]    # x[2j+1] at packed col j
    right_in = xp[:, :, :, :C]   # x[2j]
    # value at packed col j-1: pad W left by 1, run valid, keep first 192
    m1 = conv(jnp.pad(left_in, ((0, 0), (0, 0), (1, 0), (0, 0))),
              ks_m1, wpad=(0, 0))[:, :, :-1]
    p1 = conv(jnp.pad(right_in, ((0, 0), (0, 0), (0, 1), (0, 0))),
              ks_p1, wpad=(0, 0))[:, :, 1:]
    out = center + jnp.concatenate([m1, p1], axis=-1)
    return unpack(out)


def variant_b(x, kb):
    xp = pack(x)
    left_in = jnp.pad(xp[:, :, :, C:],
                      ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]
    right_in = jnp.pad(xp[:, :, :, :C],
                       ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
    wide = jnp.concatenate([left_in, xp, right_in], axis=-1)  # [.,192,256]
    return unpack(conv(wide, kb, wpad=(0, 0)))


def make_wide_kernel(k):
    """[3,1,256,128]: rows = [x[2j-1]; x[2j]; x[2j+1]; x[2j+2]] blocks."""
    km1, k0, kp1 = k[:, 0], k[:, 1], k[:, 2]
    z = jnp.zeros_like(k0)
    # in order: left_in (x[2j-1]) 64, xp (x[2j], x[2j+1]) 128, right_in
    # (x[2j+2]) 64; out = (y[2j] 64 | y[2j+1] 64)
    col0 = jnp.concatenate([km1, z], axis=2)        # x[2j-1] -> y[2j]
    col1 = jnp.concatenate([k0, km1], axis=2)       # x[2j]
    col2 = jnp.concatenate([kp1, k0], axis=2)       # x[2j+1]
    col3 = jnp.concatenate([z, kp1], axis=2)        # x[2j+2] -> y[2j+1]
    return jnp.concatenate([col0, col1, col2, col3], axis=1)[:, None]


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, H, W, C) * 2 - 1, jnp.bfloat16)
    k = jnp.asarray(rng.rand(3, 3, C, C) * 0.1 - 0.05, jnp.bfloat16)
    flops = 2 * H * W * C * C * 9

    want = np.asarray(baseline(x, k), np.float32)

    kc, ks_m1, ks_p1 = make_packed_kernels(k)
    got_a = np.asarray(variant_a(x, kc, ks_m1, ks_p1), np.float32)
    err_a = np.abs(got_a - want).max() / np.abs(want).max()

    kb = make_wide_kernel(k)
    got_b = np.asarray(variant_b(x, kb), np.float32)
    err_b = np.abs(got_b - want).max() / np.abs(want).max()
    print(f"numerics: A rel err {err_a:.2e} | B rel err {err_b:.2e}",
          file=sys.stderr)

    t0 = device_time_fn(baseline, x, k, iters=100)
    ta = device_time_fn(variant_a, x, kc, ks_m1, ks_p1, iters=100)
    tb = device_time_fn(variant_b, x, kb, iters=100)

    # int8 variant B: the packed conv is 256 channels wide, so it clears
    # the int8 eligibility threshold that the unpacked 64-ch conv misses.
    xf = jnp.asarray(x, jnp.float32)
    kbq = jnp.clip(jnp.round(
        kb.astype(jnp.float32)
        / (jnp.max(jnp.abs(kb.astype(jnp.float32)), axis=(0, 1, 2)) / 127)),
        -127, 127).astype(jnp.int8)
    ascale = jnp.float32(1.0 / 127)

    def variant_b_int8(xf, kbq):
        xp = pack(jnp.clip(jnp.round(xf / ascale), -127,
                           127).astype(jnp.int8))
        left_in = jnp.pad(xp[:, :, :, C:],
                          ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]
        right_in = jnp.pad(xp[:, :, :, :C],
                           ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
        wide = jnp.concatenate([left_in, xp, right_in], axis=-1)
        acc = jax.lax.conv_general_dilated(
            wide, kbq, window_strides=(1, 1), padding=[(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return unpack(acc.astype(jnp.float32) * ascale).astype(jnp.bfloat16)

    tbq = device_time_fn(variant_b_int8, xf, kbq, iters=100)

    def r(t):
        return f"{t * 1e3:7.3f} ms {flops / t / 1e12:6.1f} TF/s"
    print(f"baseline 64ch : {r(t0)}")
    print(f"packed A 3conv: {r(ta)}  speedup {t0 / ta:4.2f}x")
    print(f"packed B 1conv: {r(tb)}  speedup {t0 / tb:4.2f}x")
    print(f"packed B int8 : {r(tbq)}  speedup {t0 / tbq:4.2f}x")


if __name__ == "__main__":
    main()
