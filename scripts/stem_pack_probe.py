"""Space-to-depth probe for AdapNet's 7x7/s2 stem conv (the 0.53 ms item).

docs/TIMING.md's AdapNet segment table shows the stem's 7x7/s2 64->64
conv at 768x384 running at ~56 TFLOP/s — the same half-filled-lane
problem as SimpleFCN's conv1 stack (64 channels fill half the 128-wide
vector lanes at batch 1). Unlike the SimpleFCN case (where space-to-depth
was rejected because stride-1 packing doubles the FLOPs with zero
blocks), a STRIDE-2 conv packs losslessly: output (i, j) of the s2 conv
reads input parity phases (dy, dx) at packed offsets, so the packed
kernel is 4x4 over 256 channels with only 64/49 = 1.31x tap inflation
(7 odd -> one padded tap row/col), and the conv becomes stride-1 on a
4x-channel tensor where the MXU runs at full rate.

Measures: baseline 7x7/s2, the pack op alone, packed 4x4 conv alone,
and the end-to-end packed replacement (pack + conv), all device-timed.

Run: python scripts/stem_pack_probe.py
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

from modular_semantic_segmentation_tpu.utils.profiling import (  # noqa: E402
    device_time_fn)

H, W, C = 768, 384, 64
DTYPE = jnp.bfloat16
GFLOP = 2 * (H // 2) * (W // 2) * 49 * C * C / 1e9  # 29.0 true FLOPs


def pack_s2(x):
    """[N, H, W, C] -> [N, H/2, W/2, 4C], channel-major (dy, dx, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def pack_kernel_s2(kernel):
    """7x7 stride-2 kernel -> 4x4 stride-1 kernel over packed channels.

    SAME k=7 s=2 (H even): pad (2, 3). Output (i, j) tap (u, v) reads
    input row 2i + u - 2 = 2(i + iy) + dy with u = 2iy + dy + 2, i.e.
    packed tap iy = (u - dy - 2) // 2 in [-1, 2] -> index iy + 1.
    """
    k, _, cin, cout = kernel.shape
    kp = np.zeros((4, 4, 2, 2, cin, cout), kernel.dtype)
    for u in range(k):
        for v in range(k):
            for dy in range(2):
                for dx in range(2):
                    if (u - dy - 2) % 2 or (v - dx - 2) % 2:
                        continue
                    iy, ix = (u - dy - 2) // 2, (v - dx - 2) // 2
                    if -1 <= iy <= 2 and -1 <= ix <= 2:
                        kp[iy + 1, ix + 1, dy, dx] = kernel[u, v]
    return kp.reshape(4, 4, 4 * cin, cout)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, H, W, C).astype(np.float32))
    kernel = jnp.asarray(rng.randn(7, 7, C, C).astype(np.float32) * 0.05)
    kp = jnp.asarray(pack_kernel_s2(np.asarray(kernel)))

    def baseline(x, kernel):
        return jax.lax.conv_general_dilated(
            x.astype(DTYPE), kernel.astype(DTYPE), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def packed(x, kp):
        xp = pack_s2(x.astype(DTYPE))
        # packed offsets -1..2 -> SAME-style pad (1, 2)
        return jax.lax.conv_general_dilated(
            xp, kp.astype(DTYPE), (1, 1), [(1, 2), (1, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def pack_only(x, kp):
        return pack_s2(x.astype(DTYPE))

    want = np.asarray(baseline(x, kernel))
    got = np.asarray(packed(x, kp))
    err = np.abs(got - want).max() / np.abs(want).max()
    print(f"numerics: rel max err = {err:.2e} (bf16 scale)")
    assert err < 2e-2

    for name, fn, args in [("7x7/s2 baseline", baseline, (x, kernel)),
                           ("pack op alone", pack_only, (x, kp)),
                           ("packed 4x4/s1 conv (incl pack)", packed,
                            (x, kp))]:
        spf = device_time_fn(jax.jit(fn), *args, iters=8, repetitions=3)
        print(f"{name:<32} {spf * 1e3:>7.3f} ms "
              f"{GFLOP / spf / 1e3:>6.1f} TFLOP/s-true")


if __name__ == "__main__":
    main()
