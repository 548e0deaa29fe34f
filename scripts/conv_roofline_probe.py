"""Re-measure the per-segment conv roofline of docs/TIMING.md with the
FIXED device_time_fn (all-leaves carry, loop-difference floors).

Round-2 verdict item: the old table reported "conv2-5 blocks ... 140-286
TFLOP/s" — impossible, a v5e peaks at ~197 TFLOP/s bf16 — because those
rows were measured before the first-leaf DCE fix in device_time_fn
(utils/profiling.py:97-186). This probe times each isolated 3x3 conv of
the SimpleFCN stack at the benchmark shape (768x384, bf16, batch 1) and
prints achieved TFLOP/s against an assumed peak, flagging any row that
exceeds it.

Run on the real TPU: python scripts/conv_roofline_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from modular_semantic_segmentation_tpu.utils.profiling import device_time_fn

_CACHE = {}
PEAK_TFLOPS_BF16 = 197.0  # v5e MXU peak (jax-ml scaling book, v5e specs)

# (name, H, W, C_in, C_out) of every 3x3 conv in SimpleFCN @768x384
SEGMENTS = [
    ("conv1_1", 768, 384, 3, 64),
    ("conv1_2", 768, 384, 64, 64),
    ("conv2_1", 384, 192, 64, 128),
    ("conv2_2", 384, 192, 128, 128),
    ("conv3_1", 192, 96, 128, 256),
    ("conv3_2", 192, 96, 256, 256),
    ("conv3_3", 192, 96, 256, 256),
    ("conv4_1", 96, 48, 256, 512),
    ("conv4_2", 96, 48, 512, 512),
    ("conv4_3", 96, 48, 512, 512),
    ("conv5_1", 48, 24, 512, 512),
    ("conv5_2", 48, 24, 512, 512),
    ("conv5_3", 48, 24, 512, 512),
]


def time_conv(h, w, cin, cout, iters=100):
    # identical shapes share one measurement (conv3_2==conv3_3 etc.) —
    # each device_time_fn costs two loop-program compiles over the tunnel
    key = (h, w, cin, cout)
    if key in _CACHE:
        return _CACHE[key]
    x = jnp.asarray(np.random.rand(1, h, w, cin), jnp.bfloat16)
    k = jnp.asarray(np.random.rand(3, 3, cin, cout) * 0.1, jnp.bfloat16)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    _CACHE[key] = device_time_fn(conv, x, k, iters=iters, repetitions=5)
    return _CACHE[key]


def main():
    print(f"assumed bf16 peak: {PEAK_TFLOPS_BF16} TFLOP/s (v5e)")
    print(f"{'segment':10s} {'ms':>8s} {'GFLOP':>8s} {'TFLOP/s':>8s} "
          f"{'% peak':>7s}")
    total_ms, total_gflop, bad = 0.0, 0.0, []
    for name, h, w, cin, cout in SEGMENTS:
        sec = time_conv(h, w, cin, cout)
        gflop = 2.0 * h * w * cin * cout * 9 / 1e9
        tflops = gflop / sec / 1e3
        pct = 100.0 * tflops / PEAK_TFLOPS_BF16
        total_ms += sec * 1e3
        total_gflop += gflop
        flag = "  <-- EXCEEDS PEAK" if tflops > PEAK_TFLOPS_BF16 else ""
        if flag:
            bad.append(name)
        print(f"{name:10s} {sec * 1e3:8.3f} {gflop:8.2f} {tflops:8.1f} "
              f"{pct:6.1f}%{flag}")
    print(f"{'TOTAL':10s} {total_ms:8.3f} {total_gflop:8.2f} "
          f"{total_gflop / total_ms:8.1f} "
          f"{100.0 * total_gflop / total_ms / PEAK_TFLOPS_BF16:6.1f}%")
    if bad:
        print(f"IMPOSSIBLE ROWS: {bad} — timer or FLOP accounting is wrong")
        sys.exit(1)
    print("all rows within the stated peak")


if __name__ == "__main__":
    main()
