"""Probe: which VGG pools should use the mask-based custom pool gradient?

The all-or-nothing experiment (docs/TIMING.md, ops/layers.max_pool2d)
showed: custom gradient on AdapNet's single stem pool WINS (14.0 -> 13.2
ms/step) but on ALL of SimpleFCN's four pools REGRESSES (14.0 -> 17.8) —
the custom_vjp boundary blocks fusion with the conv backward chain. This
probe measures each pool's contribution separately: pool1 alone
(768x384x64 — the one SelectAndScatter measured at ~2 ms), pool1+2, etc.,
by monkeypatching max_pool2d with a trace-order counter.

Run: python scripts/pool_grad_probe.py
"""

import os
import sys
from types import SimpleNamespace

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from modular_semantic_segmentation_tpu.ops import layers  # noqa: E402
from experiments.timing import time_train_step  # noqa: E402

_real_pool = layers.max_pool2d
# identify pools by input channel count (the model traces init/train/eval
# graphs separately, so a trace-order counter does not work):
# pool1 in 768x384x64, pool2 384x192x128, pool3 192x96x256, pool4 96x48x512
_state = {"enabled": frozenset()}


def _selective_pool(ctx, x, pool_size, strides, name=None, padding="VALID",
                    custom_grad=False):
    return _real_pool(ctx, x, pool_size, strides, name=name, padding=padding,
                      custom_grad=int(x.shape[-1]) in _state["enabled"])


def measure(enabled_channels, label):
    _state["enabled"] = frozenset(enabled_channels)
    layers.max_pool2d = _selective_pool
    try:
        run = SimpleNamespace(info={})
        time_train_step(_run=run, compute_dtype="bfloat16", batchsize=1,
                        repetitions=30)
        spf = run.info["timings"]["train_step"]["s_per_step"]
        print(f"  -> {label}: {spf * 1e3:.2f} ms/step")
        return spf
    finally:
        layers.max_pool2d = _real_pool


def main():
    results = {}
    for enabled, label in [
            ((), "baseline (no custom grads)"),
            ((64,), "pool1 only"),
            ((64, 128), "pool1+pool2"),
            ((64, 128, 256), "pool1+pool2+pool3"),
            ((64, 128, 256, 512), "all four pools"),
            ((128, 256, 512), "pools 2-4 (not pool1)"),
    ]:
        results[label] = measure(enabled, label)
    best = min(results, key=results.get)
    print(f"best: {best} at {results[best] * 1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
