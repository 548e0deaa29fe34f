"""Host input-pipeline throughput benchmark (images/s at 768x384).

Round-1 verdict item 4: prove the host loader outruns device consumption.
Measures the FULL production path — PNG decode (cv2.imread) + npy depth
load + reference augmentation (scale/crop/flip/gamma, with the native C++
resize/LUT hot ops) + 16-multiple crop + batch stack with the fused native
uint8->float32 pack — sequential vs thread-pool workers, float32 vs
compact uint8 transfer payloads.

Device demand for comparison (docs/TIMING.md): fused Bayes RGB-D inference
consumes ~170 frames/s on one v5e; a training step at batch 4 runs ~3-4
steps/s (12-16 images/s). The loader must exceed whichever path it feeds.

Run: python scripts/loader_bench.py [num_frames]
"""

import json
import os
import shutil
import sys
import tempfile
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from modular_semantic_segmentation_tpu.datasets.augmentation import (  # noqa: E402
    augmentate, crop_multiple)
from modular_semantic_segmentation_tpu.datasets import native_backend  # noqa: E402

HEIGHT, WIDTH = 768, 384
# the reference's canonical training augmentation (example_config.yaml idiom)
AUGMENTATION = dict(scale=(0.4, 0.7, 1.5), crop=(1.0, 384), hflip=0.5,
                    gamma=(0.4, 0.3, 1.2))


def make_corpus(root, n):
    """Synthesize a disk corpus of PNG rgb + npy depth/labels frames."""
    colors = np.array([[0, 0, 0], [200, 40, 40], [40, 200, 40], [40, 40, 200],
                       [200, 200, 40], [40, 200, 200]], np.float32)
    for i in range(n):
        rng = np.random.RandomState(i)
        labels = rng.randint(0, len(colors),
                             (HEIGHT, WIDTH)).astype(np.int32)
        rgb = np.clip(colors[labels] + rng.randn(HEIGHT, WIDTH, 3) * 25,
                      0, 255).astype(np.uint8)
        depth = (labels[..., None] * 0.2 +
                 rng.rand(HEIGHT, WIDTH, 1) * 0.05).astype(np.float32)
        cv2.imwrite(os.path.join(root, f"{i:04d}.png"), rgb)
        np.save(os.path.join(root, f"{i:04d}_depth.npy"), depth)
        np.save(os.path.join(root, f"{i:04d}_labels.npy"), labels)


def load_blob(root, i, training_format=True):
    rgb = cv2.imread(os.path.join(root, f"{i:04d}.png"))
    depth = np.load(os.path.join(root, f"{i:04d}_depth.npy"))
    labels = np.load(os.path.join(root, f"{i:04d}_labels.npy"))
    blob = {"rgb": rgb, "depth": depth, "labels": labels}
    if training_format:
        blob = augmentate(blob, **AUGMENTATION)
    return {m: crop_multiple(v) for m, v in blob.items()}


class _Source:
    """Minimal DataSource clone over the disk corpus (same stack/pool code
    path as datasets.data_baseclass.DataSource)."""

    def __init__(self, root, n, compact_transfer=False, raw=False):
        from modular_semantic_segmentation_tpu.datasets.data_baseclass import \
            DataSource
        self._root, self._n = root, n
        self._ds = DataSource.__new__(DataSource)
        self._ds.modalities = ["rgb", "depth", "labels"]
        self._ds.compact_transfer = compact_transfer
        # raw=True skips host augmentation — the feed for ON-DEVICE
        # augmentation training (ops/device_augment.py), where the host
        # only decodes and ships raw frames
        self._ds.get_blob = lambda i: load_blob(root, i % n,
                                                training_format=not raw)
        self._ds._items = list(range(n))

    def batches(self, batchsize, repeat=True, workers=None):
        from modular_semantic_segmentation_tpu.datasets.data_baseclass import \
            DataSource
        return DataSource.batches(self._ds, batchsize, shuffle=True,
                                  repeat=repeat, seed=0, workers=workers)


def measure(source, batchsize, seconds=8.0, workers=None):
    it = source.batches(batchsize, workers=workers)
    next(it)  # warm the page cache / pool
    n, start = 0, time.perf_counter()
    while time.perf_counter() - start < seconds:
        next(it)
        n += batchsize
    return n / (time.perf_counter() - start)


def main(num_frames=64):
    assert native_backend.available(), (
        "build the native library first: make -C "
        "modular_semantic_segmentation_tpu/native")
    root = tempfile.mkdtemp(prefix="loader_bench_")
    try:
        make_corpus(root, num_frames)
        results = {
            "decode_augment_pack_f32_seq_img_per_s": round(
                measure(_Source(root, num_frames), 8), 1),
            "decode_augment_pack_f32_pool4_img_per_s": round(
                measure(_Source(root, num_frames), 8, workers=4), 1),
            "decode_augment_compact_u8_seq_img_per_s": round(
                measure(_Source(root, num_frames, compact_transfer=True), 8),
                1),
            # device-augmentation training feed: decode + compact uint8
            # ship, augmentation runs inside the jitted train step
            "decode_raw_compact_u8_seq_img_per_s": round(
                measure(_Source(root, num_frames, compact_transfer=True,
                                raw=True), 8), 1),
            "host_cores": os.cpu_count(),
        }
        print(json.dumps(results))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
