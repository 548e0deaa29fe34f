"""Calibration-robustness sweep for int8 PTQ serving (round-2 verdict
item 7): mIoU delta vs the float path across calibration batch counts and
percentile clips, on the synthetic corpus.

Trains a SimpleFCN on UnittestData, scores the float path, then re-scores
under int8 with every (num_batches, percentile) combination. Results are
recorded in docs/TIMING.md.

Run on the TPU: python scripts/int8_calibration_sweep.py [iterations]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from modular_semantic_segmentation_tpu.datasets.unittest_data import \
    UnittestData
from modular_semantic_segmentation_tpu.models import get_model


def main(iterations=200):
    data = UnittestData(num_train=20, num_measure=8, num_test=8)
    net = get_model("simple_fcn")(
        prefix="rgb", modality="rgb", num_units=8, batchsize=4,
        learning_rate=0.02,
        data_description=UnittestData.get_data_description())
    net.fit(data.get_trainset(), iterations, output=False)

    float_m, _ = net.score(data.get_testset())
    print(f"float: mIoU {float_m['mean_IoU']:.4f} "
          f"acc {float_m['total_accuracy']:.4f}")

    rows = []
    for num_batches in (1, 2, 8):
        for percentile in (99.5, 99.9, 100.0):
            net.dequantize_serving()
            scales = net.quantize_for_serving(
                data.get_measureset(), num_batches=num_batches,
                percentile=percentile)
            m, _ = net.score(data.get_testset())
            d_miou = m["mean_IoU"] - float_m["mean_IoU"]
            d_acc = m["total_accuracy"] - float_m["total_accuracy"]
            rows.append((num_batches, percentile, m["mean_IoU"], d_miou,
                         d_acc, len(scales)))
            print(f"batches={num_batches} pct={percentile:6.1f}: "
                  f"mIoU {m['mean_IoU']:.4f} (delta {d_miou:+.4f}) "
                  f"acc delta {d_acc:+.4f} convs quantized {len(scales)}")

    worst = min(rows, key=lambda r: r[3])
    print(f"worst config: batches={worst[0]} pct={worst[1]} "
          f"mIoU delta {worst[3]:+.4f}")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
