"""Probe: does statistical fusion beat the single-modality experts on the
complementary-corruption synthetic corpus?

This is the paper's core scientific claim (reference Tables I-V, Synthia nb
cells 17-21) reproduced end-to-end without the real corpora: train an RGB
and a depth expert on UnittestData(complementary=True) — where classes 1/2
share an RGB color but differ in depth, and classes 3/4 share a depth but
differ in color — measure their confusion matrices on the measure set, fit
BayesFusion / AverageFusion / DirichletFusion, and compare test mIoU.

Usage: python scripts/fusion_gain_probe.py [iterations] [num_units] [lr]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from modular_semantic_segmentation_tpu.datasets.unittest_data import \
    UnittestData
from modular_semantic_segmentation_tpu.models import get_model


def main(iterations=300, num_units=8, lr=0.01, noise=20.0, batchsize=4,
         height=48, width=64, channel_factor=1.0):
    data = UnittestData(complementary=True, noise=noise, height=height,
                        width=width)
    description = UnittestData.get_data_description(num_classes=5)

    expert_miou, confusion, weights = {}, {}, {}
    tmp = tempfile.mkdtemp(prefix="fusion_probe_")
    for modality in ("rgb", "depth"):
        os.makedirs(f"{tmp}/{modality}", exist_ok=True)
        net = get_model("simple_fcn")(
            prefix=modality, modality=modality, num_units=num_units,
            batchsize=batchsize, learning_rate=lr,
            channel_factor=channel_factor,
            data_description=description, output_dir=f"{tmp}/{modality}")
        net.fit(data.get_trainset(), iterations, output=False)
        _, conf = net.score(data.get_measureset())
        confusion[modality] = conf
        m, _ = net.score(data.get_testset())
        expert_miou[modality] = m["mean_IoU"]
        print(f"{modality} expert: mIoU {m['mean_IoU']:.4f} "
              f"acc {m['total_accuracy']:.4f} IoU {np.round(m['IoU'], 3)}")
        weights[modality] = net.export_weights()

    fused = {}
    for name, model_name, kw in [
            ("bayes", "bayes_mix", dict(confusion_matrices=confusion)),
            ("dirichlet_s0.5", "dirichlet_mix", dict(sigma=0.5)),
            ("dirichlet_s1", "dirichlet_mix", dict(sigma=1.0)),
            ("dirichlet_s2", "dirichlet_mix", dict(sigma=2.0)),
            ("dirichlet_s5", "dirichlet_mix", dict(sigma=5.0)),
            ("average", "average_fusion", {})]:
        net = get_model(model_name)(
            data_description=description, expert_model="fcn",
            num_units=num_units, batchsize=batchsize,
            batch_normalization=True, channel_factor=channel_factor,
            prefixes={"rgb": "rgb", "depth": "depth"}, **kw)
        net.import_expert_weights(weights)
        if name.startswith("dirichlet"):
            net.fit(data.get_measureset())
        m, _ = net.score(data.get_testset())
        fused[name] = m["mean_IoU"]
        print(f"{name} fusion: mIoU {m['mean_IoU']:.4f} "
              f"acc {m['total_accuracy']:.4f} IoU {np.round(m['IoU'], 3)}")

    best_expert = max(expert_miou.values())
    for name, miou in fused.items():
        gain = miou - best_expert
        print(f"{name}: fused {miou:.4f} vs best expert {best_expert:.4f} "
              f"-> gain {gain:+.4f} {'BEATS' if gain > 0 else 'LOSES'}")


if __name__ == "__main__":
    args = [float(a) for a in sys.argv[1:]]
    kw = {}
    for key, val in zip(["iterations", "num_units", "lr", "height", "width",
                         "batchsize", "noise", "channel_factor"], args):
        kw[key] = val if key in ("lr", "noise", "channel_factor") else int(val)
    main(**kw)
