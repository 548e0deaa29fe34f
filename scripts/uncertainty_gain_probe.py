"""Probe: is the uncertainty branch INFORMATIVE on the synthetic corpus?

Establishes the operating points for tests/test_uncertainty_gain.py (the
FUSION_GAIN-style quality proof the round-3 verdict demanded):

  1. misclassification detection — MC-dropout BayesianFCN entropy /
     cond_entropy / variance AUROC on the unittest testset
     (reference experiments/uncertainty_eval.py:18-32),
  2. out-of-distribution detection — AddRandomObjects pastes
     novel-appearance objects onto unittest frames; AUROC of entropy for
     the in/out mask (reference xview/datasets/not_cityscapes.py:68-100),
  3. temperature scaling — NLL over a temperature grid; the best T should
     beat T=1 for an overconfident net
     (reference uncertainty_eval.py:61-88).

Run: python scripts/uncertainty_gain_probe.py [--full]
Numbers recorded in docs/UNCERTAINTY.md.
"""

import argparse
import functools
import os
import sys
import tempfile

import numpy as np

print = functools.partial(print, flush=True)  # noqa: A001

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

_tmp = tempfile.mkdtemp(prefix="uncertainty_probe_")
os.environ.setdefault("DATA_BASEPATH", _tmp)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modular_semantic_segmentation_tpu.datasets import get_dataset  # noqa
from modular_semantic_segmentation_tpu.models import get_model  # noqa


def make_object_library(base, num_objects=24, size=14, seed=0):
    """Synthetic stand-in for the Amsterdam Object Library: bright
    novel-color blobs on black background (everything < 30 is treated as
    background by AddRandomObjects, reference not_cityscapes.py:90-95).
    Colors are chosen far from every unittest class color."""
    import cv2
    rng = np.random.RandomState(seed)
    novel = np.array([[255, 255, 255], [255, 150, 40], [150, 40, 255],
                      [255, 40, 150], [40, 255, 255], [255, 255, 150]],
                     np.uint8)
    lib = os.path.join(base, "amsterdam_object_lib")
    os.makedirs(lib, exist_ok=True)
    for i in range(num_objects):
        num = 251 + i
        obj = np.zeros((size, size, 3), np.uint8)
        color = novel[rng.randint(len(novel))]
        # filled ellipse with a color gradient so objects have texture
        cv2.ellipse(obj, (size // 2, size // 2),
                    (rng.randint(4, size // 2), rng.randint(4, size // 2)),
                    rng.randint(180), 0, 360, color.tolist(), -1)
        obj = np.clip(obj.astype(np.int32)
                      + rng.randint(-30, 30, obj.shape), 0, 255)
        obj[np.all(obj < 35, axis=2)] = 0
        d = os.path.join(lib, str(num))
        os.makedirs(d, exist_ok=True)
        cv2.imwrite(os.path.join(d, f"{num}_c.png"), obj.astype(np.uint8))
    return lib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="full-width probe (slower)")
    ap.add_argument("--iters", type=int, default=400)
    args = ap.parse_args()

    cf = 1.0 if args.full else 0.125
    data_cfg = dict(height=32, width=32, num_train=20, num_measure=8,
                    num_test=8, noise=30.0)
    data = get_dataset("unittest")(**data_cfg)
    net_cfg = dict(prefix="rgb", modality="rgb", num_units=8, batchsize=4,
                   channel_factor=cf, learning_rate=0.03, num_samples=8,
                   dropout_rate=0.3)
    net = get_model("bayesian_fcn")(
        data_description=data.get_data_description(), **net_cfg)
    net.fit(data.get_trainset(training_format=True), args.iters)
    measures, _ = net.score(data.get_testset())
    print(f"expert mean_IoU={measures['mean_IoU']:.4f} "
          f"acc={measures['total_accuracy']:.4f}")

    # 1. misclassification detection
    for metric in ("entropy", "cond_entropy", "variance"):
        _, _, auroc, _ = net.misclassification_detection_score(
            data.get_testset(), metric)
        print(f"misclassification AUROC[{metric}] = {auroc:.4f}")

    # 2. OOD detection
    make_object_library(os.environ["DATA_BASEPATH"])
    ood_data = get_dataset("add_random_objects")(
        add_to_dataset="unittest", halfsize=False, **data_cfg)
    for metric in ("entropy", "cond_entropy", "variance"):
        _, _, auroc, _ = net.out_of_distribution_detection_score(
            ood_data.get_testset(), metric)
        print(f"OOD AUROC[{metric}] = {auroc:.4f}")

    # 3. temperature scaling
    weights = net.export_weights(save_dir=_tmp)
    nlls = {}
    for temp in (0.5, 1.0, 2.0, 4.0):
        tnet = get_model("bayesian_fcn")(
            data_description=data.get_data_description(),
            temperature_scaling=temp, **net_cfg)
        tnet.import_weights(weights, warnings=False)
        nll, _ = tnet.nll_score(data.get_testset())
        nlls[temp] = nll
        print(f"NLL[T={temp}] = {nll:.4f}")
        tnet.close()
    best = min(nlls, key=nlls.get)
    print(f"best T={best} NLL={nlls[best]:.4f} vs T=1 NLL={nlls[1.0]:.4f} "
          f"(improvement {nlls[1.0] - nlls[best]:.4f})")
    net.close()


if __name__ == "__main__":
    main()
