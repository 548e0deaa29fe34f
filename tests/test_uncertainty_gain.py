"""End-to-end proof that the uncertainty branch is INFORMATIVE — the
FUSION_GAIN-style treatment for the reference's uncertainty workflows
(reference experiments/uncertainty_eval.py:18-88,
xview/models/bayesian_fcn.py:9-57, xview/datasets/not_cityscapes.py:68-100).

Three non-tautological quality claims, each demonstrated through the
production CLIs on the synthetic corpus (operating points established in
scripts/uncertainty_gain_probe.py; numbers in docs/UNCERTAINTY.md):

  1. MC-dropout entropy DETECTS MISCLASSIFIED pixels well above chance
     (AUROC ~0.80 across 3 training seeds; bar 0.70).
  2. MC-dropout uncertainty DETECTS OUT-OF-DISTRIBUTION pixels: dark
     novel objects pasted by AddRandomObjects are flagged by entropy
     (AUROC ~0.80; bar 0.65). The probe shows bright novel objects are
     the wrong construct for unnormalized-input convnets (they SHARPEN
     the softmax — see docs/UNCERTAINTY.md).
  3. TEMPERATURE SCALING improves the NLL of an overconfident net: an
     overfit expert (train/test mIoU gap ~0.5) improves monotonically
     from T=1 to T=2 (probe: 2.07 -> 1.28).

Together with `measure` (test_experiments.py) this executes every
uncertainty_eval command in CI.
"""

import json
import os

import cv2
import numpy as np
import pytest

from tests.test_experiments import _run_cli

DATASET = ["height=32", "width=32", "noise=30.0", "num_train=20",
           "num_measure=8", "num_test=8"]
NET = ["net_config.prefix=rgb", "net_config.modality=rgb",
       "net_config.num_units=8", "net_config.batchsize=4",
       "net_config.channel_factor=0.125", "net_config.learning_rate=0.03"]
MC_NET = NET + ["net_config.num_samples=8", "net_config.dropout_rate=0.3"]


def _make_object_library(base):
    """Dark (intensity 32..60) novel-object library — the OOD construct
    scripts/uncertainty_gain_probe.py validates (low-intensity inputs are
    out-of-manifold for the unittest corpus and flatten the softmax;
    bright objects sharpen it and are anti-detected)."""
    rng = np.random.RandomState(2)
    lib = os.path.join(base, "amsterdam_object_lib")
    for i in range(12):
        num = 251 + i
        obj = np.zeros((18, 18, 3), np.uint8)
        color = [int(rng.randint(32, 60)) for _ in range(3)]
        cv2.ellipse(obj, (9, 9),
                    (int(rng.randint(6, 9)), int(rng.randint(6, 9))),
                    int(rng.randint(180)), 0, 360, color, -1)
        os.makedirs(os.path.join(lib, str(num)), exist_ok=True)
        cv2.imwrite(os.path.join(lib, str(num), f"{num}_c.png"), obj)


@pytest.fixture(scope="module")
def storage(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("uncertainty_gain")
    env = {"EXPERIMENT_STORAGE_FOLDER": str(tmp / "experiments"),
           "EXP_OUT": str(tmp / "exp"),
           "DATA_BASEPATH": str(tmp / "data")}
    os.makedirs(env["EXPERIMENT_STORAGE_FOLDER"], exist_ok=True)
    os.makedirs(env["DATA_BASEPATH"], exist_ok=True)
    _make_object_library(env["DATA_BASEPATH"])
    return env


def _info(storage, run_id):
    return json.load(open(os.path.join(
        storage["EXPERIMENT_STORAGE_FOLDER"], str(run_id), "info.json")))


def _last_run(storage):
    return max(int(d) for d in
               os.listdir(storage["EXPERIMENT_STORAGE_FOLDER"])
               if d.isdigit())


@pytest.fixture(scope="module")
def expert(storage):
    """An MC-dropout BayesianFCN trained through the training CLI."""
    _run_cli("experiments.training",
             ["with", "dataset.name=unittest", "seed=1"]
             + [f"dataset.{p}" for p in DATASET]
             + MC_NET + ["modelname=bayesian_fcn", "num_iterations=400",
                         "starting_weights=false"],
             storage)
    return _last_run(storage)


def test_misclassification_detection_beats_chance(storage, expert):
    """Claim 1 (reference uncertainty_eval.py:18-22,171-182): the
    uncertainty signal finds the expert's own mistakes. A coin flip
    scores 0.5; the probe measures ~0.80 across 3 training seeds."""
    _run_cli("experiments.uncertainty_eval",
             ["with", "modelname=bayesian_fcn",
              f"starting_weights={expert}",
              "dataset.name=unittest"]
             + [f"dataset.{p}" for p in DATASET]
             + MC_NET + [
              "benchmark=misclassification",
              'uncertainty_metrics=["entropy", "cond_entropy", "variance"]'],
             storage, timeout=1800)
    measurements = _info(storage, _last_run(storage))["measurements"]
    assert measurements["entropy"]["AUROC"] >= 0.70, measurements
    assert measurements["cond_entropy"]["AUROC"] >= 0.65, measurements
    assert measurements["variance"]["AUROC"] >= 0.65, measurements


def test_out_of_distribution_detection_beats_chance(storage, expert):
    """Claim 2 (reference uncertainty_eval.py:23-28 + the AddRandomObjects
    OOD benchmark, not_cityscapes.py:68-100): pixels of never-seen dark
    objects pasted onto unittest frames are flagged by the MC-dropout
    uncertainty. dataset.num_classes keeps the model at its TRAINED class
    count; the OOD labels are the in(0)/out(1) mask."""
    _run_cli("experiments.uncertainty_eval",
             ["with", "modelname=bayesian_fcn", "seed=11",
              f"starting_weights={expert}",
              "dataset.name=add_random_objects",
              "dataset.add_to_dataset=unittest",
              "dataset.halfsize=false", "dataset.num_classes=4",
              "dataset.num_test=16"]
             + [f"dataset.{p}" for p in DATASET if "num_test" not in p]
             + MC_NET + [
              "benchmark=out_of_distribution",
              'uncertainty_metrics=["entropy", "variance"]'],
             storage, timeout=1800)
    measurements = _info(storage, _last_run(storage))["measurements"]
    assert measurements["entropy"]["AUROC"] >= 0.65, measurements
    assert measurements["variance"]["AUROC"] >= 0.60, measurements


@pytest.fixture(scope="module")
def overfit_run(storage):
    """train_ambiguous: an overfit, unregularized expert (8 frames, no
    dropout, 500 iterations) with a merged class pair — the honest
    overconfidence generator (train/test mIoU gap ~0.5 in the probe)."""
    _run_cli("experiments.uncertainty_eval",
             ["train_ambiguous", "with", "modelname=bayesian_fcn", "seed=3",
              "dataset.name=unittest", "dataset.num_train=8",
              "dataset.num_measure=4"]
             + [f"dataset.{p}" for p in DATASET
                if "num_train" not in p and "num_measure" not in p]
             + NET + [
              "net_config.num_samples=1", "net_config.dropout_rate=0.0",
              "method=merge", "num_iterations=500",
              "starting_weights=false",
              'uncertainty_metrics=["entropy"]'],
             storage, timeout=1800)
    return _last_run(storage)


def test_train_ambiguous_records_measurements(storage, overfit_run):
    """train_ambiguous (reference uncertainty_eval.py:109-154) records the
    ambiguity spec and the post-training uncertainty measurements."""
    info = _info(storage, overfit_run)
    assert "label_merge" in info["dataset"]["augmentation"]
    m = info["measurements"]
    assert "nll" in m and "entropy" in m and "dirichlet_priors" in m


def test_temperature_scaling_improves_overfit_nll(storage, overfit_run):
    """Claim 3 (reference uncertainty_eval.py:61-88): on the overfit
    expert, softening the softmax (T=2) improves test NLL over T=1 by a
    real margin (probe: 2.07 -> 1.28 at 700 iterations; bar 0.05)."""
    _run_cli("experiments.uncertainty_eval",
             ["evaluate_temperature_scaling", "with",
              f"experiments=[{overfit_run}]",
              "temperatures=[0.5, 1.0, 2.0]"],
             storage, timeout=1800)
    grid = _info(storage, overfit_run)["temperature_grid_search"]
    temps = list(grid["temperature_scaling"])
    nlls = list(grid["nll"])
    assert temps == [0.5, 1.0, 2.0]
    nll_by_t = dict(zip(temps, nlls))
    assert nll_by_t[2.0] < nll_by_t[1.0] - 0.05, nll_by_t
    assert min(nll_by_t, key=nll_by_t.get) != 1.0, nll_by_t


def test_uncertainty_parameter_search(storage, expert):
    """uncertainty_parameter_search (reference uncertainty_eval.py:91-106):
    grid over num_samples, AUROC evaluated on the measure set per config."""
    _run_cli("experiments.uncertainty_eval",
             ["uncertainty_parameter_search", "with",
              "modelname=bayesian_fcn", f"starting_weights={expert}",
              "dataset.name=unittest"]
             + [f"dataset.{p}" for p in DATASET]
             + MC_NET + [
              "benchmark=misclassification",
              'search_parameters={"num_samples": [2, 8]}',
              'uncertainty_metrics=["entropy"]'],
             storage, timeout=1800)
    results = _info(storage, _last_run(storage))["results"]
    assert list(results["num_samples"]) == [2, 8]
    # grid_search merges nested result dicts into dict-of-lists
    aurocs = [float(a) for a in results["entropy"]["AUROC"]]
    assert len(aurocs) == 2
    # the signal is informative on the measure split at both sample counts
    assert all(a > 0.6 for a in aurocs), aurocs
