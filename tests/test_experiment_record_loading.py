"""Fusion models loading their statistics from stored experiment records
(reference bayes_mix.py:143-147, dirichlet_mix.py:65-73)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def record_storage(tmp_path, monkeypatch):
    import modular_semantic_segmentation_tpu.settings as settings
    storage = tmp_path / "experiments"
    os.makedirs(storage)
    monkeypatch.setattr(settings, "EXPERIMENT_STORAGE_FOLDER", str(storage))
    return storage


def _write_run(storage, run_id, info, artifacts=None):
    run_dir = storage / str(run_id)
    os.makedirs(run_dir)
    with open(run_dir / "run.json", "w") as f:
        json.dump({"_id": run_id, "status": "COMPLETED",
                   "command": "main", "artifacts": [],
                   "experiment": {"name": "x", "mainfile": "training.py"}},
                  f)
    with open(run_dir / "config.json", "w") as f:
        json.dump({}, f)
    with open(run_dir / "info.json", "w") as f:
        json.dump(info, f)
    for name, arrays in (artifacts or {}).items():
        np.savez(run_dir / name, **arrays)
    return run_dir


def test_bayes_fusion_from_eval_experiments(record_storage):
    from modular_semantic_segmentation_tpu.models import get_model
    rng = np.random.RandomState(0)
    k = 4
    cms = {}
    for i, modality in enumerate(["rgb", "depth"], start=1):
        cm = rng.randint(1, 30, (k, k)).astype(float)
        cms[modality] = cm
        _write_run(record_storage, i, {
            "confusion_matrix": {
                "py/object": "numpy.ndarray", "values": cm.tolist(),
                "dtype": "float64"}})

    desc = ({"labels": np.int32, "rgb": np.float32, "depth": np.float32},
            {"rgb": (None, None, 3), "depth": (None, None, 1),
             "labels": (None, None)}, k)
    net = get_model("bayes_mix")(
        data_description=desc, eval_experiments={"rgb": 1, "depth": 2},
        num_units=4, expert_model="fcn", batchsize=1,
        prefixes={"rgb": "rgb", "depth": "depth"})
    for m in ["rgb", "depth"]:
        np.testing.assert_allclose(net.confusion_matrices[m],
                                   cms[m].astype("float32").T)


def test_dirichlet_fusion_from_measurement_exp(record_storage):
    from modular_semantic_segmentation_tpu.models import get_model
    rng = np.random.RandomState(1)
    k = 4
    params = {m: rng.rand(k, k).astype("float32") + 0.5
              for m in ["rgb", "depth"]}
    params["class_counts"] = np.arange(1, k + 1).astype("float32")
    _write_run(record_storage, 7, {}, artifacts={"counts.npz": params})
    # register the artifact name so get_artifact finds it (dir backend
    # lists files)
    desc = ({"labels": np.int32, "rgb": np.float32, "depth": np.float32},
            {"rgb": (None, None, 3), "depth": (None, None, 1),
             "labels": (None, None)}, k)
    net = get_model("dirichlet_mix")(
        data_description=desc, measurement_exp=7, num_units=4,
        expert_model="fcn", batchsize=1, sigma=0.5,
        prefixes={"rgb": "rgb", "depth": "depth"})
    np.testing.assert_allclose(net.dirichlet_params["rgb"], params["rgb"])
    np.testing.assert_allclose(net.class_counts, params["class_counts"])
    # fusion-mode eval works directly (no fit needed)
    batch = {
        "rgb": np.zeros((1, 32, 32, 3), np.float32),
        "depth": np.zeros((1, 32, 32, 1), np.float32),
        "labels": np.zeros((1, 32, 32), np.int32),
    }
    preds = net.predict(batch)
    assert preds.shape == (1, 32, 32)
