"""Experiment layer tests: sacred-shim CLI, run records, ExperimentData,
rerun, grid search, fusion experiment flows (SURVEY.md §4 tier 3)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_DATASET = ("dataset.name=unittest dataset.height=32 dataset.width=32 "
                "dataset.num_train=6 dataset.num_measure=2 "
                "dataset.num_test=2")


def _run_cli(module, args, env_overrides, timeout=900):
    env = dict(os.environ)
    env.update(env_overrides)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    result = subprocess.run(
        [sys.executable, "-m", module] + args, capture_output=True,
        text=True, cwd=REPO, env=env, timeout=timeout)
    assert result.returncode == 0, result.stderr[-3000:]
    return result


@pytest.fixture(scope="module")
def storage(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("storage")
    env = {"EXPERIMENT_STORAGE_FOLDER": str(tmp / "experiments"),
           "EXP_OUT": str(tmp / "exp"),
           "DATA_BASEPATH": str(tmp / "data")}
    os.makedirs(env["EXPERIMENT_STORAGE_FOLDER"], exist_ok=True)
    return env


@pytest.fixture(scope="module")
def training_run(storage):
    """Run the training CLI once; returns the run id."""
    _run_cli("experiments.training",
             ["with"] + TINY_DATASET.split() + [
                 "modelname=simple_fcn", "num_iterations=2",
                 "starting_weights=false",
                 "net_config.prefix=rgb", "net_config.modality=rgb",
                 "net_config.num_units=4", "net_config.batchsize=2",
                 "net_config.learning_rate=0.01"],
             storage)
    # the id is assigned by the observer (tests that run other CLIs first
    # in this module-scoped storage shift it)
    return max(int(d) for d in
               os.listdir(storage["EXPERIMENT_STORAGE_FOLDER"])
               if d.isdigit())


def test_training_cli_produces_record(storage, training_run):
    run_dir = os.path.join(storage["EXPERIMENT_STORAGE_FOLDER"],
                           str(training_run))
    files = os.listdir(run_dir)
    assert "run.json" in files and "config.json" in files
    assert any("weights" in f for f in files)
    assert "summaries.jsonl" in files
    record = json.load(open(os.path.join(run_dir, "run.json")))
    assert record["status"] == "COMPLETED"
    info = json.load(open(os.path.join(run_dir, "info.json")))
    assert "measurements" in info


def test_evaluation_cli_loads_run_weights(storage, training_run):
    result = _run_cli(
        "experiments.evaluation",
        ["with"] + [
            "modelname=simple_fcn", f"starting_weights={training_run}",
            "evaluation_data.dataset=unittest",
            "evaluation_data.height=32", "evaluation_data.width=32",
            "evaluation_data.num_test=2",
            "net_config.prefix=rgb", "net_config.modality=rgb",
            "net_config.num_units=4", "net_config.batchsize=2"],
        storage)
    assert "total accuracy" in result.stdout


def test_evaluation_cli_quantized_serving(storage, training_run):
    """`with quantized_serving=True` calibrates int8 PTQ scales on the
    measure set and scores through the int8 path (models/quantize.py)."""
    result = _run_cli(
        "experiments.evaluation",
        ["with"] + [
            "modelname=simple_fcn", f"starting_weights={training_run}",
            "evaluation_data.dataset=unittest",
            "evaluation_data.height=32", "evaluation_data.width=32",
            "evaluation_data.num_test=2",
            "quantized_serving=4",  # tiny net: lower the channel threshold
            "net_config.prefix=rgb", "net_config.modality=rgb",
            "net_config.num_units=4", "net_config.batchsize=2"],
        storage)
    assert "total accuracy" in result.stdout


def test_training_resume_cli(storage, training_run):
    """Interrupted-run recovery: train with periodic checkpoints, then
    `training resume with experiment_id=N` continues from the stored
    step/optimizer state in a NEW run (failure-recovery loop the
    reference lacks, SURVEY.md §5)."""
    store = storage["EXPERIMENT_STORAGE_FOLDER"]
    before = {d for d in os.listdir(store) if d.isdigit()}
    _run_cli("experiments.training",
             ["with"] + TINY_DATASET.split() + [
                 "modelname=simple_fcn", "num_iterations=2",
                 "starting_weights=false",
                 "net_config.prefix=rgb", "net_config.modality=rgb",
                 "net_config.num_units=4", "net_config.batchsize=2",
                 "net_config.learning_rate=0.01",
                 "net_config.checkpoint_interval=1"],
             storage)
    ckpt_run = max(int(d) for d in os.listdir(store)
                   if d.isdigit() and d not in before)
    assert "checkpoint.pkl" in os.listdir(os.path.join(store, str(ckpt_run)))

    # simulate a run KILLED mid-fit (OOM/preemption/SIGKILL): the record
    # skeleton written at run start says RUNNING, no artifacts were
    # registered, and the checkpoint only exists in the EXP_OUT live dir
    run_dir = os.path.join(store, str(ckpt_run))
    os.remove(os.path.join(run_dir, "checkpoint.pkl"))
    for f in list(os.listdir(run_dir)):
        if "weights" in f:
            os.remove(os.path.join(run_dir, f))
    record = json.load(open(os.path.join(run_dir, "run.json")))
    record.update(status="RUNNING", artifacts=[])
    json.dump(record, open(os.path.join(run_dir, "run.json"), "w"))
    json.dump({}, open(os.path.join(run_dir, "info.json"), "w"))
    assert os.path.exists(os.path.join(storage["EXP_OUT"], str(ckpt_run),
                                       "checkpoint.pkl"))

    result = _run_cli("experiments.training",
                      ["resume", "with", f"experiment_id={ckpt_run}",
                       "num_iterations=4"], storage)
    assert f"resuming run {ckpt_run} at step 2" in result.stdout
    assert "2 iterations remaining" in result.stdout
    resumed = max(int(d) for d in os.listdir(store) if d.isdigit())
    assert resumed > ckpt_run
    files = os.listdir(os.path.join(store, str(resumed)))
    assert any("weights" in f for f in files)
    record = json.load(open(os.path.join(store, str(resumed), "run.json")))
    assert record["status"] == "COMPLETED"

    # resume-of-a-resume: the chain walks back to the original training
    # config, and the newest run's own checkpoint (step 4) is used
    result = _run_cli("experiments.training",
                      ["resume", "with", f"experiment_id={resumed}",
                       "num_iterations=6"], storage)
    assert f"resuming run {resumed} at step 4" in result.stdout
    assert "2 iterations remaining" in result.stdout


@pytest.fixture(scope="module")
def depth_run(storage, training_run):
    """A depth expert run (rgb expert = the training_run fixture)."""
    _run_cli("experiments.training",
             ["with"] + TINY_DATASET.split() + [
                 "modelname=simple_fcn", "num_iterations=2",
                 "starting_weights=false",
                 "net_config.prefix=depth", "net_config.modality=depth",
                 "net_config.num_units=4", "net_config.batchsize=2",
                 "net_config.learning_rate=0.01"],
             storage)
    return max(int(d) for d in
               os.listdir(storage["EXPERIMENT_STORAGE_FOLDER"])
               if d.isdigit())


EVAL_DATA = ["evaluation_data.dataset=unittest", "evaluation_data.height=32",
             "evaluation_data.width=32", "evaluation_data.num_train=6",
             "evaluation_data.num_measure=2", "evaluation_data.num_test=2"]


@pytest.fixture(scope="module")
def bayes_fusion_run(storage, training_run, depth_run):
    """A completed bayes_fusion fit_and_evaluate run (used by the main
    smoke and by collect_data, which replays a stored fitting run)."""
    result = _run_cli(
        "experiments.bayes_fusion",
        ["with"] + EVAL_DATA + [
         "net_config.num_units=4", "net_config.batchsize=2",
         "net_config.expert_model=fcn", "net_config.learning_rate=0.01",
         'net_config.prefixes={"rgb": "rgb", "depth": "depth"}',
         f'starting_weights={{"rgb": {training_run}, '
         f'"depth": {depth_run}}}'],
        storage, timeout=1800)
    assert "Evaluated Bayes Fusion" in result.stdout
    return max(int(d) for d in
               os.listdir(storage["EXPERIMENT_STORAGE_FOLDER"])
               if d.isdigit())


def test_bayes_fusion_cli(storage, bayes_fusion_run):
    """fit_and_evaluate: expert scoring -> confusion matrices -> fusion."""
    info = json.load(open(os.path.join(
        storage["EXPERIMENT_STORAGE_FOLDER"], str(bayes_fusion_run),
        "info.json")))
    assert set(info["measurements"]) == {"rgb", "depth", "fusion"}
    assert set(info["confusion_matrices"]) == {"rgb", "depth"}


def test_bayes_fusion_collect_data_cli(storage, bayes_fusion_run, tmp_path):
    """collect_data: replays a stored fitting experiment and dumps
    per-pixel fusion diagnostics (reference bayes_fusion.py:35-70)."""
    out = str(tmp_path / "collected")
    _run_cli("experiments.bayes_fusion",
             ["collect_data", "with",
              f"fitting_experiment={bayes_fusion_run}",
              f"output_path={out}"], storage, timeout=1800)
    dumped = {f: np.load(os.path.join(out, f))
              for f in ("predictions.npz", "probs.npz", "likelihoods.npz")}
    assert len(dumped["predictions.npz"].files) == 1
    # one probs + one likelihood dump per expert
    assert len(dumped["probs.npz"].files) == 2
    assert len(dumped["likelihoods.npz"].files) == 2
    pred = dumped["predictions.npz"]["arr_0"]
    prob = dumped["probs.npz"]["arr_0"]
    assert pred.shape == prob.shape[:3]


def test_dirichlet_test_parameters_cli(storage, training_run, depth_run):
    """test_parameters: the sigma/delta/beta grid reuses ONE sufficient
    statistic across configs (reference dirichlet_fusion.py:18-52)."""
    result = _run_cli(
        "experiments.dirichlet_fusion",
        ["test_parameters", "with"] + EVAL_DATA + [
         "net_config.num_units=4", "net_config.batchsize=2",
         "net_config.expert_model=fcn", "net_config.sigma=0.1",
         'net_config.prefixes={"rgb": "rgb", "depth": "depth"}',
         'search_parameters={"sigma": [0.1, 1.0]}',
         f'starting_weights={{"rgb": {training_run}, '
         f'"depth": {depth_run}}}'],
        storage, timeout=1800)
    del result
    run_id = max(int(d) for d in
                 os.listdir(storage["EXPERIMENT_STORAGE_FOLDER"])
                 if d.isdigit())
    info = json.load(open(os.path.join(
        storage["EXPERIMENT_STORAGE_FOLDER"], str(run_id), "info.json")))
    results = info["results"]
    assert list(results["sigma"]) == [0.1, 1.0]
    assert len(results["mean_IoU"]) == 2
    assert all(0 <= v <= 1 for v in results["mean_IoU"])


def test_evaluation_also_load_config_cli(storage, training_run):
    """also_load_config: the net config is inherited from the training
    record and merged with CLI overrides (reference evaluation.py:100-123)."""
    result = _run_cli(
        "experiments.evaluation",
        ["also_load_config", "with",
         "modelname=simple_fcn", f"starting_weights={training_run}",
         "evaluation_data.dataset=unittest",
         "evaluation_data.height=32", "evaluation_data.width=32",
         "evaluation_data.num_test=2",
         "net_config.batchsize=1"],  # CLI override on top of the record
        storage, timeout=1800)
    assert "Running with net_config" in result.stdout
    # inherited from the training run's record...
    assert "'num_units': 4" in result.stdout
    # ...merged with the CLI override
    assert "'batchsize': 1" in result.stdout
    assert "total accuracy" in result.stdout


def test_rerun_reproduces(storage, training_run):
    result = _run_cli("experiments.rerun",
                      ["with", f"experiment_id={training_run}"], storage)
    assert "Re-Run of experiment" in result.stdout
    assert "Training finished" in result.stdout
    # sacred seed semantics: the original run auto-generated a seed and
    # RECORDED it; the rerun replays the recorded config, so its child
    # run carries the same seed — global-rng consumers (host
    # augmentation) reproduce exactly (sacred/randomness.py behavior).
    folder = storage["EXPERIMENT_STORAGE_FOLDER"]
    original = json.load(open(
        os.path.join(folder, str(training_run), "config.json")))
    assert isinstance(original.get("seed"), int)
    child = max(int(d) for d in os.listdir(folder) if d.isdigit())
    replay = json.load(open(
        os.path.join(folder, str(child), "config.json")))
    assert replay["seed"] == original["seed"]


def test_grid_search_collects_lists():
    from experiments.different_evaluation_parameters import (
        grid_search, parameter_combinations)
    combos = parameter_combinations({"a": [1, 2], "b": [3, 4]}, {"c": 5})
    assert len(combos) == 4
    results = grid_search(lambda p: {"sum": p["a"] + p["b"]},
                          {"a": [1, 2]}, {"b": 10})
    assert results["sum"] == [11, 12]
    assert results["a"] == [1, 2]


def test_experiment_data_dump_and_zip(storage, training_run, tmp_path):
    env = dict(os.environ)
    env.update(storage)
    code = f"""
import os
os.environ.update({storage!r})
import modular_semantic_segmentation_tpu.settings as S
S.EXPERIMENT_STORAGE_FOLDER = {storage!r}["EXPERIMENT_STORAGE_FOLDER"]
from experiments.utils import ExperimentData
exp = ExperimentData({training_run})
out = exp.dump(os.path.join({str(tmp_path)!r}, "dumped"))
# zip back-read through the zip backend
import shutil
shutil.copy(out, os.path.join(S.EXPERIMENT_STORAGE_FOLDER, "999.zip"))
exp2 = ExperimentData(999)
assert exp2.get_record()["config"]["modelname"] == "simple_fcn"
print("ZIP_OK")
"""
    result = subprocess.run([sys.executable, "-c", code],
                            capture_output=True, text=True, cwd=REPO,
                            env=env, timeout=120)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "ZIP_OK" in result.stdout


def test_sacred_shim_parsing():
    from modular_semantic_segmentation_tpu.utils.sacred_shim import (
        _parse_value, _set_dotted, apply_backspaces_and_linefeeds)
    assert _parse_value("3") == 3
    assert _parse_value("false") is False
    assert _parse_value('{"a": 1}') == {"a": 1}
    cfg = {}
    _set_dotted(cfg, "a.b.c", 5)
    assert cfg == {"a": {"b": {"c": 5}}}
    assert apply_backspaces_and_linefeeds("abc\rdef") == "def"
    assert apply_backspaces_and_linefeeds("ab\bc") == "ac"


def test_uncertainty_eval_cli(storage, training_run):
    """measure command: NLL + uncertainty value distributions with a
    MC-dropout model warm-started from a training run."""
    result = _run_cli(
        "experiments.uncertainty_eval",
        ["measure", "with",
         "modelname=bayesian_fcn",
         f"starting_weights={training_run}",
         "dataset.name=unittest", "dataset.height=32", "dataset.width=32",
         "dataset.num_test=2",
         'uncertainty_metrics=["entropy", "variance"]',
         "net_config.prefix=rgb", "net_config.modality=rgb",
         "net_config.num_units=4", "net_config.batchsize=2",
         "net_config.num_samples=2", "net_config.dropout_rate=0.3"],
        storage, timeout=1200)
    run_dirs = sorted(int(d) for d in
                      os.listdir(storage["EXPERIMENT_STORAGE_FOLDER"])
                      if d.isdigit())
    info = json.load(open(os.path.join(
        storage["EXPERIMENT_STORAGE_FOLDER"], str(run_dirs[-1]),
        "info.json")))
    assert "nll" in info["measurements"]
    assert "entropy" in info["measurements"]
    del result


def test_finetuning_cli_rgb_to_depth(storage, training_run):
    """Cross-modal kernel surgery + retrain (reference finetuning.py)."""
    result = _run_cli(
        "experiments.finetuning",
        ["rgb_to_depth", "with",
         'starting_weights={"experiment_id": %d, "prefix": "rgb"}'
         % training_run,
         "num_iterations=2",
         "data_config.dataset=unittest", "data_config.height=32",
         "data_config.width=32", "data_config.num_train=6",
         "data_config.num_test=2",
         "net_config.prefix=rgb", "net_config.modality=depth",
         "net_config.num_units=4", "net_config.batchsize=2"],
        storage, timeout=1200)
    assert "Training finished" in result.stdout


def test_dirichlet_fusion_cli(storage, training_run):
    """fit_and_evaluate: EM fit on the measure split + counts.npz artifact
    (loadable later via measurement_exp)."""
    result = _run_cli(
        "experiments.dirichlet_fusion",
        ["with",
         "evaluation_data.dataset=unittest", "evaluation_data.height=32",
         "evaluation_data.width=32", "evaluation_data.num_train=6",
         "evaluation_data.num_measure=2", "evaluation_data.num_test=4",
         "net_config.num_units=4", "net_config.batchsize=2",
         "net_config.expert_model=fcn", "net_config.sigma=0.1",
         'net_config.prefixes={"rgb": "rgb", "depth": "depth"}',
         f"starting_weights={training_run}"],
        storage, timeout=1800)
    assert "Evaluated Dirichlet Fusion" in result.stdout
    run_id = max(int(d) for d in
                 os.listdir(storage["EXPERIMENT_STORAGE_FOLDER"])
                 if d.isdigit())
    run_dir = os.path.join(storage["EXPERIMENT_STORAGE_FOLDER"],
                           str(run_id))
    assert "counts.npz" in os.listdir(run_dir)
    counts = np.load(os.path.join(run_dir, "counts.npz"))
    assert set(counts.files) == {"rgb", "depth", "class_counts"}


def test_timing_cli_smoke(storage):
    """experiments.timing time_rgb_fcn at a tiny shape: the Table-V
    harness's config plumbing, model build, timer and record path all
    execute (no timing quality asserted at this size)."""
    result = _run_cli(
        "experiments.timing",
        ["time_rgb_fcn", "with", "num_units=2", "num_classes=3",
         "repetitions=2", "height=64", "width=64"],
        storage, timeout=1200)
    assert "s/frame pipelined" in result.stdout
    run_id = max(int(d) for d in
                 os.listdir(storage["EXPERIMENT_STORAGE_FOLDER"])
                 if d.isdigit())
    info = json.load(open(os.path.join(
        storage["EXPERIMENT_STORAGE_FOLDER"], str(run_id), "info.json")))
    assert "pipelined_mean_s" in info["timings"]["rgb_fcn"]


def test_timing_serving_cli_smoke(storage):
    """experiments.timing time_serving: the production serving-loop
    command (InferenceServer unroll-N group program) builds, runs and
    records per-frame serving numbers for a named model."""
    result = _run_cli(
        "experiments.timing",
        ["time_serving", "with", "model=fusion_fcn", "unroll=2",
         "num_units=2", "num_classes=3", "repetitions=4",
         "height=64", "width=64"],
        storage, timeout=1200)
    assert "serving (unroll=2)" in result.stdout
    run_id = max(int(d) for d in
                 os.listdir(storage["EXPERIMENT_STORAGE_FOLDER"])
                 if d.isdigit())
    info = json.load(open(os.path.join(
        storage["EXPERIMENT_STORAGE_FOLDER"], str(run_id), "info.json")))
    row = info["timings"]["serving_fusion_fcn"]
    assert row["unroll"] == 2
    assert row["serving_s_per_frame"] > 0
    assert row["serving_fps"] == pytest.approx(
        1.0 / row["serving_s_per_frame"])


@pytest.fixture(scope="module")
def mini_synthia_tree(tmp_path_factory):
    """Pre-resized 64x96 frames for EVERY synthia sequence (the resized_*
    layout Synthia._preprocessing produces — providing it directly skips
    the 1280x760 preprocessing; that path has its own test in
    test_synthia_sequence_drivers.py)."""
    import cv2
    from modular_semantic_segmentation_tpu.datasets.synthia import \
        AVAILABLE_SEQUENCES
    rng = np.random.RandomState(5)
    base = tmp_path_factory.mktemp("synthia_all")
    for seq in AVAILABLE_SEQUENCES:
        seq_base = base / seq
        names = ["000000", "000001", "000002"]
        for name in names:
            d = seq_base / "resized_rgb_F"
            os.makedirs(d, exist_ok=True)
            cv2.imwrite(str(d / f"{name}.png"),
                        rng.randint(0, 255, (64, 96, 3)).astype(np.uint8))
            d = seq_base / "resized_depth_F"
            os.makedirs(d, exist_ok=True)
            cv2.imwrite(str(d / f"{name}.png"),
                        rng.randint(0, 5000, (64, 96)).astype(np.uint16))
            d = seq_base / "resized_labels_F"
            os.makedirs(d, exist_ok=True)
            np.save(str(d / f"{name}.npy"),
                    rng.randint(0, 14, (64, 96)).astype(np.uint8))
        with open(seq_base / "train_test_split.json", "w") as f:
            json.dump({"trainset": names[:1], "testset": names[1:]}, f)
    return str(base)


def test_evaluation_all_synthia_cli(storage, training_run,
                                    mini_synthia_tree):
    """all_synthia: per-sequence evaluation over every synthia sequence
    (reference evaluation.py:42-55,126-134). Weights come from the
    unittest training run: matching layers load, the 14-class score conv
    is skipped with a warning (models/params.py import contract)."""
    result = _run_cli(
        "experiments.evaluation",
        ["all_synthia", "with",
         "modelname=simple_fcn", f"starting_weights={training_run}",
         "evaluation_data.dataset=synthia",
         f"evaluation_data.base_path={mini_synthia_tree}",
         "net_config.prefix=rgb", "net_config.modality=rgb",
         "net_config.num_units=4", "net_config.batchsize=2"],
        storage, timeout=1800)
    from modular_semantic_segmentation_tpu.datasets.synthia import \
        AVAILABLE_SEQUENCES
    for seq in AVAILABLE_SEQUENCES:
        assert f"Evaluated network on {seq}" in result.stdout
    run_id = max(int(d) for d in
                 os.listdir(storage["EXPERIMENT_STORAGE_FOLDER"])
                 if d.isdigit())
    info = json.load(open(os.path.join(
        storage["EXPERIMENT_STORAGE_FOLDER"], str(run_id), "info.json")))
    assert set(info["measurements"]) == set(AVAILABLE_SEQUENCES)
    assert all("mean_IoU" in m for m in info["measurements"].values())


def test_progressive_cli_smoke(storage, training_run):
    """train_and_evaluate_progressive rgb_to_depth: cross-modal kernel
    surgery on the stored rgb expert, then a progressive depth column
    with a frozen rgb lateral column trains and evaluates end to end
    (reference train_and_evaluate_progressive.py:56-93)."""
    result = _run_cli(
        "experiments.train_and_evaluate_progressive",
        ["rgb_to_depth", "with",
         'starting_weights={"experiment_id": %d}' % training_run,
         "num_iterations=2",
         "data_config.dataset=unittest", "data_config.height=32",
         "data_config.width=32", "data_config.num_train=6",
         "data_config.num_measure=2", "data_config.num_test=2",
         "net_config.prefix=depth", "net_config.modality=depth",
         'net_config.lateral_columns={"rgb": "rgb"}',
         "net_config.num_units=4", "net_config.batchsize=2",
         "net_config.learning_rate=0.01"],
        storage, timeout=1800)
    assert "Training finished" in result.stdout
    assert "Evaluated network" in result.stdout


def test_ibcc_fusion_cli_smoke(storage, training_run, tmp_path):
    """experiments.ibcc_fusion dumps per-expert predictions + ground truth
    for external IBCC analysis (reference ibcc_fusion.py — whose observer
    import had rotted in the reference; this locks ours)."""
    save_to = str(tmp_path / "ibcc_out")
    _run_cli(
        "experiments.ibcc_fusion",
        ["with"] + [
            "dataset.name=unittest", "dataset.height=32",
            "dataset.width=32", "dataset.num_train=6",
            "dataset.num_measure=2", "dataset.num_test=2",
            "net_config.num_units=4", "net_config.batchsize=2",
            "net_config.expert_model=simple_fcn",
            'net_config.prefixes={"rgb": "rgb"}',
            f'starting_weights={{"rgb": {training_run}}}',
            f"save_to={save_to}"],
        storage, timeout=1200)
    dumped = np.load(os.path.join(save_to, "predictions.npz"))
    assert set(dumped.files) == {"measure_rgb", "test_rgb",
                                 "measure_gt", "test_gt"}
    assert dumped["test_rgb"].shape == dumped["test_gt"].shape
