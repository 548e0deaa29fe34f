"""Main training entry point (reference experiments/training.py).

Usage: python -m experiments.training with config.yaml [key=value ...]
"""

import os
import shutil

from modular_semantic_segmentation_tpu.utils.sacred_shim import (
    Experiment, apply_backspaces_and_linefeeds)
from modular_semantic_segmentation_tpu.datasets import get_dataset
from modular_semantic_segmentation_tpu.models import get_model
from modular_semantic_segmentation_tpu.settings import EXP_OUT
from experiments.utils import data_description, get_observer
from experiments.evaluation import evaluate, import_weights_into_network


def create_directories(run_id, experiment):
    """Create a clean per-run output directory under EXP_OUT
    (reference training.py:13-40)."""
    root = EXP_OUT
    os.makedirs(root, exist_ok=True)
    output_dir = f"{root}/{run_id}"
    if os.path.exists(output_dir):
        shutil.rmtree(output_dir)
    os.mkdir(output_dir)
    experiment.info.setdefault("logdirs", []).append(output_dir)
    return output_dir


def train_network(net, output_dir, data, num_iterations, starting_weights,
                  experiment, additional_eval_data=None):
    """Optional warm start -> fit (KeyboardInterrupt-safe) -> export weights
    -> register artifacts (reference training.py:43-75)."""
    if starting_weights:
        import_weights_into_network(net, starting_weights)
    try:
        net.fit(data.get_trainset(), num_iterations,
                validation_dataset=data.get_validation_set(),
                additional_eval_datasets=additional_eval_data or {},
                output=False)
    except KeyboardInterrupt:
        print("WARNING: Got Keyboard Interrupt, will save weights and close")
    net.export_weights()
    for filename in os.listdir(output_dir):
        experiment.add_artifact(os.path.join(output_dir, filename))


ex = Experiment()
ex.captured_out_filter = apply_backspaces_and_linefeeds
ex.observers.append(get_observer())


@ex.capture
def train_and_evaluate(net, output_dir, data, num_iterations,
                       starting_weights, _run):
    train_network(net, output_dir, data, num_iterations, starting_weights,
                  ex)
    measurements, _ = evaluate(net, data)
    _run.info["measurements"] = measurements


def _find_checkpoint(exp_data, run_id):
    """Latest checkpoint of a run: the stored checkpoint.pkl artifact if
    the run finished (or was Ctrl-C'd), else the run's live output dir
    under EXP_OUT — the location a run killed mid-fit (OOM, preemption,
    SIGKILL) leaves its periodic checkpoints in, since artifacts are
    only registered after fit returns."""
    try:
        checkpoint = exp_data.get_artifact("checkpoint.pkl")
    except UserWarning:
        checkpoint = None
    if checkpoint is None:
        candidate = os.path.join(EXP_OUT, str(run_id), "checkpoint.pkl")
        return candidate if os.path.exists(candidate) else None
    if hasattr(checkpoint, "read"):
        # zip-backend artifact: materialize to a temp file for
        # Estimator.load_weights (which takes a path)
        import tempfile

        tmp = tempfile.NamedTemporaryFile(suffix=".pkl", delete=False)
        tmp.write(checkpoint.read())
        tmp.close()
        return tmp.name
    return checkpoint


@ex.command
def resume(experiment_id, _run, num_iterations=None):
    """Resume an interrupted training run from its periodic checkpoint.

    Usage::

        python -m experiments.training resume with experiment_id=12

    Restores the latest ``checkpoint.pkl`` (weights + optimizer state +
    step — written every ``net_config.checkpoint_interval`` steps) and
    continues training for the remaining iterations in a NEW run
    directory; the original record stays immutable. Works for runs that
    crashed mid-fit (the observer writes the record skeleton at run
    start, and the checkpoint is picked up from the run's EXP_OUT dir if
    it was never registered as an artifact) and for resuming a resume
    (the experiment chain is followed back to the original training
    config). Completes the failure-recovery loop the reference lacks
    entirely (SURVEY.md §5: its only recovery is KeyboardInterrupt ->
    save weights, reference training.py:63-68). ``num_iterations``
    optionally overrides the original target step count.
    """
    from experiments.utils import ExperimentData

    # walk the resume chain: take the checkpoint from the NEWEST run in
    # the chain that has one, and the model/dataset config + iteration
    # target from the original training run
    run_id = int(experiment_id)
    total = num_iterations
    checkpoint, checkpoint_of = None, None
    seen = set()
    while True:
        if run_id in seen:
            raise UserWarning(f"resume chain loops at run {run_id}")
        seen.add(run_id)
        record = ExperimentData(run_id).get_record()
        cfg = record["config"]
        if checkpoint is None:
            checkpoint = _find_checkpoint(ExperimentData(run_id), run_id)
            checkpoint_of = run_id
        if total is None and "num_iterations" in cfg:
            total = cfg["num_iterations"]
        if "modelname" in cfg:
            break  # the original training run
        run_id = int(cfg["experiment_id"])  # a resume run: follow back
    if checkpoint is None:
        raise UserWarning(
            f"no checkpoint.pkl found for run {experiment_id} (set "
            "net_config.checkpoint_interval when training)")
    total = int(total)

    output_dir = create_directories(_run._id, ex)
    data_cls = get_dataset(cfg["dataset"]["name"])
    model = get_model(cfg["modelname"])
    with model(data_description=data_description(cfg["dataset"]),
               output_dir=output_dir, **cfg["net_config"]) as net:
        data = data_cls(**{k: v for k, v in cfg["dataset"].items()
                           if k != "name"})
        net.load_weights(checkpoint)
        remaining = max(total - net.global_step, 0)
        print(f"INFO: resuming run {checkpoint_of} at step "
              f"{net.global_step}; {remaining} iterations remaining")
        train_and_evaluate(net, output_dir, data,
                           num_iterations=remaining,
                           starting_weights=None)


@ex.main
def main(modelname, dataset, net_config, _run):
    output_dir = create_directories(_run._id, ex)
    data_cls = get_dataset(dataset["name"])
    model = get_model(modelname)
    with model(data_description=data_description(dataset),
               output_dir=output_dir, **net_config) as net:
        data = data_cls(**{k: v for k, v in dataset.items() if k != "name"})
        train_and_evaluate(net, output_dir, data)


if __name__ == "__main__":
    ex.run_commandline()
