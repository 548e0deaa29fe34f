"""Reproduction entry: re-invoke a past run's recorded command with its
recorded config (reference experiments/rerun.py)."""

import sys

from modular_semantic_segmentation_tpu.utils.sacred_shim import (
    Experiment, apply_backspaces_and_linefeeds)
from experiments.utils import ExperimentData, get_observer

import experiments.bayes_fusion as bayes_fusion
import experiments.timing as timing
import experiments.training as training
import experiments.evaluation as evaluation
import experiments.different_evaluation_parameters as \
    different_evaluation_parameters
import experiments.dirichlet_fusion as dirichlet_fusion
import experiments.uncertainty_eval as uncertainty_eval
import experiments.report as report

module_mapper = {
    "report.py": report,
    "bayes_fusion.py": bayes_fusion,
    "timing.py": timing,
    "training.py": training,
    "evaluation.py": evaluation,
    "different_evaluation_parameters.py": different_evaluation_parameters,
    "dirichlet_fusion.py": dirichlet_fusion,
    "uncertainty_eval.py": uncertainty_eval,
}

ex = Experiment()
ex.captured_out_filter = apply_backspaces_and_linefeeds
ex.observers.append(get_observer())


@ex.main
def rerun(experiment_id, _run):
    old_run = ExperimentData(experiment_id).get_record()
    print('Re-Run of experiment "%s"' % old_run["experiment"]["name"])
    module = module_mapper[old_run["experiment"]["mainfile"]]
    command = old_run.get("command", "main")
    config = old_run["config"]
    return module.ex.run(command, config)


if __name__ == "__main__":
    ex.run_commandline()
    sys.stdout.flush()
