"""Progressive-FCN training
(reference experiments/train_and_evaluate_progressive.py; the model class
is resurrected in modular_semantic_segmentation_tpu/models/progressive_fcn.py)."""

import tempfile
from os import path

import numpy as np

from modular_semantic_segmentation_tpu.utils.sacred_shim import Experiment
from modular_semantic_segmentation_tpu.models.progressive_fcn import \
    ProgressiveFCN
from modular_semantic_segmentation_tpu.datasets import get_dataset
from experiments.utils import get_mongo_observer, load_data
from experiments.training import create_directories, train_network
from experiments.evaluation import evaluate, evaluate_on_all_synthia_seqs
from experiments.finetuning import (
    _load_experiment_weights, get_all_sequence_validation_sets,
    translate_depth_to_rgb, translate_rgb_to_depth)

ex = Experiment()
ex.observers.append(get_mongo_observer())


def _run_progressive(net_config, data_config, num_iterations,
                     starting_weights, translate, _run):
    output_dir = create_directories(_run._id, ex)
    data_cls = get_dataset(data_config["dataset"])

    imports = starting_weights
    if translate is not None:
        weights = _load_experiment_weights(starting_weights)
        new_weights = translate(weights,
                                prefix=starting_weights.get("prefix"))
        tmp = path.join(tempfile.gettempdir(),
                        "translated_progressive_weights.npz")
        np.savez(tmp, **new_weights)
        imports = tmp

    with ProgressiveFCN(data_description=data_cls.get_data_description(),
                        output_dir=output_dir, **net_config) as net:
        data = load_data(data_config)
        train_network(net, output_dir, data, num_iterations,
                      starting_weights=imports, experiment=ex,
                      additional_eval_data=get_all_sequence_validation_sets(
                          data_config))
        print("INFO: Evaluate the network against the training sequences")
        evaluate(net, data)
        if data_config.get("dataset") == "synthia":
            print("INFO: Evaluating against all sequences")
            _run.info["measurements"] = evaluate_on_all_synthia_seqs(
                net, data_config)


@ex.command
def depth_to_rgb(net_config, data_config, starting_weights, num_iterations,
                 _run):
    """Progressive transfer: existing depth column + new RGB column
    (reference train_and_evaluate_progressive.py:15-53)."""
    _run_progressive(net_config, data_config, num_iterations,
                     dict(starting_weights, prefix="depth"),
                     translate_depth_to_rgb, _run)


@ex.command
def rgb_to_depth(net_config, data_config, starting_weights, num_iterations,
                 _run):
    """Progressive transfer: existing RGB column + new depth column
    (reference train_and_evaluate_progressive.py:56-93)."""
    _run_progressive(net_config, data_config, num_iterations,
                     dict(starting_weights, prefix="rgb"),
                     translate_rgb_to_depth, _run)


@ex.main
def main(net_config, data_config, starting_weights, num_iterations, _run):
    _run_progressive(net_config, data_config, num_iterations,
                     starting_weights, None, _run)


if __name__ == "__main__":
    ex.run_commandline()
