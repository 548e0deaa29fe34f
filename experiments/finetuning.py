"""Cross-modal transfer / finetuning (reference experiments/finetuning.py).

The first-layer kernel surgery: depth->rgb tiles the 1-channel kernel to 3
channels; rgb->depth averages the 3 channels (reference :40-50, :82-92).
"""

import tempfile
from copy import deepcopy
from os import path

import numpy as np

from modular_semantic_segmentation_tpu.utils.sacred_shim import Experiment
from modular_semantic_segmentation_tpu.models.simple_fcn import SimpleFCN
from modular_semantic_segmentation_tpu.datasets import get_dataset
from experiments.utils import ExperimentData, get_mongo_observer, load_data
from experiments.training import create_directories, train_network
from experiments.evaluation import evaluate, evaluate_on_all_synthia_seqs

ex = Experiment()
ex.observers.append(get_mongo_observer())


def get_all_sequence_validation_sets(data_config):
    """Validation sets of all synthia sequences for additional eval
    (reference finetuning.py:15-24)."""
    all_sequences = {}
    if data_config.get("dataset") == "synthia":
        from modular_semantic_segmentation_tpu.datasets.synthia import \
            AVAILABLE_SEQUENCES
        adapted_config = deepcopy(data_config)
        for sequence in AVAILABLE_SEQUENCES:
            adapted_config["seqs"] = [sequence]
            data = load_data(adapted_config)
            all_sequences[sequence] = data.get_validation_set(num_items=15)
    return all_sequences


def _load_experiment_weights(starting_weights):
    training_experiment = ExperimentData(starting_weights["experiment_id"])
    filename = next(
        artifact["name"]
        for artifact in training_experiment.get_record()["artifacts"]
        if "weights" in artifact["name"])
    weights_file = training_experiment.get_artifact(filename)
    return dict(np.load(weights_file))


def translate_depth_to_rgb(weights, prefix="depth"):
    """Tile the 1-channel first-layer kernel to 3 channels
    (reference finetuning.py:44-46)."""
    new_weights = dict(weights)
    key = f"{prefix}_conv1_1/kernel"
    if key not in new_weights:
        key = f"{prefix}/conv1_1/kernel"
    new_weights[key] = np.tile(weights[key], [1, 1, 3, 1])
    return new_weights


def translate_rgb_to_depth(weights, prefix="rgb"):
    """Average the 3-channel first-layer kernel down to 1 channel
    (reference finetuning.py:86-88)."""
    new_weights = dict(weights)
    key = f"{prefix}_conv1_1/kernel"
    if key not in new_weights:
        key = f"{prefix}/conv1_1/kernel"
    new_weights[key] = weights[key].mean(2, keepdims=True)
    return new_weights


def _finetune(net_config, data_config, num_iterations, starting_weights,
              translate, _run):
    output_dir = create_directories(_run._id, ex)
    weights = _load_experiment_weights(starting_weights)
    new_weights = translate(weights,
                            prefix=starting_weights.get("prefix",
                                                        "depth" if translate
                                                        is translate_depth_to_rgb
                                                        else "rgb"))
    tmp = path.join(tempfile.gettempdir(), "translated_weights.npz")
    np.savez(tmp, **new_weights)

    data_cls = get_dataset(data_config["dataset"])
    with SimpleFCN(data_description=data_cls.get_data_description(),
                   output_dir=output_dir, **net_config) as net:
        net.import_weights(tmp, warnings=False)
        data = load_data(data_config)
        train_network(net, output_dir, data, num_iterations,
                      starting_weights=False, experiment=ex,
                      additional_eval_data=get_all_sequence_validation_sets(
                          data_config))
        print("INFO: Evaluate the network against the training sequences")
        evaluate(net, data)
        if data_config.get("dataset") == "synthia":
            print("INFO: Evaluating against all sequences")
            _run.info["measurements"] = evaluate_on_all_synthia_seqs(
                net, data_config)


@ex.command
def depth_to_rgb(net_config, data_config, num_iterations, starting_weights,
                 _run):
    _finetune(net_config, data_config, num_iterations, starting_weights,
              translate_depth_to_rgb, _run)


@ex.command
def rgb_to_depth(net_config, data_config, num_iterations, starting_weights,
                 _run):
    _finetune(net_config, data_config, num_iterations, starting_weights,
              translate_rgb_to_depth, _run)


@ex.main
def train(net_config, data_config, num_iterations, starting_weights, _run):
    output_dir = create_directories(_run._id, ex)
    data_cls = get_dataset(data_config["dataset"])
    with SimpleFCN(data_description=data_cls.get_data_description(),
                   output_dir=output_dir, **net_config) as net:
        data = load_data(data_config)
        train_network(net, output_dir, data, num_iterations,
                      starting_weights=starting_weights, experiment=ex,
                      additional_eval_data=get_all_sequence_validation_sets(
                          data_config))
        evaluate(net, data)
        if data_config.get("dataset") == "synthia":
            _run.info["measurements"] = evaluate_on_all_synthia_seqs(
                net, data_config)


if __name__ == "__main__":
    ex.run_commandline()
