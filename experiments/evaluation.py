"""Evaluation of trained models (reference experiments/evaluation.py)."""

import os
from copy import deepcopy
from sys import stdout

from modular_semantic_segmentation_tpu.utils.sacred_shim import (
    Experiment, apply_backspaces_and_linefeeds)
from modular_semantic_segmentation_tpu.models import get_model
from modular_semantic_segmentation_tpu.datasets import get_dataset
from modular_semantic_segmentation_tpu.settings import DATA_BASEPATH
from experiments.utils import (ExperimentData, data_description,
                               get_observer, load_data)


def evaluate(net, data, print_results=True):
    """Score the network on the dataset's testset and pretty-print per-class
    results (reference evaluation.py:14-39)."""
    measures, confusion_matrix = net.score(data.get_testset())
    if print_results:
        print("Evaluated network on %s:" % type(data).__name__)
        print("total accuracy {:.3f} mean F1 {:.3f} IoU {:.3f}".format(
            measures["total_accuracy"], measures["mean_F1"],
            measures["mean_IoU"]))
        for label in sorted(data.labelinfo):
            if label >= len(measures["precision"]):
                continue
            print("{:>15}: {:.2f} precision, {:.2f} recall, {:.2f} IoU"
                  .format(data.labelinfo[label]["name"],
                          measures["precision"][label],
                          measures["recall"][label],
                          measures["IoU"][label]))
        stdout.flush()
    return measures, confusion_matrix


def evaluate_on_all_synthia_seqs(net, data_config):
    """Evaluate a network on every synthia sequence individually
    (reference evaluation.py:42-55)."""
    from modular_semantic_segmentation_tpu.datasets.synthia import \
        AVAILABLE_SEQUENCES
    adapted_config = deepcopy(data_config)
    all_measurements = {}
    for sequence in AVAILABLE_SEQUENCES:
        adapted_config["seqs"] = [sequence]
        data = load_data(adapted_config)
        measurements, _ = evaluate(net, data, print_results=False)
        print("Evaluated network on {}: {:.2f} IoU".format(
            sequence, measurements["mean_IoU"]))
        all_measurements[sequence] = measurements
    stdout.flush()
    return all_measurements


def import_weights_into_network(net, starting_weights, **kwargs):
    """Resolve starting-weights descriptors and import
    (reference evaluation.py:58-91):
        * special tokens 'paul_adapnet' / 'imagenet_adapnet' -> npz files in
          DATA_BASEPATH,
        * experiment ids -> that run's weights artifact,
        * file paths -> imported directly,
        * dict {prefix: descriptor} -> per-expert import with prefix
          translation; list -> sequential imports.
    """
    def import_one(description, prefix=False):
        # chill_mode here only relaxes warnings; shape-mismatched weights
        # are skipped, never force-assigned (see models/params.py
        # import_weights docstring for the documented deviation from the
        # reference's chill-mode assignment attempt, base_model.py:438-445).
        if description == "paul_adapnet":
            net.import_weights(
                os.path.join(DATA_BASEPATH, "Adapnet_weights_160000.npz"),
                chill_mode=True, translate_prefix=prefix, **kwargs)
            return
        if description == "imagenet_adapnet":
            net.import_weights(
                os.path.join(DATA_BASEPATH, "resnet50_imagenet.npz"),
                chill_mode=True, translate_prefix=prefix, **kwargs)
            return
        if isinstance(description, str) and os.path.exists(description):
            net.import_weights(description, translate_prefix=prefix,
                               **kwargs)
            return
        training_experiment = ExperimentData(description)
        net.import_weights(training_experiment.get_weights(),
                           translate_prefix=prefix, **kwargs)

    if isinstance(starting_weights, list):
        for description in starting_weights:
            import_one(description)
    elif isinstance(starting_weights, dict):
        for prefix, description in starting_weights.items():
            import_one(description, prefix=prefix)
    else:
        import_one(starting_weights)


ex = Experiment()
ex.captured_out_filter = apply_backspaces_and_linefeeds
ex.observers.append(get_observer())


@ex.command
def also_load_config(modelname, net_config, evaluation_data,
                     starting_weights, _run):
    """Inherit the full net config from the training experiment
    (reference evaluation.py:100-123)."""
    training_experiment = ExperimentData(starting_weights)
    model_config = training_experiment.get_record()["config"]["net_config"]
    model_config.update(net_config)
    print("Running with net_config:")
    print(model_config)
    data_cls = get_dataset(evaluation_data["dataset"])
    model = get_model(modelname)
    with model(data_description=data_description(evaluation_data),
               **model_config) as net:
        import_weights_into_network(net, starting_weights)
        data = load_data(evaluation_data)
        measurements, confusion_matrix = evaluate(net, data)
        _run.info["measurements"] = measurements
        _run.info["confusion_matrix"] = confusion_matrix


@ex.command
def all_synthia(modelname, net_config, evaluation_data, starting_weights,
                _run):
    data_cls = get_dataset(evaluation_data["dataset"])
    model = get_model(modelname)
    with model(data_description=data_description(evaluation_data),
               **net_config) as net:
        import_weights_into_network(net, starting_weights)
        measurements = evaluate_on_all_synthia_seqs(net, evaluation_data)
        _run.info["measurements"] = measurements


@ex.main
def main(modelname, net_config, evaluation_data, starting_weights, _run,
         quantized_serving=False):
    """Evaluate; ``with quantized_serving=True`` calibrates int8 PTQ
    scales on the measure set first (models/quantize.py) and scores the
    test set through the int8 serving path. Pass an integer instead of
    True to override the minimum-input-channel eligibility threshold
    (default 128, the measured break-even — docs/TIMING.md)."""
    data_cls = get_dataset(evaluation_data["dataset"])
    model = get_model(modelname)
    with model(data_description=data_description(evaluation_data),
               **net_config) as net:
        import_weights_into_network(net, starting_weights)
        data = load_data(evaluation_data)
        if quantized_serving:
            min_ch = (int(quantized_serving)
                      if not isinstance(quantized_serving, bool) else 128)
            scales = net.quantize_for_serving(data.get_measureset(),
                                              min_channels=min_ch)
            _run.info["quantization_scales"] = scales
        measurements, confusion_matrix = evaluate(net, data)
        _run.info["measurements"] = measurements
        _run.info["confusion_matrix"] = confusion_matrix


if __name__ == "__main__":
    ex.run_commandline()
