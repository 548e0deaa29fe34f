"""Uncertainty benchmarks (reference experiments/uncertainty_eval.py):
AUROC for misclassification / out-of-distribution detection, NLL + value
distributions, temperature-scaling grid, ambiguous-label training."""

import os
from sys import stdout

import numpy as np

from modular_semantic_segmentation_tpu.utils.sacred_shim import (
    Experiment, apply_backspaces_and_linefeeds)
from modular_semantic_segmentation_tpu.models import get_model
from modular_semantic_segmentation_tpu.datasets import get_dataset
from experiments.utils import ExperimentData, get_mongo_observer
from experiments.evaluation import import_weights_into_network
from experiments.different_evaluation_parameters import grid_search
from experiments.training import create_directories, train_network


def evaluate_uncertainty(net, data, metric, benchmark="misclassification",
                         print_results=True):
    """(reference uncertainty_eval.py:18-32)"""
    if benchmark == "misclassification":
        fpr, tpr, auroc, thresholds = net.misclassification_detection_score(
            data, metric)
    elif benchmark == "out_of_distribution":
        fpr, tpr, auroc, thresholds = \
            net.out_of_distribution_detection_score(data, metric)
    else:
        raise AssertionError(f"unknown benchmark {benchmark}")
    if print_results:
        print('Uncertainty Benchmark "{}" of {} on {} with {} metric'.format(
            benchmark, net.name, type(data).__name__, metric))
        print("AUROC {:.3f}".format(auroc))
        stdout.flush()
    return {"TPR": tpr, "FPR": fpr, "AUROC": auroc,
            "thresholds": thresholds}


def measure_metrics(net, data, metrics, label_flip=None):
    """(reference uncertainty_eval.py:35-52)"""
    nll, class_count = net.nll_score(data)
    ret = {"nll": nll, "class_counts": class_count}
    for metric in metrics:
        ret[metric] = net.value_distribution(data, metric)
    if label_flip:
        prior = np.zeros(net.config["num_classes"])
        prior[label_flip[0]] = 1 - label_flip[2]
        prior[label_flip[1]] = label_flip[2]
        ret["distribution_miscalibration"] = net.mean_diff(
            data, prior,
            condition=lambda t, c: np.logical_or(c == label_flip[0],
                                                 c == label_flip[1]))
    dirichlet, mean = net.prob_distribution(data)
    ret["dirichlet_priors"] = dirichlet
    ret["mean_output"] = mean
    return ret


ex = Experiment()
ex.captured_out_filter = apply_backspaces_and_linefeeds
ex.observers.append(get_mongo_observer())


@ex.command
def evaluate_temperature_scaling(experiments, temperatures, _run):
    """(reference uncertainty_eval.py:61-88)"""
    for exp_id in experiments:
        exp = ExperimentData(exp_id)
        record = exp.get_record()
        dataset = record["info"]["dataset"]
        data_cls = get_dataset(dataset["name"])
        data_description = list(data_cls.get_data_description())
        if record["config"].get("method") == "new_class":
            data_description[2] += 1
        model = get_model(record["config"]["modelname"])
        label_flip = dataset.get("augmentation", {}).get("label_flip")

        def evaluation(parameters):
            with model(data_description=data_description,
                       **parameters) as net:
                import_weights_into_network(net, exp_id)
                params = {k: v for k, v in dataset.items() if k != "name"}
                return measure_metrics(
                    net, data_cls(**params).get_testset(),
                    record["config"]["uncertainty_metrics"],
                    label_flip=label_flip)

        result = grid_search(evaluation,
                             {"temperature_scaling": temperatures},
                             record["config"]["net_config"])
        info = record["info"]
        info["temperature_grid_search"] = result
        exp.update_record({"info": info})


@ex.command
def uncertainty_parameter_search(modelname, net_config, dataset,
                                 starting_weights, search_parameters,
                                 benchmark, uncertainty_metrics, _run):
    """(reference uncertainty_eval.py:91-106)"""
    model = get_model(modelname)
    data_cls = get_dataset(dataset["name"])

    def evaluation(parameters):
        with model(data_description=data_cls.get_data_description(),
                   **parameters) as net:
            params = {k: v for k, v in dataset.items() if k != "name"}
            measure_set = data_cls(**params).get_measureset()
            import_weights_into_network(net, starting_weights)
            return {metric: evaluate_uncertainty(net, measure_set, metric,
                                                 benchmark=benchmark,
                                                 print_results=False)
                    for metric in uncertainty_metrics}

    _run.info["results"] = grid_search(evaluation, search_parameters,
                                       net_config)


@ex.command
def train_ambiguous(modelname, net_config, dataset, starting_weights,
                    method, num_iterations, uncertainty_metrics, _run):
    """Train with artificially ambiguous labels
    (reference uncertainty_eval.py:109-154)."""
    output_dir = create_directories(_run._id, ex)
    data_cls = get_dataset(dataset["name"])
    data_description = list(data_cls.get_data_description())
    num_classes = data_description[2]

    args = False
    if isinstance(method, list):
        args = method[1:]
        method = method[0]
    if method == "flip_classes":
        classes = np.random.choice(list(range(num_classes)), size=2,
                                   replace=False)
        dataset.setdefault("augmentation", {})["label_flip"] = (
            int(classes[0]), int(classes[1]), float(np.random.rand()))
    elif method == "new_class":
        data_description[2] = num_classes + 1
        old_class = int(args[0]) if args else int(
            np.random.choice(list(range(num_classes))))
        dataset.setdefault("augmentation", {})["label_flip"] = (
            old_class, num_classes, float(np.random.rand()))
    elif method == "merge":
        classes = np.random.choice(list(range(num_classes)), size=2,
                                   replace=False)
        dataset.setdefault("augmentation", {})["label_merge"] = (
            int(classes[0]), int(classes[1]))
    _run.info.setdefault("dataset", {}).update(dataset)

    model = get_model(modelname)
    with model(data_description=tuple(data_description),
               output_dir=output_dir, **net_config) as net:
        params = {k: v for k, v in dataset.items() if k != "name"}
        data = data_cls(**params)
        train_network(net, output_dir, data, num_iterations,
                      starting_weights, ex)
        _run.info["measurements"] = measure_metrics(
            net, data.get_testset(), uncertainty_metrics,
            label_flip=dataset["augmentation"].get("label_flip"))


@ex.command
def measure(modelname, net_config, dataset, starting_weights,
            uncertainty_metrics, _run):
    """(reference uncertainty_eval.py:157-168)"""
    model = get_model(modelname)
    data_cls = get_dataset(dataset["name"])
    data_description = list(data_cls.get_data_description())
    if "num_classes" in dataset:
        data_description[2] = dataset["num_classes"]
    with model(data_description=tuple(data_description),
               **net_config) as net:
        params = {k: v for k, v in dataset.items() if k != "name"}
        data = data_cls(**params)
        import_weights_into_network(net, starting_weights)
        _run.info["measurements"] = measure_metrics(
            net, data.get_testset(), uncertainty_metrics)


@ex.main
def uncertainty_benchmark(modelname, net_config, dataset, starting_weights,
                          benchmark, uncertainty_metrics, _run):
    """(reference uncertainty_eval.py:171-182)

    ``dataset.num_classes`` overrides the class count like the `measure`
    command: the out_of_distribution benchmark runs a model TRAINED on K
    classes over an OOD dataset whose labels are the in(0)/out(1) mask
    (datasets/not_cityscapes.py) — the model must be built with its
    trained K, and the OOD scorer uses the labels only as a mask."""
    model = get_model(modelname)
    data_cls = get_dataset(dataset["name"])
    data_description = list(data_cls.get_data_description())
    if "num_classes" in dataset:
        data_description[2] = dataset["num_classes"]
    with model(data_description=tuple(data_description),
               **net_config) as net:
        params = {k: v for k, v in dataset.items() if k != "name"}
        data = data_cls(**params)
        import_weights_into_network(net, starting_weights)
        for metric in uncertainty_metrics:
            measurements = evaluate_uncertainty(net, data.get_testset(),
                                                metric, benchmark=benchmark)
            _run.info.setdefault("measurements", {})[metric] = measurements


if __name__ == "__main__":
    ex.run_commandline()
