"""Dirichlet-fusion fitting + evaluation
(reference experiments/dirichlet_fusion.py)."""

from sys import stdout

import numpy as np
from sklearn.model_selection import train_test_split

from modular_semantic_segmentation_tpu.utils.sacred_shim import (
    Experiment, apply_backspaces_and_linefeeds)
from modular_semantic_segmentation_tpu.models.dirichlet_fusion import \
    DirichletFusion
from modular_semantic_segmentation_tpu.datasets import get_dataset
from modular_semantic_segmentation_tpu.datasets.data_baseclass import \
    DataSource
from experiments.utils import data_description as describe_data
from experiments.utils import get_observer
from experiments.evaluation import import_weights_into_network
from experiments.different_evaluation_parameters import \
    parameter_combinations
from experiments.bayes_fusion import split_test_data

ex = Experiment()
ex.captured_out_filter = apply_backspaces_and_linefeeds
ex.observers.append(get_observer())


@ex.command
def test_parameters(net_config, evaluation_data, starting_weights,
                    search_parameters, _run):
    """Sigma/delta/beta grid search reusing ONE sufficient statistic across
    configs (reference dirichlet_fusion.py:18-52)."""
    configs_to_test = parameter_combinations(search_parameters, net_config)
    data, _, _ = split_test_data(evaluation_data)
    description = describe_data(evaluation_data)
    search_data, search_validation = train_test_split(
        data.measureset, test_size=0.5, random_state=1)

    with DirichletFusion(data_description=description,
                         **configs_to_test[0]) as net:
        import_weights_into_network(net, starting_weights)
        sufficient_statistic = net._get_sufficient_statistic(
            DataSource(data, search_data))

    results = []
    for test_config in configs_to_test:
        with DirichletFusion(data_description=description,
                             **test_config) as net:
            import_weights_into_network(net, starting_weights)
            net._fit_sufficient_statistic(*sufficient_statistic)
            measurements, _ = net.score(DataSource(data, search_validation))
            result = dict(test_config)
            result.update(measurements)
            results.append(result)
    _run.info["results"] = dict(
        zip(results[0], zip(*[r.values() for r in results])))


@ex.main
def fit_and_evaluate(net_config, evaluation_data, starting_weights, _run):
    """Import weights -> EM fit on the measure set -> score the test set
    (reference dirichlet_fusion.py:55-78). No weight re-import needed —
    fit() does not rebuild any graph here."""
    data, measure_set, test_set = split_test_data(evaluation_data)
    description = describe_data(evaluation_data)

    with DirichletFusion(data_description=description,
                         **net_config) as net:
        import_weights_into_network(net, starting_weights)
        dirichlet_params = net.fit(DataSource(data, measure_set))
        measurements, confusion_matrix = net.score(
            DataSource(data, test_set))
        _run.info["measurements"] = measurements
        _run.info["confusion_matrix"] = confusion_matrix
        _run.info["dirichlet_params"] = dirichlet_params
        # persist the fitted parameters as the counts.npz artifact other
        # runs can load via measurement_exp (reference
        # uncertainty_dirichlet_mix.py:370-372, dirichlet_mix.py:65-73)
        import tempfile
        from os import path as _path
        counts_file = _path.join(tempfile.gettempdir(), "counts.npz")
        np.savez(counts_file, **{k: np.asarray(v)
                                 for k, v in dirichlet_params.items()})
        ex.add_artifact(counts_file, "counts.npz")

    print("Evaluated Dirichlet Fusion on {} data:".format(
        evaluation_data["dataset"]))
    print("total accuracy {:.3f} IoU {:.3f}".format(
        measurements["total_accuracy"], measurements["mean_IoU"]))
    stdout.flush()


if __name__ == "__main__":
    ex.run_commandline()
