"""Generic grid search over network parameters
(reference experiments/different_evaluation_parameters.py)."""

from copy import deepcopy

from tqdm import tqdm

from modular_semantic_segmentation_tpu.utils.sacred_shim import Experiment
from modular_semantic_segmentation_tpu.models import get_model
from modular_semantic_segmentation_tpu.datasets import get_dataset
from experiments.utils import data_description as describe_data
from experiments.utils import get_observer, load_data
from experiments.evaluation import evaluate, import_weights_into_network


def parameter_combinations(search_parameters, net_config):
    """Cartesian expansion of search parameters over a base config
    (reference :10-24)."""
    configs_to_test = [net_config]
    for parameter, values in search_parameters.items():
        new_configs = []
        for config in configs_to_test:
            for value in values:
                new_config = deepcopy(config)
                new_config[parameter] = value
                new_configs.append(new_config)
        configs_to_test = new_configs
    return configs_to_test


def grid_search(evaluation, search_parameters, net_config):
    """Run ``evaluation`` on every parameter combination, collecting nested
    result dicts into lists (reference :27-61)."""
    configs_to_test = parameter_combinations(search_parameters, net_config)
    results = {}
    for test_parameters in tqdm(configs_to_test, ascii=True):
        for key in test_parameters:
            results.setdefault(key, []).append(test_parameters[key])
        result = evaluation(test_parameters)

        def append_deep_value(add_to, val):
            for key, inner_val in val.items():
                if isinstance(inner_val, dict):
                    append_deep_value(add_to.setdefault(key, {}), inner_val)
                else:
                    add_to.setdefault(key, []).append(inner_val)
        append_deep_value(results, result)
    return results


ex = Experiment()
ex.observers.append(get_observer())


@ex.main
def main(starting_weights, modelname, net_config, evaluation_data,
         search_parameters, _run):
    model = get_model(modelname)
    description = describe_data(evaluation_data)

    def evaluation(parameters):
        with model(data_description=description, **parameters) as net:
            import_weights_into_network(net, starting_weights)
            measurements, _ = evaluate(net, load_data(evaluation_data))
        return measurements

    _run.info["results"] = grid_search(evaluation, search_parameters,
                                       net_config)


if __name__ == "__main__":
    ex.run_commandline()
