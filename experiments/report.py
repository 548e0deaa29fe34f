"""Rebuild the paper's tables from stored experiment records (the L5
reproduction layer).

The reference reproduces its IROS 2018 tables in notebooks that replay
stored sacred runs (`Synthia Rand Cityscapes Examples.ipynb` cells 15-21,
`Cityscapes.ipynb` cell 19, `Inference Time.ipynb` cells 4-7). This module
is the CLI equivalent: point it at experiment ids in
EXPERIMENT_STORAGE_FOLDER and it emits the per-class IoU tables
(Tables I-IV), the quality summary and the timing table (Table V) in
BASELINE.md format.

    python -m experiments.report with 'experiments={"bayes": 2, "average": 3}'
    python -m experiments.report timing_table with experiment_id=4
"""

import sys

import numpy as np
import pandas as pd

from modular_semantic_segmentation_tpu.utils.sacred_shim import (
    Experiment, apply_backspaces_and_linefeeds)
from experiments.utils import (ExperimentData, get_observer,
                               reverse_convert_datatypes)

ex = Experiment()
ex.captured_out_filter = apply_backspaces_and_linefeeds
ex.observers.append(get_observer())

# column order of the paper tables (reference Synthia nb cell 15)
TABLE_COLUMN_ORDER = ["Fusion_Fcn", "Dirichlet", "Bayes", "Average",
                      "Variance", "RGB", "Depth"]

# reference GTX 1080 Ti timings, paper Table V (BASELINE.md), keyed by
# the names experiments/timing.py stores in info["timings"]
REFERENCE_TIMINGS_S = {
    "rgb_fcn": 0.0219, "depth_fcn": 0.0218, "average_fcn": 0.0432,
    "bayes_fcn": 0.0461, "bayes_lookup_fcn": 0.0461,
    "dirichlet_fcn": 0.0517, "fusion_fcn": 0.0720,
    "variance_fcn": 0.3064,
}


def _column_title(key):
    return {"rgb": "RGB", "depth": "Depth",
            "fusion_fcn": "Fusion_Fcn"}.get(key.lower(), key.title())


def build_quality_table(experiments, class_names=None):
    """Per-class IoU table + void-excluded mean row from stored runs.

    Args:
        experiments: dict column-name -> experiment id. A fusion run whose
            measurements contain a 'fusion' entry (bayes_fusion
            fit_and_evaluate) also contributes its per-expert baselines,
            exactly as the reference's print_tables does (Synthia nb cell
            15).
        class_names: optional list of row labels (dataset labelinfo order).
    Returns:
        pandas.DataFrame with a 'mean' first row (class 0 = void excluded
        from the mean, reference base_model.py:324-329).
    """
    table = {}
    for key, experiment_id in experiments.items():
        info = ExperimentData(experiment_id).get_record()["info"]
        measurements = reverse_convert_datatypes(info["measurements"])
        if "fusion" in measurements:
            table[_column_title(key)] = np.asarray(
                measurements["fusion"]["IoU"])
            for modality, m in measurements.items():
                if modality != "fusion":
                    table[_column_title(modality)] = np.asarray(m["IoU"])
        else:
            table[_column_title(key)] = np.asarray(measurements["IoU"])

    num_classes = len(next(iter(table.values())))
    index = (list(class_names) if class_names is not None
             else [f"class_{i}" for i in range(num_classes)])
    classes = pd.DataFrame(table, index=index)
    mean = pd.DataFrame({col: classes[col].iloc[1:].mean()
                         for col in classes.columns}, index=["mean"])
    ordered = [c for c in TABLE_COLUMN_ORDER if c in classes.columns]
    ordered += [c for c in classes.columns if c not in ordered]
    return pd.concat([mean, classes])[ordered]


def build_timing_table(experiment_id):
    """Table V (inference timing) from a stored `experiments.timing` run,
    with the reference's GTX 1080 Ti numbers as the comparison column."""
    info = ExperimentData(experiment_id).get_record()["info"]
    timings = reverse_convert_datatypes(info["timings"])
    rows = {}
    for name, result in timings.items():
        spf = result.get("pipelined_mean_s", result.get("sync_mean_s"))
        if spf is None:
            continue  # e.g. train_step records (s_per_step, not per-frame)
        row = {
            "s/frame": spf,
            "fps": 1.0 / spf,
            "sync s/frame": result.get("sync_mean_s", float("nan")),
            "±std": result.get("sync_std_s", float("nan")),
        }
        ref = REFERENCE_TIMINGS_S.get(name)
        if ref is not None:
            row["reference s/frame"] = ref
            row["speedup"] = ref / spf
        rows[name] = row
    return pd.DataFrame(rows).T


def _resolve_class_names(experiments, evaluation_data):
    """Row labels from an explicit dataset config or the first run's
    recorded one; falls back to numeric labels if the dataset cannot be
    constructed (e.g. data not on disk)."""
    candidates = []
    if evaluation_data:
        candidates.append(evaluation_data)
    for experiment_id in experiments.values():
        config = ExperimentData(experiment_id).get_record()["config"]
        recorded = config.get("evaluation_data") or config.get("dataset")
        if recorded:
            candidates.append(recorded)
            break
    for data_config in candidates:
        try:
            from experiments.utils import load_data
            data = load_data(data_config)
            return [info["name"] for info in data.labelinfo.values()]
        except Exception as err:  # data folder absent etc.
            print(f"could not load dataset for class names ({err}); "
                  "falling back")
    return None


@ex.command
def timing_table(experiment_id, _run):
    table = build_timing_table(experiment_id)
    pd.set_option("display.precision", 4)
    print(table.to_string())
    _run.info["table"] = {c: table[c].to_dict() for c in table.columns}
    sys.stdout.flush()


@ex.main
def quality(experiments, _run, evaluation_data=None):
    """Rebuild a quality table (Tables I-IV style) from run ids.

    `experiments` maps column names to experiment ids, e.g.
    with 'experiments={"bayes": 2, "dirichlet": 5, "average": 7}'.
    """
    class_names = _resolve_class_names(experiments, evaluation_data)
    table = build_quality_table(experiments, class_names)
    pd.set_option("display.precision", 4)
    print(table.to_string())
    _run.info["table"] = {c: table[c].to_dict() for c in table.columns}
    sys.stdout.flush()


if __name__ == "__main__":
    ex.run_commandline()
    sys.stdout.flush()
