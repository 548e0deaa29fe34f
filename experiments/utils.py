"""Experiment storage/config access (reference experiments/utils.py).

Thin re-export of the framework implementations so the reference import
paths keep working."""

from modular_semantic_segmentation_tpu.utils.experiment import (  # noqa
    ExperimentData, get_observer, get_mongo_observer, load_data,
    data_description, reverse_convert_datatypes)
