"""Mesh-based scaling layer (DP / TP / PP / expert / spatial partitioning)."""

from modular_semantic_segmentation_tpu.parallel.mesh import (
    make_mesh, make_multislice_mesh, replicated, batch_sharded,
    spatial_sharded)
from modular_semantic_segmentation_tpu.parallel.data_parallel import \
    distribute
from modular_semantic_segmentation_tpu.parallel.tensor_parallel import \
    distribute_tp
from modular_semantic_segmentation_tpu.parallel.spatial import \
    distribute_spatial
from modular_semantic_segmentation_tpu.parallel.pipeline import Pipeline

__all__ = ["make_mesh", "make_multislice_mesh", "replicated",
           "batch_sharded", "spatial_sharded", "distribute",
           "distribute_tp", "distribute_spatial", "Pipeline"]
