"""Mesh-based scaling layer (DP / expert / spatial partitioning)."""

from modular_semantic_segmentation_tpu.parallel.mesh import (
    make_mesh, make_multislice_mesh, replicated, batch_sharded,
    spatial_sharded)
from modular_semantic_segmentation_tpu.parallel.data_parallel import \
    distribute

__all__ = ["make_mesh", "make_multislice_mesh", "replicated",
           "batch_sharded", "spatial_sharded", "distribute"]
