"""Device-mesh helpers.

The reference has no distributed execution at all (SURVEY.md §2.10); this
package is the TPU-native scaling layer: one ``jax.sharding.Mesh``
abstraction, shardings annotated on the jitted steps, XLA inserting the
collectives over ICI. No hand-rolled communication backend.
"""

import math

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(axis_sizes=None, devices=None):
    """Create a Mesh.

    Args:
        axis_sizes: dict {axis name: size} (e.g. {'data': 8}); sizes must
            multiply to the device count. None -> all devices on one 'data'
            axis.
        devices: device list (default jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    total = math.prod(axis_sizes.values())
    if total != len(devices):
        raise ValueError(
            f"mesh axes {axis_sizes} need {total} devices, have "
            f"{len(devices)}")
    grid = np.array(devices).reshape(tuple(axis_sizes.values()))
    return Mesh(grid, tuple(axis_sizes.keys()))


def make_multislice_mesh(num_slices, ici_axes=None, dcn_axis="slice",
                         devices=None):
    """Hybrid DCN x ICI mesh for multi-slice TPU pods.

    The leading ``dcn_axis`` spans slices (connected over DCN), the
    remaining ``ici_axes`` span devices within one slice (ICI). On real
    multi-slice hardware this uses ``mesh_utils.create_hybrid_device_mesh``
    so the physical links match the logical axes; on virtual/CPU device
    sets (no slice topology) it falls back to a contiguous reshape with
    the same logical layout.

    Intended sharding for data-parallel training (the framework's scaling
    mode, SURVEY.md §2.10): parameters replicated, batch sharded over
    ``(dcn_axis, *ici_axes)`` — pass that tuple as ``distribute``'s
    ``data_axis``. XLA then emits the hierarchical gradient all-reduce
    (reduce-scatter inside each slice over ICI, a small cross-slice
    all-reduce over DCN, all-gather back inside the slice), which keeps
    the per-hop DCN payload at 1/ici_size of the gradient bytes — the
    scaling-book multi-slice recipe.

    Args:
        num_slices: number of slices (DCN groups).
        ici_axes: dict {axis: size} within one slice; default puts all
            remaining devices on a 'data' axis.
        devices: device list (default jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % num_slices:
        raise ValueError(
            f"{len(devices)} devices not divisible into {num_slices} slices")
    per_slice = len(devices) // num_slices
    if ici_axes is None:
        ici_axes = {"data": per_slice}
    if math.prod(ici_axes.values()) != per_slice:
        raise ValueError(
            f"ici axes {ici_axes} need {math.prod(ici_axes.values())} "
            f"devices per slice, have {per_slice}")
    axis_names = (dcn_axis,) + tuple(ici_axes.keys())
    shape = (num_slices,) + tuple(ici_axes.values())
    if all(getattr(d, "slice_index", None) is not None for d in devices):
        from jax.experimental import mesh_utils
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1,) + tuple(ici_axes.values()),
            dcn_mesh_shape=(num_slices,) + (1,) * len(ici_axes),
            devices=devices)
    else:
        grid = np.array(devices).reshape(shape)
    return Mesh(grid, axis_names)


def replicated(mesh):
    return NamedSharding(mesh, PartitionSpec())


def batch_sharded(mesh, axis="data"):
    """Shard the leading (batch) dimension over the given mesh axis."""
    return NamedSharding(mesh, PartitionSpec(axis))


def spatial_sharded(mesh, axis="data"):
    """Shard the height dimension of NHWC tensors over the given mesh axis
    (the reference's missing SP analogue — SURVEY.md §2.10)."""
    return NamedSharding(mesh, PartitionSpec(None, axis))
