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


def replicated(mesh):
    return NamedSharding(mesh, PartitionSpec())


def batch_sharded(mesh, axis="data"):
    """Shard the leading (batch) dimension over the given mesh axis."""
    return NamedSharding(mesh, PartitionSpec(axis))


def spatial_sharded(mesh, axis="data"):
    """Shard the height dimension of NHWC tensors over the given mesh axis
    (the reference's missing SP analogue — SURVEY.md §2.10)."""
    return NamedSharding(mesh, PartitionSpec(None, axis))
