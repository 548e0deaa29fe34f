"""Spatial partitioning with halo exchange — the SP analogue for CNNs.

The reference caps images at 768x384 on one GPU; for larger frames the
height axis can be sharded across devices. A 3x3 SAME conv then needs the
neighbouring device's boundary rows: we exchange 1-row halos over the ring
with ``jax.lax.ppermute`` inside ``shard_map`` (ICI neighbour traffic only),
compute a VALID conv on the haloed block, and the result is identical to
the unsharded SAME conv.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _halo_exchange_rows(x, axis_name):
    """Return (top_halo, bottom_halo) rows received from ring neighbours.

    x: local block [N, H_local, W, C]. Edge devices receive zero rows
    (matching SAME zero padding).
    """
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_row = x[:, :1]      # my first row -> neighbour above's bottom halo
    bottom_row = x[:, -1:]  # my last row  -> neighbour below's top halo

    # send my bottom row down the ring (i -> i+1); received = halo above me
    from_above = jax.lax.ppermute(
        bottom_row, axis_name,
        [(i, (i + 1) % n_dev) for i in range(n_dev)])
    # send my top row up the ring (i -> i-1); received = halo below me
    from_below = jax.lax.ppermute(
        top_row, axis_name,
        [(i, (i - 1) % n_dev) for i in range(n_dev)])
    # zero the wrapped-around edges (device 0 has nothing above, last device
    # nothing below) to reproduce SAME zero padding
    from_above = jnp.where(idx == 0, jnp.zeros_like(from_above), from_above)
    from_below = jnp.where(idx == n_dev - 1, jnp.zeros_like(from_below),
                           from_below)
    return from_above, from_below


def sharded_conv2d_3x3(x, kernel, mesh, axis="data"):
    """SAME 3x3 conv with the height axis sharded over ``axis``.

    Args:
        x: [N, H, W, C_in] global array (will be sharded [N, H/n, W, C]).
        kernel: [3, 3, C_in, C_out].
    Returns:
        [N, H, W, C_out], bitwise equal to the unsharded SAME conv.
    """

    def local_conv(x_blk, kernel):
        top, bottom = _halo_exchange_rows(x_blk, axis)
        haloed = jnp.concatenate([top, x_blk, bottom], axis=1)
        return jax.lax.conv_general_dilated(
            haloed, kernel, window_strides=(1, 1),
            padding=[(0, 0), (1, 1)],  # height handled by halos
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    shard_fn = jax.shard_map(
        partial(local_conv),
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None))
    return shard_fn(x, kernel)
