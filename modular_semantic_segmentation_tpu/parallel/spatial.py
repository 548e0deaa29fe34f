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
import numpy as np
from jax.sharding import PartitionSpec as P


def halo_exchange_rows(x, axis_name, rows=1):
    """Return (top_halo, bottom_halo): ``rows`` boundary rows received from
    the ring neighbours via ``jax.lax.ppermute``.

    x: local block [N, H_local, W, C]. Edge devices receive zero rows
    (matching SAME zero padding).
    """
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_rows = x[:, :rows]      # -> neighbour above's bottom halo
    bottom_rows = x[:, -rows:]  # -> neighbour below's top halo

    # send my bottom rows down the ring (i -> i+1); received = halo above me
    from_above = jax.lax.ppermute(
        bottom_rows, axis_name,
        [(i, (i + 1) % n_dev) for i in range(n_dev)])
    # send my top rows up the ring (i -> i-1); received = halo below me
    from_below = jax.lax.ppermute(
        top_rows, axis_name,
        [(i, (i - 1) % n_dev) for i in range(n_dev)])
    # zero the wrapped-around edges (device 0 has nothing above, last device
    # nothing below) to reproduce SAME zero padding
    from_above = jnp.where(idx == 0, jnp.zeros_like(from_above), from_above)
    from_below = jnp.where(idx == n_dev - 1, jnp.zeros_like(from_below),
                           from_below)
    return from_above, from_below


# backwards-compatible single-row variant used by sharded_conv2d_3x3
def _halo_exchange_rows(x, axis_name):
    return halo_exchange_rows(x, axis_name, rows=1)


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


def spatial_sharded_forward(net_fn, variables, x, mesh, axis="data"):
    """Run a WHOLE network forward with the height axis sharded.

    ``net_fn(ctx, x)`` is any functional network built from ops/layers
    primitives (e.g. models.simple_fcn.fcn via a lambda). Inside the
    shard_map every 3x3 conv exchanges dilation-wide row halos and every
    frozen deconv exchanges one row and trims the overlap (see
    ops/layers.py spatial paths), so the result is identical to the
    unsharded forward. Inference-only: Ctx is constructed with train=False
    (training-mode batch norm would need a psum over the spatial axis).

    Args:
        net_fn: callable (ctx, x_local) -> array or pytree of arrays, each
            [N, H_local*, W*, C]-shaped (H sharded).
        variables: flat variable dict (replicated).
        x: [N, H, W, C] global input; H must be divisible by
            (mesh size along ``axis``) * 16 so pooling windows never
            straddle shard boundaries (the reference's crop_multiple=16
            alignment, xview/datasets/augmentation.py:244-262).
    """
    from modular_semantic_segmentation_tpu.ops.variables import Ctx

    n_dev = mesh.shape[axis]
    if x.shape[1] % (n_dev * 16):
        raise ValueError(
            f"height {x.shape[1]} not divisible by {n_dev} shards * 16")

    def local_fn(variables, x_blk):
        ctx = Ctx(variables, train=False, spatial_axis=axis)
        return net_fn(ctx, x_blk)

    shard_fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(None, axis, None, None)),
        out_specs=P(None, axis, None, None))
    return shard_fn(variables, x)


def distribute_spatial(net, mesh, axis="sp"):
    """Install height-sharded TRAIN and EVAL steps on an Estimator.

    The full spatial-partitioning story (the SP row of SURVEY.md §2.10):
    after this call ``net.fit`` / ``net.predict`` / ``net.score`` run each
    frame sharded along the height axis of ``mesh`` — for frames too large
    for one chip's HBM. All cross-shard communication is emitted inside the
    one jitted step: row-halo ``ppermute`` for convs/deconvs (ops/layers.py
    spatial paths), psum'd batch-norm statistics (the sync-BN analogue),
    a psum'd void-masked loss, psum'd gradients (every shard then applies
    an identical optimizer update, keeping variables replicated), and a
    psum'd confusion matrix at eval. Matches the unsharded model to f32
    reduction-order noise (tests/test_parallel.py).

    Constraints: frame height divisible by (mesh size along axis) * 16;
    ``device_augmentation`` and int8 serving fall back with an error /
    to float respectively.
    """
    n_dev = mesh.shape[axis]

    def _check(batch):
        h = int(batch[next(iter(batch))].shape[1])
        if h % (n_dev * 16):
            raise ValueError(
                f"height {h} not divisible by {n_dev} shards * 16")

    def _batch_specs(batch):
        # every modality is [N, H, ...] — shard axis 1; anything smaller
        # (scalars/extra metadata) stays replicated
        return {k: P(None, axis) if np.ndim(v) >= 3 else P()
                for k, v in batch.items()}

    def train_step(variables, opt_state, batch, rng):
        _check(batch)
        fn = jax.shard_map(
            lambda v, o, b, r: net._train_step(v, o, b, r,
                                               spatial_axis=axis),
            mesh=mesh,
            in_specs=(P(), P(), _batch_specs(batch), P()),
            out_specs=(P(), P(), P()),
            check_vma=False)
        return fn(variables, opt_state, batch, rng)

    def eval_step(variables, batch, rng):
        _check(batch)
        out_shapes = jax.eval_shape(net._eval_step, variables, batch, rng)
        out_specs = {k: P() if k == "confusion_matrix" or s.ndim < 3
                     else P(None, axis) for k, s in out_shapes.items()}
        fn = jax.shard_map(
            lambda v, b, r: net._eval_step(v, b, r, spatial_axis=axis),
            mesh=mesh,
            in_specs=(P(), _batch_specs(batch), P()),
            out_specs=out_specs,
            check_vma=False)
        return fn(variables, batch, rng)

    def redistribute():
        net._jit_train_step = jax.jit(train_step)
        net._jit_eval_step = jax.jit(eval_step)

    redistribute()
    net._redistribute = redistribute
    return net
