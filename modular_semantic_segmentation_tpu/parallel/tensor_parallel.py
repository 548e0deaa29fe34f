"""Tensor (model) parallelism: channel-sharded parameters over a mesh axis.

The reference has no model parallelism of any kind — a single ``tf.Session``
on one device (SURVEY.md §2.10; reference base_model.py:166-169). At this
model size TP is not needed for capacity, but the framework exposes it the
TPU-native way anyway: every convolution kernel is sharded on its channel
dimension over a ``'model'`` mesh axis and *committed* to devices with that
layout; ``jax.jit``/GSPMD then propagates the shardings through the network
and inserts the collectives (all-gathers where a channel-sharded activation
feeds a spatially-tiled op, psums for input-channel contractions) over ICI.
No communication is written by hand — the scaling-book recipe.

Composes with data parallelism on a 2-D ``('data', 'model')`` mesh: the batch
shards over ``'data'`` (parameters replicated along it), channels over
``'model'`` (batch replicated along it). The gradient all-reduce over
``'data'`` and the channel collectives over ``'model'`` are both emitted by
XLA from the same annotations.
"""

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec

from modular_semantic_segmentation_tpu.parallel.mesh import (
    batch_sharded, replicated)


def channel_sharding(mesh, shape, axis="model"):
    """NamedSharding for one variable: channel dim over ``axis``.

    Conv kernels ([kh, kw, in, out] — and deconv [kh, kw, out, in], where the
    last dim is likewise the larger channel count) shard their last dimension;
    per-channel vectors (biases, BN scale/offset/moving stats, optimizer
    slots of either) shard their only dimension. Anything not divisible by
    the axis size stays replicated — GSPMD handles mixed layouts.
    """
    size = mesh.shape[axis]
    shape = tuple(int(s) for s in shape)
    if size > 1:
        if len(shape) == 4 and shape[3] % size == 0:
            return NamedSharding(mesh, PartitionSpec(None, None, None, axis))
        if len(shape) == 1 and shape[0] % size == 0 and shape[0] > size:
            return NamedSharding(mesh, PartitionSpec(axis))
    return NamedSharding(mesh, PartitionSpec())


def tp_shardings(mesh, variables, axis="model"):
    """Per-variable channel shardings for a flat variable dict."""
    return {name: channel_sharding(mesh, np.shape(value), axis)
            for name, value in variables.items()}


def distribute_tp(estimator, mesh, data_axis="data", model_axis="model"):
    """Re-jit an Estimator's steps with 2-D data x tensor shardings.

    Parameters (and their optimizer slots) are sharded on channels over
    ``model_axis``; batches are sharded over ``data_axis``. The global
    batchsize must be divisible by the data-axis size. Returns the estimator.
    """
    var_shard = tp_shardings(mesh, estimator.variables, model_axis)
    estimator.variables = {
        name: jax.device_put(value, var_shard[name])
        for name, value in estimator.variables.items()}
    data = batch_sharded(mesh, data_axis)
    repl = replicated(mesh)

    if not estimator.custom_training and estimator.opt_state is not None:
        opt_shard = jax.tree.map(
            lambda leaf: channel_sharding(mesh, np.shape(leaf), model_axis),
            estimator.opt_state)
        estimator.opt_state = jax.tree.map(
            jax.device_put, estimator.opt_state, opt_shard)
        estimator._jit_train_step = jax.jit(
            estimator._train_step,
            in_shardings=(var_shard, opt_shard, data, repl),
            out_shardings=(var_shard, opt_shard, repl))
    estimator._jit_eval_step = jax.jit(
        estimator._eval_step,
        in_shardings=(var_shard, data, repl))
    estimator._mesh = mesh
    # re-applied by Estimator._rejit_eval_step (quantize/dequantize) so the
    # channel shardings survive a serving-mode switch
    estimator._redistribute = lambda: distribute_tp(
        estimator, mesh, data_axis, model_axis)
    return estimator
