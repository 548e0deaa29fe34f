"""Data-parallel training/eval over a device mesh.

Variables and optimizer state are replicated; batches are sharded on the
'data' axis. The gradient all-reduce is emitted by XLA from the sharding
annotations (scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert collectives) — there is no explicit psum in model code.
"""

import jax

from modular_semantic_segmentation_tpu.parallel.mesh import (
    batch_sharded, replicated)


def distribute(estimator, mesh, data_axis="data"):
    """Re-jit an Estimator's steps with data-parallel shardings.

    After this call, fit/predict/score shard every batch over the mesh.
    The global batchsize must be divisible by the mesh's data-axis size.
    Returns the estimator (for chaining).
    """
    repl = replicated(mesh)
    data = batch_sharded(mesh, data_axis)

    if not estimator.custom_training:
        estimator._jit_train_step = jax.jit(
            estimator._train_step,
            in_shardings=(repl, repl, data, repl),
            out_shardings=(repl, repl, repl))
    estimator._jit_eval_step = jax.jit(
        estimator._eval_step,
        in_shardings=(repl, data, repl))
    estimator._mesh = mesh
    # re-applied by Estimator._rejit_eval_step (quantize/dequantize)
    estimator._redistribute = lambda: distribute(estimator, mesh, data_axis)
    return estimator
