"""Pallas TPU kernel for confusion-matrix accumulation.

One-hot contraction [K+1, tile] @ [tile, K] on the MXU, accumulated across
the pixel grid in the (revisited) output block — no [pixels, K] one-hot
tensor ever hits HBM, unlike the XLA formulation in ops/metrics.py.
Ignore-labels (< 0) fall into the sliced-off extra row, matching the
reference's NaN-label masking (base_model.py:140-151).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(preds_ref, labels_ref, out_ref, *, kp):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    preds = preds_ref[0]   # [T]
    labels = labels_ref[0]
    classes = jax.lax.broadcasted_iota(jnp.int32, (kp, preds.shape[0]), 0)
    lab_oh = (labels[None, :] == classes).astype(jnp.float32)   # [Kp, T]
    pred_oh = (preds[:, None] ==
               jax.lax.broadcasted_iota(jnp.int32,
                                        (preds.shape[0], kp), 1)
               ).astype(jnp.float32)                            # [T, Kp]
    out_ref[:] += jnp.dot(lab_oh, pred_oh,
                          preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("kp", "tile", "interpret"))
def _run(preds, labels, kp, tile=4096, interpret=False):
    p = preds.shape[1]
    grid = (p // tile,)
    return pl.pallas_call(
        functools.partial(_kernel, kp=kp),
        out_shape=jax.ShapeDtypeStruct((kp, kp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i)),
            pl.BlockSpec((1, tile), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((kp, kp), lambda i: (0, 0)),
        interpret=interpret,
    )(preds, labels)


def confusion_matrix(predictions, labels, num_classes, tile=4096,
                     interpret=False):
    """Drop-in for ops.metrics.confusion_matrix, Pallas-accelerated."""
    kp = _round_up(num_classes + 1, LANE)
    preds = predictions.reshape(1, -1).astype(jnp.int32)
    labs = labels.reshape(1, -1).astype(jnp.int32)
    labs = jnp.where(labs < 0, num_classes, labs)
    pixels = preds.shape[1]
    pp = _round_up(pixels, tile)
    # pad with an ignored class so padding never lands in the matrix
    preds = jnp.pad(preds, ((0, 0), (0, pp - pixels)),
                    constant_values=num_classes)
    labs = jnp.pad(labs, ((0, 0), (0, pp - pixels)),
                   constant_values=num_classes)
    full = _run(preds, labs, kp, tile=tile, interpret=interpret)
    return full[:num_classes, :num_classes]
