"""Losses.

The reference's masked cross-entropy (xview/models/utils.py:43-53): labels are
one-hot with all-zero rows for void/unlabelled pixels, so those pixels drop
out of both the numerator and the (label-count) denominator.
"""

import jax
import jax.numpy as jnp


def cross_entropy(log_predictions, onehot_labels, axis_name=None):
    """-sum(labels * log_probs) / (1e-20 + sum(labels)).

    Args:
        log_predictions: [..., K] log-probabilities.
        onehot_labels: [..., K] one-hot float labels; all-zero rows mask the
            pixel out entirely.
        axis_name: optional mesh axis the pixel grid is sharded over
            (spatial-parallel training, parallel/spatial.py): numerator and
            label count are psum'ed so every shard computes the GLOBAL
            masked mean — required because the void-mask denominator makes
            the loss non-decomposable into per-shard means.
    """
    labels = onehot_labels.astype(jnp.float32)
    pixel_ce = -jnp.sum(labels * log_predictions.astype(jnp.float32), axis=-1)
    num, den = jnp.sum(pixel_ce), jnp.sum(labels)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / (1e-20 + den)
