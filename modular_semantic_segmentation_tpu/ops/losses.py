"""Losses.

The reference's masked cross-entropy (xview/models/utils.py:43-53): labels are
one-hot with all-zero rows for void/unlabelled pixels, so those pixels drop
out of both the numerator and the (label-count) denominator.
"""

import jax.numpy as jnp


def cross_entropy(log_predictions, onehot_labels):
    """-sum(labels * log_probs) / (1e-20 + sum(labels)).

    Args:
        log_predictions: [..., K] log-probabilities.
        onehot_labels: [..., K] one-hot float labels; all-zero rows mask the
            pixel out entirely.
    """
    labels = onehot_labels.astype(jnp.float32)
    pixel_ce = -jnp.sum(labels * log_predictions.astype(jnp.float32), axis=-1)
    return jnp.sum(pixel_ce) / (1e-20 + jnp.sum(labels))
