"""Evaluation metrics.

Confusion-matrix accumulation runs ON DEVICE as a one-hot matmul — an MXU
contraction, one pass per batch, no host sync (unlike the reference which
pulls a confusion matrix to the host every sess.run,
xview/models/base_model.py:294-313). The derived measures replicate
base_model.py:315-330 exactly, including the void-class (class 0) exclusion
from total_accuracy and mean_IoU.
"""

import jax.numpy as jnp
import numpy as np


def confusion_matrix(predictions, labels, num_classes):
    """Device-side confusion matrix.

    Labels < 0 (the reference's NaN/void sentinel, base_model.py:140-151) are
    mapped to an extra class that is sliced off, i.e. ignored.

    Args:
        predictions: int array [...], predicted class per pixel.
        labels: int array [...] with possible negatives for ignore.
        num_classes: K.
    Returns:
        [K, K] float32 matrix, rows = true class, cols = predicted class.
    """
    preds = predictions.reshape(-1).astype(jnp.int32)
    labs = labels.reshape(-1).astype(jnp.int32)
    labs = jnp.where(labs < 0, num_classes, labs)
    # One-hot contraction instead of scatter: [K+1, N] @ [N, K] runs on the
    # MXU and vectorizes trivially.
    lab_oh = (labs[:, None] == jnp.arange(num_classes + 1)[None, :]).astype(
        jnp.float32)
    pred_oh = (preds[:, None] == jnp.arange(num_classes)[None, :]).astype(
        jnp.float32)
    full = lab_oh.T @ pred_oh
    return full[:num_classes, :]


def measures_from_confusion_matrix(conf_mat):
    """Derive the reference's metric suite from a confusion matrix.

    Reference base_model.py:315-330: recall/precision/F1/mean_F1,
    total_accuracy and mean_IoU computed EXCLUDING class 0 (void).
    """
    conf_mat = np.asarray(conf_mat, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        measures = {"confusion_matrix": conf_mat}
        diag = np.diag(conf_mat)
        measures["recall"] = diag / conf_mat.sum(1)
        measures["precision"] = diag / conf_mat.sum(0)
        measures["F1"] = (2 * measures["precision"] * measures["recall"] /
                          (measures["precision"] + measures["recall"]))
        measures["mean_F1"] = np.nanmean(measures["F1"])
        measures["total_accuracy"] = diag[1:].sum() / conf_mat[1:, :].sum()
        measures["IoU"] = diag / (conf_mat.sum(1) + conf_mat.sum(0) - diag)
        measures["mean_IoU"] = np.nanmean(measures["IoU"][1:])
    return measures


def auroc(scores, labels):
    """Area under the ROC curve (for misclassification/OOD detection,
    reference experiments/uncertainty_eval.py:18-32). Pure NumPy."""
    scores = np.asarray(scores, np.float64).ravel()
    labels = np.asarray(labels).ravel().astype(bool)
    order = np.argsort(-scores, kind="mergesort")
    labels = labels[order]
    tps = np.cumsum(labels)
    fps = np.cumsum(~labels)
    if tps[-1] == 0 or fps[-1] == 0:
        return float("nan")
    tpr = np.concatenate([[0], tps / tps[-1]])
    fpr = np.concatenate([[0], fps / fps[-1]])
    return float(np.trapezoid(tpr, fpr))
