"""Functional neural-net ops and math kernels (JAX / Pallas)."""

from modular_semantic_segmentation_tpu.ops.variables import Ctx, init_variables
from modular_semantic_segmentation_tpu.ops.layers import (
    conv2d, deconv2d, max_pool2d, dropout, adap_conv,
    log_softmax, softmax, entropy, unpool_2d,
)
from modular_semantic_segmentation_tpu.ops.losses import cross_entropy
from modular_semantic_segmentation_tpu.ops.metrics import (
    confusion_matrix, measures_from_confusion_matrix,
)

__all__ = [
    "Ctx", "init_variables",
    "conv2d", "deconv2d", "max_pool2d", "dropout", "adap_conv",
    "log_softmax", "softmax", "entropy", "unpool_2d",
    "cross_entropy", "confusion_matrix", "measures_from_confusion_matrix",
]
