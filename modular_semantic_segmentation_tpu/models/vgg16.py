"""Bare VGG16 conv stack + progressive-networks variant.

Reference: xview/models/vgg16.py. Layer names are '{prefix}_convX_Y' at the
top level (flat underscore naming — the second npz naming convention the
import path supports, base_model.py:435-437).
"""

from modular_semantic_segmentation_tpu.ops import layers as ll


def vgg16(ctx, inputs, prefix, params):
    """VGG16 image encoder returning all intermediate layers
    (reference vgg16.py:7-51)."""
    l = {}
    x = inputs

    def conv(x, filters, name):
        return ll.conv2d(ctx, x, filters, 3, f"{prefix}_{name}", **params)

    l["conv1_1"] = conv(x, 64, "conv1_1")
    l["conv1_2"] = conv(l["conv1_1"], 64, "conv1_2")
    l["pool1"] = ll.max_pool2d(ctx, l["conv1_2"], 2, 2)
    l["conv2_1"] = conv(l["pool1"], 128, "conv2_1")
    l["conv2_2"] = conv(l["conv2_1"], 128, "conv2_2")
    l["pool2"] = ll.max_pool2d(ctx, l["conv2_2"], 2, 2)
    l["conv3_1"] = conv(l["pool2"], 256, "conv3_1")
    l["conv3_2"] = conv(l["conv3_1"], 256, "conv3_2")
    l["conv3_3"] = conv(l["conv3_2"], 256, "conv3_3")
    l["pool3"] = ll.max_pool2d(ctx, l["conv3_3"], 2, 2)
    l["conv4_1"] = conv(l["pool3"], 512, "conv4_1")
    l["conv4_2"] = conv(l["conv4_1"], 512, "conv4_2")
    l["conv4_3"] = conv(l["conv4_2"], 512, "conv4_3")
    l["pool4"] = ll.max_pool2d(ctx, l["conv4_3"], 2, 2)
    l["conv5_1"] = conv(l["pool4"], 512, "conv5_1")
    l["conv5_2"] = conv(l["conv5_1"], 512, "conv5_2")
    l["conv5_3"] = conv(l["conv5_2"], 512, "conv5_3")
    return l


def progressive_vgg16(ctx, inputs, columns, prefix, params, adapter_params):
    """VGG16 as a progressive-networks column (arXiv 1606.04671): selected
    layers are adapter blocks fed lateral features from previously-trained
    frozen columns (reference vgg16.py:54-111).

    Args:
        columns: dict {layer name: list of outputs from previous columns}.
    """
    all_adapter = dict(params)
    all_adapter.update(adapter_params)
    l = {}

    def conv(x, filters, name):
        return ll.conv2d(ctx, x, filters, 3, f"{prefix}_{name}", **params)

    def adap(x, filters, name, lateral_key):
        return ll.adap_conv(ctx, x, columns[lateral_key], filters, 3,
                            name=f"{prefix}_{name}", **all_adapter)

    l["conv1_1"] = conv(inputs, 64, "conv1_1")
    l["conv1_2"] = adap(l["conv1_1"], 64, "conv1_2", "conv1_1")
    l["pool1"] = ll.max_pool2d(ctx, l["conv1_2"], 2, 2)
    l["conv2_1"] = conv(l["pool1"], 128, "conv2_1")
    l["conv2_2"] = adap(l["conv2_1"], 128, "conv2_2", "conv2_1")
    l["pool2"] = ll.max_pool2d(ctx, l["conv2_2"], 2, 2)
    l["conv3_1"] = conv(l["pool2"], 256, "conv3_1")
    l["conv3_2"] = conv(l["conv3_1"], 256, "conv3_2")
    l["conv3_3"] = adap(l["conv3_2"], 256, "conv3_3", "conv3_2")
    l["pool3"] = ll.max_pool2d(ctx, l["conv3_3"], 2, 2)
    l["conv4_1"] = conv(l["pool3"], 512, "conv4_1")
    l["conv4_2"] = conv(l["conv4_1"], 512, "conv4_2")
    l["conv4_3"] = adap(l["conv4_2"], 512, "conv4_3", "conv4_2")
    l["pool4"] = ll.max_pool2d(ctx, l["conv4_3"], 2, 2)
    l["conv5_1"] = conv(l["pool4"], 512, "conv5_1")
    l["conv5_2"] = conv(l["conv5_1"], 512, "conv5_2")
    l["conv5_3"] = adap(l["conv5_2"], 512, "conv5_3", "conv5_2")
    return l
