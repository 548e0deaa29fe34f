"""AdapNet — ResNet-50-style encoder with multi-scale dilated blocks.

Reference: xview/models/adapnet.py (Valada et al., ICRA 2017). Block B splits
the middle 3x3 into two parallel atrous convolutions with different dilation
rates concatenated together; upsampling is two-stage (x2 then x8) with
frozen bilinear deconvs.
"""

import jax
import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops import layers as ll
from modular_semantic_segmentation_tpu.ops.losses import cross_entropy
from modular_semantic_segmentation_tpu.models.estimator import Estimator


def block_a(ctx, inputs, intermed_filters, filters, strides, name,
            shortcut_conv=False, activation=jax.nn.relu):
    """Bottleneck 1x1-3x3-1x1 residual block (reference adapnet.py:12-49)."""
    params = {"activation": jax.nn.relu, "batch_normalization": True,
              "use_bias": False}
    with ctx.scope(name):
        stage_1 = ll.conv2d(ctx, inputs, intermed_filters, 1, "stage_1",
                            strides=strides, **params)
        stage_2 = ll.conv2d(ctx, stage_1, intermed_filters, 3, "stage_2",
                            **params)
        stage_3 = ll.conv2d(ctx, stage_2, filters, 1, "stage_3", **params)
        if shortcut_conv:
            shortcut = ll.conv2d(ctx, inputs, filters, 1, "shortcut",
                                 strides=strides, **params)
        else:
            shortcut = inputs
    return activation(stage_3 + shortcut)


def block_b(ctx, inputs, filters_1, filters_2, filters_3, dilation1,
            dilation2, name, shortcut_conv=False, activation=jax.nn.relu):
    """Residual block with the middle 3x3 split into two parallel atrous
    convolutions (reference adapnet.py:52-94)."""
    params = {"activation": jax.nn.relu, "batch_normalization": True,
              "use_bias": False}
    with ctx.scope(name):
        stage_1 = ll.conv2d(ctx, inputs, filters_1, 1, "stage_1", **params)
        stage_2_1 = ll.conv2d(ctx, stage_1, filters_2 // 2, 3, "stage_2_1",
                              dilation_rate=dilation1, **params)
        stage_2_2 = ll.conv2d(ctx, stage_1, filters_2 // 2, 3, "stage_2_2",
                              dilation_rate=dilation2, **params)
        stage_2 = jnp.concatenate([stage_2_1, stage_2_2], axis=3)
        stage_3 = ll.conv2d(ctx, stage_2, filters_3, 1, "stage_3", **params)
        if shortcut_conv:
            shortcut = ll.conv2d(ctx, inputs, filters_3, 1, "shortcut",
                                 **params)
        else:
            shortcut = inputs
    return activation(stage_3 + shortcut)


def adapnet(ctx, inputs, prefix, num_units, num_classes):
    """Full AdapNet graph (reference adapnet.py:97-173): stem + 16 blocks
    with dilations up to 16, mid-network skip at block_7, two-stage
    deconvolution."""
    params = {"activation": jax.nn.relu, "batch_normalization": True}
    with ctx.scope(prefix):
        l = {}
        l["block_0_1"] = ll.conv2d(ctx, inputs, 64, 3, "block_0_1", **params)
        l["block_0_2"] = ll.conv2d(ctx, l["block_0_1"], 64, 7, "block_0_2",
                                   strides=2, **params)
        # custom_grad: the mask-based pool gradient wins in-context for
        # AdapNet's single pool (13.99 -> 13.2 ms train step) — see
        # ops/layers.max_pool2d; SimpleFCN's five-pool chain keeps the
        # default (fusion there beats the faster isolated op)
        l["block_0_pool"] = ll.max_pool2d(ctx, l["block_0_2"], 2, 2,
                                          custom_grad=True)

        l["block_1"] = block_a(ctx, l["block_0_pool"], 64, 256, 1,
                               "block_layer_1", shortcut_conv=True)
        l["block_2"] = block_a(ctx, l["block_1"], 64, 256, 1, "block_layer_2")
        l["block_3"] = block_a(ctx, l["block_2"], 64, 256, 1, "block_layer_3")
        l["block_4"] = block_a(ctx, l["block_3"], 128, 512, 2,
                               "block_layer_4", shortcut_conv=True)
        l["block_5"] = block_a(ctx, l["block_4"], 128, 512, 1,
                               "block_layer_5")
        l["block_6"] = block_a(ctx, l["block_5"], 128, 512, 1,
                               "block_layer_6")
        l["block_7"] = block_b(ctx, l["block_6"], 128, 64, 512, 1, 2,
                               "block_layer_7")
        l["shortcut"] = ll.conv2d(ctx, l["block_7"], num_units, 1, "shortcut",
                                  activation=None, batch_normalization=True)

        l["block_8"] = block_a(ctx, l["block_7"], 256, 1024, 2,
                               "block_layer_8", shortcut_conv=True)
        l["block_9"] = block_a(ctx, l["block_8"], 256, 1024, 1,
                               "block_layer_9")
        l["block_10"] = block_b(ctx, l["block_9"], 256, 256, 1024, 1, 2,
                                "block_layer_10")
        l["block_11"] = block_b(ctx, l["block_10"], 256, 256, 1024, 1, 4,
                                "block_layer_11")
        l["block_12"] = block_b(ctx, l["block_11"], 256, 256, 1024, 1, 8,
                                "block_layer_12")
        l["block_13"] = block_b(ctx, l["block_12"], 256, 256, 1024, 1, 16,
                                "block_layer_13")
        l["block_14"] = block_b(ctx, l["block_13"], 512, 512, 2048, 2, 4,
                                "block_layer_14", shortcut_conv=True)
        l["block_15"] = block_b(ctx, l["block_14"], 512, 512, 2048, 2, 8,
                                "block_layer_15")
        l["block_16"] = block_b(ctx, l["block_15"], 512, 512, 2048, 2, 16,
                                "block_layer_16")
        deconv_1 = ll.conv2d(ctx, l["block_16"], 2048, 1,
                             "first_deconvolution_conv", **params)
        # unlike SimpleFCN's frozen deconvs, AdapNet's upconvolutions are
        # TRAINABLE (reference adapnet.py:158-168 leaves the deconv2d
        # default trainable=True); they only start from the bilinear init
        l["deconv_1"] = ll.deconv2d(ctx, deconv_1, num_units, 4,
                                    "first_deconvolution_upconv", strides=2,
                                    activation=None, batch_normalization=True,
                                    trainable=True)
        l["merge"] = l["deconv_1"] + l["shortcut"]
        l["score"] = ll.deconv2d(ctx, l["merge"], num_classes, 16,
                                 "second_deconvolution_upconv", strides=8,
                                 activation=None, batch_normalization=True,
                                 trainable=True)
    return l


class Adapnet(Estimator):
    """AdapNet expert model (reference adapnet.py:176-223)."""

    def __init__(self, data_description, prefix=None, output_dir=None,
                 **config):
        standard_config = {"train_encoder": True}
        standard_config.update(config)
        self.prefix = prefix if prefix is not None else config["modality"]
        Estimator.__init__(self, data_description, output_dir=output_dir,
                           **standard_config)

    def _train_outputs(self, ctx, batch):
        layers = adapnet(ctx, batch[self.config["modality"]], self.prefix,
                         self.config["num_units"],
                         self.config["num_classes"])
        # NOTE: the reference divides the (already pixel-normalized) cross
        # entropy by sum(labels) a second time (adapnet.py:207-208) — a bug
        # that only rescales the loss; Adam makes it near-irrelevant. We use
        # the correctly normalized loss.
        prob = ll.log_softmax(layers["score"])
        return {"loss": cross_entropy(prob, batch["labels"],
                                      axis_name=ctx.spatial_axis)}

    def _test_outputs(self, ctx, batch):
        layers = adapnet(ctx, batch[self.config["modality"]], self.prefix,
                         self.config["num_units"],
                         self.config["num_classes"])
        prob = ll.softmax(layers["score"])
        return {"prob": prob, "prediction": prob.argmax(-1)}
