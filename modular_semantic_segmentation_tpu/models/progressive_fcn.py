"""ProgressiveFCN — resurrected capability.

The reference's experiment layer imports ``xview.models.progressive_fcn``
which is missing from the repo (SURVEY.md §2.9); the architecture survives
in ``vgg16.progressive_vgg16`` + ``custom_layers.adap_conv`` and the
training flow in experiments/train_and_evaluate_progressive.py. This wires
it cleanly into the Estimator runtime:

A new modality column (progressive-networks, arXiv 1606.04671) trains with
lateral adapter connections from previously-trained FROZEN columns. Weight
naming is the flat '{prefix}_convX_Y/...' vgg16 convention, so columns can
be warm-started from exported expert npz files (with the cross-modal
first-layer kernel surgery in experiments/finetuning.py).
"""

import jax

from modular_semantic_segmentation_tpu.ops import layers as ll
from modular_semantic_segmentation_tpu.ops.losses import cross_entropy
from modular_semantic_segmentation_tpu.models.estimator import Estimator
from modular_semantic_segmentation_tpu.models.simple_fcn import decoder
from modular_semantic_segmentation_tpu.models.vgg16 import (
    vgg16, progressive_vgg16)


def progressive_fcn(ctx, batch, prefix, modality, lateral_columns, num_units,
                    num_classes, batchnorm=False, adapter_params=None):
    """Progressive FCN graph: frozen lateral vgg16 columns + adapter-coupled
    new column + FCN skip head and decoder."""
    params = {"activation": jax.nn.relu, "batch_normalization": batchnorm}
    frozen = dict(params, trainable=False)
    adapter_params = adapter_params or {}

    # previously-trained columns, frozen
    columns = {}
    for lat_prefix, lat_modality in lateral_columns.items():
        col = vgg16(ctx, batch[lat_modality], lat_prefix, frozen)
        for layer, value in col.items():
            columns.setdefault(layer, []).append(value)

    l = progressive_vgg16(ctx, batch[modality], columns, prefix, params,
                          adapter_params)
    score_conv4 = ll.conv2d(ctx, l["conv4_3"], num_units, 1,
                            f"{prefix}_score_conv4", **params)
    score_conv5 = ll.conv2d(ctx, l["conv5_3"], num_units, 1,
                            f"{prefix}_score_conv5", **params)
    upscore_conv5 = ll.deconv2d(ctx, score_conv5, num_units, 4,
                                f"{prefix}_upscore_conv5", strides=2,
                                activation=jax.nn.relu,
                                batch_normalization=batchnorm,
                                trainable=False)
    l["fused"] = score_conv4 + upscore_conv5
    l.update(decoder(ctx, l["fused"], prefix, num_units, num_classes,
                     batchnorm=batchnorm))
    return l


class ProgressiveFCN(Estimator):
    """Progressive-networks FCN.

    Config:
        prefix/modality: the new column being trained.
        lateral_columns: dict {prefix: modality} of frozen trained columns.
        adapter: optional dict(extra_convolution, initial_scales,
            initialize_half_zero) forwarded to adap_conv.
    """

    ptq_min_pixels = 0  # VGG16 stack: see SimpleFCN.ptq_min_pixels

    def __init__(self, data_description, prefix=None, output_dir=None,
                 **config):
        standard_config = {"batch_normalization": False,
                           "lateral_columns": {}, "adapter": {}}
        standard_config.update(config)
        self.prefix = prefix if prefix is not None else config["modality"]
        Estimator.__init__(self, data_description, output_dir=output_dir,
                           **standard_config)

    def _net(self, ctx, batch):
        return progressive_fcn(
            ctx, batch, self.prefix, self.config["modality"],
            self.config["lateral_columns"], self.config["num_units"],
            self.config["num_classes"],
            batchnorm=self.config["batch_normalization"],
            adapter_params=self.config["adapter"])

    def _train_outputs(self, ctx, batch):
        score = self._net(ctx, batch)["score"]
        return {"loss": cross_entropy(ll.log_softmax(score),
                                      batch["labels"],
                                      axis_name=ctx.spatial_axis)}

    def _test_outputs(self, ctx, batch):
        score = self._net(ctx, batch)["score"]
        prob = ll.softmax(score)
        return {"prob": prob, "prediction": prob.argmax(-1)}
