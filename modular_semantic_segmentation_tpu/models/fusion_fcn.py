"""FusionFCN — architecture-level (late-concat) fusion baseline, trained
end-to-end (reference xview/models/fusion_fcn.py).

One VGG16 per modality, channel-concat of conv4_3's and conv5_3's across
modalities, fused 1x1 score convs, shared decoder. The reference class was
stale (FIFOQueue feeding, wrong _build_graph arity — SURVEY.md §2.9); the
function is the spec and this class wires it into the current Estimator
runtime.
"""

import jax
import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops import layers as ll
from modular_semantic_segmentation_tpu.ops.losses import cross_entropy
from modular_semantic_segmentation_tpu.models.estimator import Estimator
from modular_semantic_segmentation_tpu.models.simple_fcn import decoder
from modular_semantic_segmentation_tpu.models.vgg16 import vgg16


def fusion_fcn(ctx, inputs, prefixes, num_units, num_classes,
               trainable=True):
    """Late-fusion FCN graph (reference fusion_fcn.py:11-40)."""
    params = {"activation": jax.nn.relu, "batch_normalization": False,
              "trainable": trainable}
    layers = {}
    for modality, prefix in prefixes.items():
        layers[modality] = vgg16(ctx, inputs[modality], prefix, params)
    layers["concat_conv4"] = jnp.concatenate(
        [layers[m]["conv4_3"] for m in prefixes], axis=3)
    layers["concat_conv5"] = jnp.concatenate(
        [layers[m]["conv5_3"] for m in prefixes], axis=3)
    layers["score_conv4"] = ll.conv2d(ctx, layers["concat_conv4"], num_units,
                                      1, "fused_score_conv4", **params)
    layers["score_conv5"] = ll.conv2d(ctx, layers["concat_conv5"], num_units,
                                      1, "fused_score_conv5", **params)
    layers["upscore_conv5"] = ll.deconv2d(
        ctx, layers["score_conv5"], num_units, 4, "fused_upscore_conv5",
        strides=2, activation=jax.nn.relu, batch_normalization=False,
        trainable=False)
    layers["features"] = layers["score_conv4"] + layers["upscore_conv5"]
    layers.update(decoder(ctx, layers["features"], "fused", num_units,
                          num_classes, trainable=trainable, batchnorm=False))
    return layers


class FusionFCN(Estimator):
    """End-to-end trained late-fusion FCN.

    Config: prefixes {modality: prefix}, num_units, num_classes; default
    trainer rmsprop (reference fusion_fcn.py:45)."""

    ptq_min_pixels = 0  # VGG16 experts: see SimpleFCN.ptq_min_pixels

    def __init__(self, data_description=None, output_dir=None, **config):
        standard_config = {"trainer": "rmsprop", "learning_rate": 0.0001}
        standard_config.update(config)
        self.modalities = list(standard_config["prefixes"].keys())
        Estimator.__init__(self, data_description, output_dir=output_dir,
                           **standard_config)

    def _net(self, ctx, batch):
        inputs = {m: batch[m] for m in self.modalities}
        return fusion_fcn(ctx, inputs, self.config["prefixes"],
                          self.config["num_units"],
                          self.config["num_classes"])

    def _train_outputs(self, ctx, batch):
        score = self._net(ctx, batch)["score"]
        log_prob = ll.log_softmax(score)
        return {"loss": cross_entropy(log_prob, batch["labels"],
                                      axis_name=ctx.spatial_axis)}

    def _test_outputs(self, ctx, batch):
        score = self._net(ctx, batch)["score"]
        prob = ll.softmax(score)
        return {"prob": prob, "prediction": jnp.argmax(prob, 3)}
