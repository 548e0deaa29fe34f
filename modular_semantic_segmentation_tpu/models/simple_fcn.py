"""SimpleFCN — VGG16-based fully-convolutional segmentation expert.

Architecture per the reference (xview/models/simple_fcn.py, "DA-RNN" style):
VGG16 conv stack, 1x1 score convs on conv4_3 and conv5_3, frozen 4x4/stride-2
bilinear deconv on score_conv5, elementwise add -> 'fused' skip feature;
decoder = frozen 16x16/stride-8 bilinear deconv + 1x1 class score conv.

``encoder``/``decoder``/``fcn`` are plain functions returning layer dicts so
fusion models can build expert networks without expert model objects
(reference README.md:85-87, basic_fusion_model.py:9-23).
"""

import jax

from modular_semantic_segmentation_tpu.ops import layers as ll
from modular_semantic_segmentation_tpu.ops.losses import cross_entropy
from modular_semantic_segmentation_tpu.models.estimator import Estimator


def encoder_stem(ctx, inputs, prefix, trainable=True, batchnorm=True,
                 channel_factor=1.0):
    """conv1_1 .. conv2_1 — the full/half-resolution thin-channel stem.

    Split out of :func:`encoder_head` so fusion models can replace it with
    the cross-expert block-diagonally packed stem
    (models/packed_experts.py): at 64 channels the MXU runs half its
    vector lanes idle (docs/TIMING.md roofline), and running all experts'
    stems as one dense 2x-wide conv stack recovers ~0.3 ms/frame at the
    benchmark shape. Layer names and numerics are identical to the
    original inline body."""
    params = {"trainable": trainable, "batch_normalization": batchnorm,
              "activation": jax.nn.relu}
    c = lambda w: max(1, int(w * channel_factor))  # noqa: E731
    with ctx.scope(prefix):
        l = {}
        l["conv1_1"] = ll.conv2d(ctx, inputs, c(64), 3, "conv1_1", **params)
        l["conv1_2"] = ll.conv2d(ctx, l["conv1_1"], c(64), 3, "conv1_2",
                                 **params)
        l["pool1"] = ll.max_pool2d(ctx, l["conv1_2"], 2, 2)
        l["conv2_1"] = ll.conv2d(ctx, l["pool1"], c(128), 3, "conv2_1",
                                 **params)
    return l


def encoder_head(ctx, inputs, prefix, dropout_rate=0.0, trainable=True,
                 batchnorm=True, dropout_layers=(), channel_factor=1.0,
                 stem_layers=None):
    """conv1_1 .. pool3 — the encoder up to (exclusive of) the first
    dropout site. With the reference's dropout placements (pool3/pool4/
    conv4_3/conv5_3, simple_fcn.py:49-78) this prefix is DETERMINISTIC,
    so MC-dropout samplers compute it once and fan out stochastic tails
    (see VarianceFusion).

    ``channel_factor`` scales every VGG16 conv width (64..512) by a
    constant; 1.0 (the default) is the reference architecture. Sub-1
    factors give proportionally cheaper experts for single-core CI and
    small synthetic corpora (tests/test_fusion_gain.py) without touching
    the layer topology.

    ``stem_layers``: optional precomputed conv1_1..conv2_1 layer dict
    (the cross-expert packed stem, models/packed_experts.py); when given
    the stem is not rebuilt."""
    params = {"trainable": trainable, "batch_normalization": batchnorm,
              "activation": jax.nn.relu}
    c = lambda w: max(1, int(w * channel_factor))  # noqa: E731
    l = (dict(stem_layers) if stem_layers is not None
         else encoder_stem(ctx, inputs, prefix, trainable=trainable,
                           batchnorm=batchnorm,
                           channel_factor=channel_factor))
    with ctx.scope(prefix):
        l["conv2_2"] = ll.conv2d(ctx, l["conv2_1"], c(128), 3, "conv2_2",
                                 **params)
        l["pool2"] = ll.max_pool2d(ctx, l["conv2_2"], 2, 2)
        l["conv3_1"] = ll.conv2d(ctx, l["pool2"], c(256), 3, "conv3_1",
                                 **params)
        l["conv3_2"] = ll.conv2d(ctx, l["conv3_1"], c(256), 3, "conv3_2",
                                 **params)
        l["conv3_3"] = ll.conv2d(ctx, l["conv3_2"], c(256), 3, "conv3_3",
                                 **params)
        l["pool3"] = ll.max_pool2d(ctx, l["conv3_3"], 2, 2)
    return l


def encoder_tail(ctx, l, prefix, num_units, dropout_rate=0.0, trainable=True,
                 batchnorm=True, dropout_layers=(), channel_factor=1.0):
    """pool3 dropout .. 'fused' — the (possibly stochastic) encoder rest.
    ``l`` is the layer dict from :func:`encoder_head`; mutates and
    returns it."""
    params = {"trainable": trainable, "batch_normalization": batchnorm,
              "activation": jax.nn.relu}
    c = lambda w: max(1, int(w * channel_factor))  # noqa: E731
    with ctx.scope(prefix):
        last_layer = l["pool3"]
        # MC-dropout after pool3/pool4 runs with training=True always
        # (reference simple_fcn.py:49-64).
        if "pool3" in dropout_layers:
            l["pool3_drop"] = ll.dropout(ctx, l["pool3"], dropout_rate)
            last_layer = l["pool3_drop"]
        l["conv4_1"] = ll.conv2d(ctx, last_layer, c(512), 3, "conv4_1",
                                 **params)
        l["conv4_2"] = ll.conv2d(ctx, l["conv4_1"], c(512), 3, "conv4_2",
                                 **params)
        l["conv4_3"] = ll.conv2d(ctx, l["conv4_2"], c(512), 3, "conv4_3",
                                 **params)
        l["pool4"] = ll.max_pool2d(ctx, l["conv4_3"], 2, 2)
        last_layer = l["pool4"]
        # quirk kept: the reference gates pool4 dropout on 'pool3' too
        # (simple_fcn.py:61)
        if "pool3" in dropout_layers:
            l["pool4_drop"] = ll.dropout(ctx, l["pool4"], dropout_rate)
            last_layer = l["pool4_drop"]
        l["conv5_1"] = ll.conv2d(ctx, last_layer, c(512), 3, "conv5_1",
                                 **params)
        l["conv5_2"] = ll.conv2d(ctx, l["conv5_1"], c(512), 3, "conv5_2",
                                 **params)
        l["conv5_3"] = ll.conv2d(ctx, l["conv5_2"], c(512), 3, "conv5_3",
                                 **params)

        conv4_3 = l["conv4_3"]
        if "conv4_3" in dropout_layers:
            conv4_3 = ll.dropout(ctx, conv4_3, dropout_rate)
        score_conv4 = ll.conv2d(ctx, conv4_3, num_units, 1, "score_conv4",
                                **params)
        conv5_3 = l["conv5_3"]
        if "conv5_3" in dropout_layers:
            conv5_3 = ll.dropout(ctx, conv5_3, dropout_rate)
        score_conv5 = ll.conv2d(ctx, conv5_3, num_units, 1, "score_conv5",
                                **params)
        # the deconvolution is always frozen (simple_fcn.py:80-83)
        upscore_conv5 = ll.deconv2d(ctx, score_conv5, num_units, 4,
                                    "upscore_conv5", strides=2,
                                    activation=jax.nn.relu,
                                    batch_normalization=batchnorm,
                                    trainable=False)
        l["fused"] = score_conv4 + upscore_conv5
    return l


def encoder(ctx, inputs, prefix, num_units, dropout_rate=0.0, trainable=True,
            batchnorm=True, dropout_layers=(), channel_factor=1.0,
            stem_layers=None):
    """VGG16 image encoder with fusion of conv4_3 and conv5_3 features
    (reference simple_fcn.py:10-87). Returns dict of layer outputs; the
    encoding has key 'fused'. Composed of :func:`encoder_head` (the
    deterministic conv1..pool3 prefix) and :func:`encoder_tail` (the
    dropout-bearing rest) — identical layer names and numerics."""
    l = encoder_head(ctx, inputs, prefix, dropout_rate=dropout_rate,
                     trainable=trainable, batchnorm=batchnorm,
                     dropout_layers=dropout_layers,
                     channel_factor=channel_factor, stem_layers=stem_layers)
    return encoder_tail(ctx, l, prefix, num_units, dropout_rate=dropout_rate,
                        trainable=trainable, batchnorm=batchnorm,
                        dropout_layers=dropout_layers,
                        channel_factor=channel_factor)


def decoder(ctx, features, prefix, num_units, num_classes, trainable=True,
            batchnorm=True, dropout_rate=None):
    """FCN feature decoder (reference simple_fcn.py:90-134): frozen
    16x16/stride-8 bilinear upsampling + 1x1 class score conv (no activation
    before the softmax).

    Keep this pair as two ops: fusing them in phase-channel form (score
    conv before the depth-to-space interleave) measured 2.3x faster in
    ISOLATION but +0.8 ms in-model — any score matmul consuming the
    un-interleaved phase tensor regresses the full forward, however the
    contraction is written (scripts/fused_decoder_inmodel_probe.py,
    docs/TIMING.md round-5 rejection)."""
    with ctx.scope(prefix):
        if dropout_rate is not None:
            features = ll.dropout(ctx, features, dropout_rate)
        upscore = ll.deconv2d(ctx, features, num_units, 16, "upscore",
                              strides=8, activation=jax.nn.relu,
                              batch_normalization=batchnorm, trainable=False)
        score = ll.conv2d(ctx, upscore, num_classes, 1, "score",
                          activation=None, batch_normalization=batchnorm,
                          trainable=trainable)
    return {"upscore": upscore, "score": score}


def fcn(ctx, inputs, prefix, num_units, num_classes, trainable=True,
        dropout_rate=0, dropout_layers=(), batchnorm=True,
        channel_factor=1.0, stem_layers=None):
    """Full FCN: encoder + decoder (reference simple_fcn.py:137-170)."""
    layers = encoder(ctx, inputs, prefix, num_units,
                     dropout_rate=dropout_rate, trainable=trainable,
                     batchnorm=batchnorm, dropout_layers=dropout_layers,
                     channel_factor=channel_factor, stem_layers=stem_layers)
    layers.update(decoder(
        ctx, layers["fused"], prefix, num_units, num_classes,
        trainable=trainable, batchnorm=batchnorm,
        dropout_rate=(dropout_rate if "features" in dropout_layers
                      else None)))
    return layers


class SimpleFCN(Estimator):
    """FCN expert model (reference simple_fcn.py:173-224).

    Args:
        prefix: variable-name prefix (the modality column name).
        data_description: tuple from dataset.get_data_description().
        modality: key of the input modality in data batches.
        num_units: feature units in the FCN.
        batch_normalization, dropout_rate, train_encoder: see reference.
    """

    # VGG16 stack: every small-spatial conv (conv5 block, score_conv5 at
    # 48x24) measures as an int8 WIN — no pixel floor needed (estimator
    # ptq_min_pixels doc; scripts/int8_decoder_probe.py)
    ptq_min_pixels = 0

    def __init__(self, prefix, data_description, modality, output_dir=None,
                 **config):
        self.prefix = prefix
        self.modality = modality
        standard_config = {"train_encoder": True, "dropout_rate": 0,
                           "batch_normalization": True}
        standard_config.update(config)
        Estimator.__init__(self, data_description, output_dir=output_dir,
                           **standard_config)

    def _fcn(self, ctx, x):
        return fcn(ctx, x, self.prefix, self.config["num_units"],
                   self.config["num_classes"],
                   trainable=self.config["train_encoder"],
                   batchnorm=self.config["batch_normalization"],
                   channel_factor=self.config.get("channel_factor", 1.0))

    def _train_outputs(self, ctx, batch):
        layers = self._fcn(ctx, batch[self.modality])
        prob = ll.log_softmax(layers["score"])
        return {"loss": cross_entropy(prob, batch["labels"],
                                      axis_name=ctx.spatial_axis)}

    def _test_outputs(self, ctx, batch):
        layers = self._fcn(ctx, batch[self.modality])
        prob = ll.softmax(layers["score"])
        return {"prob": prob, "prediction": prob.argmax(-1)}
