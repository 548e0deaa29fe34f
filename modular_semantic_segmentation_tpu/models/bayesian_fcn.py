"""BayesianFCN — MC-dropout uncertainty FCN
(reference xview/models/bayesian_fcn.py, after Kendall's Bayesian SegNet,
arXiv 1511.02680).

N stochastic forward passes produce the mean probability plus three
uncertainty maps: entropy of the mean, mean conditional entropy, and summed
variance (reference bayesian_fcn.py:9-57). Temperature scaling supported via
config ``temperature_scaling``.
"""

import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops import layers as ll
from modular_semantic_segmentation_tpu.ops.losses import cross_entropy
from modular_semantic_segmentation_tpu.models.simple_fcn import (
    decoder, encoder_head, encoder_tail, fcn)
from modular_semantic_segmentation_tpu.models.uncertainty_model import \
    UncertaintyModel


def sampling_uncertainty(samples):
    """Mean probability + uncertainty dict from stacked MC samples
    [S, N, H, W, K] (reference bayesian_fcn.py:48-57)."""
    mean = jnp.mean(samples, axis=0)
    return mean, {
        "entropy": ll.entropy(mean),
        "cond_entropy": jnp.mean(ll.entropy(samples), axis=0),
        "variance": jnp.sum(jnp.var(samples, axis=0), axis=-1),
    }


class BayesianFCN(UncertaintyModel):
    """FCN with MC-dropout sampling uncertainty.

    Config: num_units, dropout_rate, num_samples, method ('sampling'),
    dropout_layers (default pool3/pool4/conv4_3/conv5_3/features),
    temperature_scaling (optional softmax temperature).
    """

    ptq_min_pixels = 0  # VGG16 stack: see SimpleFCN.ptq_min_pixels

    def __init__(self, prefix, data_description, modality, output_dir=None,
                 dropout_layers=("pool3", "pool4", "conv4_3", "conv5_3",
                                 "features"),
                 **config):
        self.prefix = prefix
        self.modality = modality
        standard_config = {"method": "sampling", "num_samples": 10,
                           "dropout_rate": 0.5, "batch_normalization": True}
        standard_config.update(config)
        UncertaintyModel.__init__(self, data_description,
                                  output_dir=output_dir,
                                  dropout_layers=tuple(dropout_layers),
                                  **standard_config)

    def _sample_pipeline(self, ctx, inputs, stochastic=True):
        layers = fcn(ctx, inputs, self.prefix, self.config["num_units"],
                     self.config["num_classes"],
                     dropout_rate=(self.config["dropout_rate"]
                                   if stochastic else 0),
                     dropout_layers=(self.config["dropout_layers"]
                                     if stochastic else ()),
                     batchnorm=self.config["batch_normalization"],
                     channel_factor=self.config.get("channel_factor", 1.0))
        return layers

    def _train_outputs(self, ctx, batch):
        layers = self._sample_pipeline(ctx, batch[self.modality])
        log_prob = ll.log_softmax(layers["score"])
        return {"loss": cross_entropy(log_prob, batch["labels"],
                                      axis_name=ctx.spatial_axis)}

    def _test_outputs(self, ctx, batch):
        temperature = self.config.get("temperature_scaling", 1.0)
        cfg = self.config
        # Every dropout site sits after pool3 (the reference gates
        # pool3/pool4/conv4_3/conv5_3/features only, simple_fcn.py:49-78
        # — encoder_head is deterministic by construction), so the N MC
        # samples share ONE head pass and run the stochastic tail +
        # decoder as a single batch of N*B elements: convs/pools/eval-BN
        # are batch-element-independent and dropout draws an independent
        # mask per element, so this computes sample-for-sample what an
        # N-loop would, with N-fold pixel parallelism in the deep convs.
        head = encoder_head(ctx, batch[self.modality], self.prefix,
                            batchnorm=cfg["batch_normalization"],
                            channel_factor=cfg.get("channel_factor", 1.0))
        n = cfg["num_samples"]
        tail = encoder_tail(
            ctx, {"pool3": jnp.concatenate([head["pool3"]] * n, axis=0)},
            self.prefix, cfg["num_units"],
            dropout_rate=cfg["dropout_rate"],
            dropout_layers=cfg["dropout_layers"],
            batchnorm=cfg["batch_normalization"],
            channel_factor=cfg.get("channel_factor", 1.0))
        dec = decoder(
            ctx, tail["fused"], self.prefix, cfg["num_units"],
            cfg["num_classes"], batchnorm=cfg["batch_normalization"],
            dropout_rate=(cfg["dropout_rate"]
                          if "features" in cfg["dropout_layers"] else None))
        stacked = ll.softmax(dec["score"], temperature=temperature)
        samples = stacked.reshape((n, stacked.shape[0] // n)
                                  + stacked.shape[1:])
        mean, uncertainties = sampling_uncertainty(samples)
        out = {"prob": mean, "prediction": jnp.argmax(mean, 3)}
        out.update(uncertainties)
        return out
