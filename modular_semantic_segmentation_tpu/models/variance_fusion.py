"""MC-dropout variance-weighted fusion
(reference xview/models/variance_mix.py + experiments/timing.py:180-233).

Each expert runs N stochastic forward passes with dropout after pool3; the
per-pixel sample variance weights the (clean) expert probabilities by
inverse variance. On TPU the N samples are an extra batch axis — the
stochastic passes are stacked so XLA runs them as one batched convolution
program instead of N sequential graph executions.
"""

import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops import layers as ll
from modular_semantic_segmentation_tpu.ops import fusion_math as fm
from modular_semantic_segmentation_tpu.models.fusion_base import FusionModel
from modular_semantic_segmentation_tpu.models.simple_fcn import fcn


class VarianceFusion(FusionModel):
    """Config: prefixes/modalities, num_units, dropout_rate, num_samples;
    expert_model must be 'fcn' (reference variance_mix.py:51)."""

    def __init__(self, output_dir=None, **config):
        standard_config = {"learning_rate": 0.0, "num_samples": 10}
        standard_config.update(config)
        if "prefixes" not in standard_config:
            standard_config["prefixes"] = {
                m: m for m in standard_config.pop("modalities")}
        assert standard_config.get("expert_model", "fcn") == "fcn"
        standard_config["expert_model"] = "fcn"
        FusionModel.__init__(self, name="VarianceFusion",
                             output_dir=output_dir, **standard_config)

    def _sample_prob(self, ctx, inputs, prefix):
        layers = fcn(ctx, inputs, prefix, self.config["num_units"],
                     self.config["num_classes"], trainable=False,
                     dropout_rate=self.config["dropout_rate"],
                     dropout_layers=("pool3",), batchnorm=False)
        return ll.softmax(layers["score"])

    def _test_outputs(self, ctx, batch):
        probs, variances = {}, {}
        for m in self.modalities:
            prefix = self.config["prefixes"][m]
            inputs = batch[m]
            # N stochastic passes; weights are shared, only dropout rngs
            # differ. Stacked on a leading axis -> one batched XLA program.
            samples = jnp.stack(
                [self._sample_prob(ctx, inputs, prefix)
                 for _ in range(self.config["num_samples"])], axis=4)
            variance = jnp.mean(jnp.var(samples, axis=4), axis=3,
                                keepdims=True)
            # classification prob comes from a clean pass
            clean = fcn(ctx, inputs, prefix, self.config["num_units"],
                        self.config["num_classes"], trainable=False,
                        batchnorm=False)
            probs[m] = ll.softmax(clean["score"])
            variances[m] = variance

        norm_probs = {m: probs[m] / jnp.sum(probs[m], axis=3, keepdims=True)
                      for m in self.modalities}
        fused = fm.variance_fusion(
            jnp.stack([probs[m] for m in self.modalities]),
            jnp.stack([variances[m] for m in self.modalities]))
        out = {"prediction": jnp.argmax(fused, 3), "fused_score": fused}
        for m in self.modalities:
            out[f"{m}_prob"] = norm_probs[m]
            out[f"{m}_variance"] = variances[m]
        return out
