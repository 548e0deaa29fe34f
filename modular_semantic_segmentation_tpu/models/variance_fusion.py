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
from modular_semantic_segmentation_tpu.models.simple_fcn import (
    decoder, encoder_head, encoder_tail)


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

    def _tail_prob(self, ctx, head_layers, prefix, dropout):
        """pool3 -> class probabilities; stochastic iff ``dropout``."""
        l = encoder_tail(
            ctx, dict(head_layers), prefix, self.config["num_units"],
            trainable=False, batchnorm=False,
            dropout_rate=self.config["dropout_rate"] if dropout else 0.0,
            dropout_layers=("pool3",) if dropout else ())
        dec = decoder(ctx, l["fused"], prefix, self.config["num_units"],
                      self.config["num_classes"], trainable=False,
                      batchnorm=False)
        return ll.softmax(dec["score"])

    def _test_outputs(self, ctx, batch):
        from modular_semantic_segmentation_tpu.models.packed_experts import (
            can_pack_stems, packed_fcn_stems)
        probs, variances = {}, {}
        num_samples = self.config["num_samples"]
        # the deterministic heads pack across experts like every other
        # FCN fusion (models/packed_experts.py); the stochastic tails
        # start at pool3, untouched
        stems = {}
        if can_pack_stems(ctx, batch, self.modalities, self.config):
            stems = packed_fcn_stems(ctx, batch, self.modalities,
                                     self.config["prefixes"],
                                     batch_normalization=False)
        for m in self.modalities:
            prefix = self.config["prefixes"][m]
            # The dropout sites are pool3/pool4 (reference
            # variance_mix.py:46-69 resamples the WHOLE network), so
            # conv1..pool3 — ~55% of the expert's FLOPs — is
            # deterministic: compute it ONCE and fan out the stochastic
            # tails + the clean classification tail. Identical sampling
            # distribution. The N stochastic tails run as ONE tail at
            # batch N*B: encoder_tail reads only 'pool3', its convs and
            # pools are batch-element-independent, and dropout draws an
            # independent mask per batch element — so the batched pass
            # computes sample-for-sample what the N-loop did, while the
            # tail's deep 96x48/48x24 convs (which underfeed the MXU at
            # batch 1) get N-fold pixel parallelism.
            head = encoder_head(ctx, batch[m], prefix, trainable=False,
                                batchnorm=False, stem_layers=stems.get(m))
            # classification prob comes from a clean pass
            probs[m] = self._tail_prob(ctx, head, prefix, dropout=False)
            if self.config["dropout_rate"] == 0 or num_samples < 2:
                # At dropout 0 (or a single sample) the MC sampling
                # distribution is a point mass: every stochastic pass IS
                # the clean pass and the sample variance is exactly zero
                # by definition. Running the batched tail here would
                # instead measure XLA's ulp-scale per-batch-position
                # reduction-order noise, which 1/(1e-20 + var) amplifies
                # into arbitrary expert selection — so return the exact
                # answer (zeros) without the redundant N-fold pass.
                variances[m] = jnp.zeros(
                    probs[m].shape[:-1] + (1,), probs[m].dtype)
                continue
            tiled = {"pool3": jnp.concatenate(
                [head["pool3"]] * num_samples, axis=0)}
            stacked = self._tail_prob(ctx, tiled, prefix, dropout=True)
            samples = stacked.reshape(
                (num_samples, stacked.shape[0] // num_samples)
                + stacked.shape[1:])
            variances[m] = jnp.mean(jnp.var(samples, axis=0), axis=3,
                                    keepdims=True)

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
