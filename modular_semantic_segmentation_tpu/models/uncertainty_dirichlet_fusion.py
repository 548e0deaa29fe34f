"""Dirichlet fusion modulated by per-pixel MC-dropout uncertainty
(reference xview/models/uncertainty_dirichlet_mix.py).

Per expert, N stochastic passes with WHOLE-PIXEL input dropout (noise shape
with channel dim 1, reference :120-128) give a per-pixel variance; the
normalized variance blends the fitted Dirichlet concentrations toward the
uninformative I+1 parameters (reference :18-52). Fitting is inherited from
DirichletFusion (same EM).
"""

import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops import layers as ll
from modular_semantic_segmentation_tpu.ops import fusion_math as fm
from modular_semantic_segmentation_tpu.models.dirichlet_fusion import \
    DirichletFusion
from modular_semantic_segmentation_tpu.models.fusion_base import test_pipeline


class UncertaintyDirichletFusion(DirichletFusion):
    """Config: everything DirichletFusion takes, plus num_samples and
    dropout_rate for the input-level MC-dropout."""

    # overrides _test_outputs with per-expert MC-dropout pipelines that
    # bypass expert_pipelines — the packed stem never runs here
    packs_expert_stems = False

    def __init__(self, output_dir=None, **config):
        standard_config = {"num_samples": 10, "dropout_rate": 0.2}
        standard_config.update(config)
        DirichletFusion.__init__(self, output_dir=output_dir,
                                 **standard_config)

    def _test_outputs(self, ctx, batch):
        num_classes = self.config["num_classes"]
        probs, uncertainties = {}, {}
        for m in self.modalities:
            prefix = self.config["prefixes"][m]
            inputs = batch[m]

            def stochastic_pass():
                n, h, w, _ = inputs.shape
                noisy = ll.dropout(ctx, inputs, self.config["dropout_rate"],
                                   noise_shape=(n, h, w, 1))
                return test_pipeline(ctx, noisy, prefix,
                                     **self.config)["prob"]

            samples = jnp.stack(
                [stochastic_pass()
                 for _ in range(self.config["num_samples"])], axis=4)
            variance = jnp.var(samples, axis=4)
            # mix in [0, 1]: per-pixel mean variance over the global max
            # (reference uncertainty_dirichlet_mix.py:28-31)
            mix = jnp.mean(variance, axis=3) / (1e-20 + jnp.max(variance))
            clean = test_pipeline(ctx, inputs, prefix, **self.config)["prob"]
            probs[m] = clean / jnp.sum(clean, axis=3, keepdims=True)
            uncertainties[m] = mix

        if self.dirichlet_params is None:
            shape = next(iter(probs.values())).shape[:-1]
            return {"prediction": jnp.zeros(shape, jnp.int32),
                    "fused_score": jnp.zeros(shape + (num_classes,),
                                             jnp.float32)}
        fused = fm.dirichlet_uncertainty_fusion(
            [probs[m] for m in self.modalities],
            [self.dirichlet_params[m] for m in self.modalities],
            [uncertainties[m] for m in self.modalities],
            self._prior(), sigma=self.config["sigma"])
        out = {"prediction": jnp.argmax(fused, 3), "fused_score": fused}
        for m in self.modalities:
            out[f"{m}_prob"] = probs[m]
            out[f"{m}_uncertainty"] = uncertainties[m]
        return out
