"""Averaging fusion (reference xview/models/average_mix.py)."""

import jax.numpy as jnp

from modular_semantic_segmentation_tpu.models.fusion_base import FusionModel


class AverageFusion(FusionModel):
    """Mixture of CNN experts by averaging their probability vectors."""

    def __init__(self, output_dir=None, **config):
        FusionModel.__init__(self, name="AverageFusion",
                             output_dir=output_dir, **config)

    def _fusion(self, expert_outputs):
        average_prob = jnp.mean(
            jnp.stack([expert_outputs[m]["prob"] for m in self.modalities]),
            axis=0)
        return {"prediction": average_prob.argmax(-1),
                "fused_score": average_prob}
