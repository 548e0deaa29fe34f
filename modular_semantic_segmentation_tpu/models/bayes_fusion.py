"""Bayes fusion of expert classifications via confusion-matrix likelihoods
(reference xview/models/bayes_mix.py).

Inference-time cost on TPU: the experts dominate; the fusion itself is a
small-table gather + add + argmax fused into the same XLA program. The
decision-matrix fast path (config ``use_decision_matrix``) replaces it with
a single K^E lookup (reference bayes_mix.py:61-112, timing.py:86-128).
"""

import numpy as np
import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops import fusion_math as fm
from modular_semantic_segmentation_tpu.models.fusion_base import FusionModel


class BayesFusion(FusionModel):
    """Mixture of CNN experts following the 'bayes mix' method.

    Args:
        confusion_matrices: dict {modality: [K, K] matrix} measured on the
            measure set. Alternatively ``eval_experiments`` maps modalities
            to past experiment ids whose stored confusion matrices are
            loaded (reference bayes_mix.py:128-150).
        class_prior: 'data' | 'uniform' | float mixture weight.
    """

    def __init__(self, output_dir=None, confusion_matrices=False, **config):
        standard_config = {"learning_rate": 0.0, "class_prior": "data"}
        standard_config.update(config)

        self.confusion_matrices = {}
        if confusion_matrices:
            for key, matrix in confusion_matrices.items():
                self.confusion_matrices[key] = np.asarray(
                    matrix, "float32").T
        else:
            from modular_semantic_segmentation_tpu.utils.experiment import \
                ExperimentData
            for key, exp_id in config["eval_experiments"].items():
                stored = ExperimentData(exp_id).get_record()["info"][
                    "confusion_matrix"]
                if isinstance(stored, dict):  # un-decoded record form
                    stored = stored["values"]
                self.confusion_matrices[key] = np.array(stored).astype(
                    "float32").T

        FusionModel.__init__(self, name="BayesFusion", output_dir=output_dir,
                             **standard_config)

    def _fusion(self, expert_outputs):
        classifications = [expert_outputs[m]["classification"]
                           for m in self.modalities]
        matrices = [self.confusion_matrices[m] for m in self.modalities]
        if self.config.get("use_decision_matrix"):
            table = fm.bayes_decision_matrix(matrices,
                                             self.config["class_prior"])
            prediction = fm.apply_decision_matrix(table, classifications)
            return {"prediction": prediction}
        fused_score, likelihoods, conditionals = fm.bayes_fusion(
            classifications, matrices, self.config["class_prior"])
        out = {"prediction": jnp.argmax(fused_score, 3),
               "fused_score": fused_score}
        for m, ll_, cond in zip(self.modalities, likelihoods, conditionals):
            out[f"{m}_likelihood"] = ll_
            out[f"{m}_conditional"] = cond
        return out

    def get_insight(self, data):
        """Per-pixel fusion diagnostics for a batch dict: (probs,
        likelihoods, conditionals, prediction) per modality order
        (reference bayes_fusion.py:54-61 collect_data consumer)."""
        probs = [self.predict(data, output_attr=f"{m}_prob")
                 for m in self.modalities]
        likelihoods = [self.predict(data, output_attr=f"{m}_likelihood")
                       for m in self.modalities]
        conditionals = [self.predict(data, output_attr=f"{m}_conditional")
                        for m in self.modalities]
        return probs, likelihoods, conditionals, self.predict(data)
