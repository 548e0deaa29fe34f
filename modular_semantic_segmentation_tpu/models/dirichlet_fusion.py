"""Dirichlet fusion — continuous generalization of the Bayes mix
(reference xview/models/dirichlet_mix.py).

Per (expert, class) a Dirichlet distribution over the expert's softmax
simplex, fitted by EM on a held-out measure set. Inference evaluates all
class-conditional log-densities as one [pixels, K] @ [K, C] MXU contraction
(ops/fusion_math.py / ops/pallas/dirichlet_kernel.py).

The reference's fit() tears down and rebuilds its TF graph
(dirichlet_mix.py:257) and forces callers to re-import expert weights
(dirichlet_fusion.py:66-67); here parameters are plain data, so fit() only
re-specializes the jitted eval step — weights survive.
"""

from copy import deepcopy

import numpy as np
import jax
import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops import fusion_math as fm
from modular_semantic_segmentation_tpu.ops.dirichlet_estimation import \
    find_dirichlet_priors
from modular_semantic_segmentation_tpu.models.fusion_base import (
    FusionModel, test_pipeline)
from modular_semantic_segmentation_tpu.utils.data_io import iterate_batches


class DirichletFusion(FusionModel):
    """Mixture of CNN experts following the 'dirichlet mix' method.

    Args:
        prefixes: dict {modality: prefix} of the experts.
        sigma: Dirichlet temperature.
        delta, beta: EM regularizers (see ops/dirichlet_estimation.py).
        estimator: 'differentiation' (default — the penalized contrastive
            solver the reference imports, dirichlet_mix.py:9) |
            'estimation' (the alternate Sklar solver without the negative
            statistic, reference dirichlet_mix.py:8) | 'fixedpoint' |
            'meanprecision' (Minka fastfit, reference dirichlet_mix.py:6-7).
        class_prior: 'data' | 'uniform' | float.
        measurement_exp / dirichlet_params: preload fitted parameters;
            otherwise call fit() before inference
            (reference dirichlet_mix.py:56-79).
    """

    def __init__(self, output_dir=None, **config):
        standard_config = {"learning_rate": 0.0, "sigma": 1.0,
                           "class_prior": "data", "delta": 1e-2,
                           "beta": 1e-2, "estimator": "differentiation"}
        standard_config.update(config)
        # reference API accepts 'modalities' with prefix == modality name
        # (dirichlet_mix.py:62, 98)
        if "prefixes" not in standard_config:
            standard_config["prefixes"] = {
                m: m for m in standard_config.pop("modalities")}

        measurements = None
        if "measurement_exp" in config:
            from modular_semantic_segmentation_tpu.utils.experiment import \
                ExperimentData
            measurements = dict(np.load(ExperimentData(
                config["measurement_exp"]).get_artifact("counts.npz")))
        elif "dirichlet_params" in config:
            measurements = standard_config.pop("dirichlet_params")

        modalities = list(standard_config["prefixes"].keys())
        if measurements is not None:
            self.dirichlet_params = {
                m: np.asarray(measurements[m], "float32")
                for m in modalities}
            self.class_counts = np.asarray(measurements["class_counts"],
                                           "float32")
        else:
            self.dirichlet_params = None
            self.class_counts = None
            print("WARNING: Could not yet import measurements, you need to "
                  "fit this model first.")

        FusionModel.__init__(self, name="DirichletFusion",
                             output_dir=output_dir, **standard_config)

    # ------------------------------------------------------------ inference
    def _prior(self):
        data_prior = self.class_counts / (1e-20 + self.class_counts.sum())
        return fm.class_prior(self.config["class_prior"], data_prior)

    def _fusion(self, expert_outputs):
        # normalize probs defensively, as the reference does
        # (dirichlet_mix.py:100-102)
        probs = {m: expert_outputs[m]["prob"] /
                 jnp.sum(expert_outputs[m]["prob"], axis=3, keepdims=True)
                 for m in self.modalities}
        if self.dirichlet_params is None:
            # measurement phase: no fusion defined yet
            # (reference dirichlet_mix.py:165-168)
            shape = expert_outputs[self.modalities[0]]["classification"].shape
            out = {"prediction": jnp.zeros(shape, jnp.int32),
                   "fused_score": jnp.zeros(shape + (
                       self.config["num_classes"],), jnp.float32)}
            for m in self.modalities:
                out[f"{m}_norm_prob"] = probs[m]
            return out
        if self.config.get("use_pallas"):
            # fused single-pass VMEM kernel (ops/pallas/dirichlet_kernel.py).
            # Off by default: measured on the v5e it is ~35x slower than the
            # XLA path below because Mosaic pads K=14 to the 128-lane width
            # (docs/TIMING.md "Pallas kernels on the real chip").
            from modular_semantic_segmentation_tpu.ops.pallas import \
                dirichlet_kernel
            prediction = dirichlet_kernel.dirichlet_fusion_label(
                [probs[m] for m in self.modalities],
                [self.dirichlet_params[m] for m in self.modalities],
                self._prior(), sigma=self.config["sigma"])
            out = {"prediction": prediction}
            for m in self.modalities:
                out[f"{m}_norm_prob"] = probs[m]
            return out
        fused = fm.dirichlet_fusion(
            [probs[m] for m in self.modalities],
            [self.dirichlet_params[m] for m in self.modalities],
            self._prior(), sigma=self.config["sigma"])
        out = {"prediction": jnp.argmax(fused, 3), "fused_score": fused}
        for m in self.modalities:
            out[f"{m}_norm_prob"] = probs[m]
        return out

    # -------------------------------------------------------------- fitting
    def _stats_step(self, variables, batch):
        from modular_semantic_segmentation_tpu.ops.variables import Ctx
        ctx = Ctx(variables, train=False)
        num_classes = self.config["num_classes"]
        out = {}
        for m in self.modalities:
            prob = test_pipeline(ctx, batch[m], self.config["prefixes"][m],
                                 **self.config)["prob"]
            ss, counts = fm.dirichlet_sufficient_statistics(
                prob, batch["labels"], num_classes)
            out[m] = ss
            out["class_counts"] = counts
        return out

    def _get_sufficient_statistic(self, data):
        """Accumulate per-true-class sums of log expert probabilities over
        the measure set, on device (reference dirichlet_mix.py:173-205)."""
        num_classes = self.config["num_classes"]
        stats_step = jax.jit(self._stats_step)
        counts = {m: np.zeros((num_classes, num_classes))
                  for m in self.modalities}
        class_counts = np.zeros(num_classes, "int64")
        for batch, _ in iterate_batches(data, self.config["batchsize"],
                                        pad=True, pad_label=-1):
            out = stats_step(self.variables, batch)
            for m in self.modalities:
                counts[m] += np.asarray(out[m], np.float64)
            class_counts += np.asarray(out["class_counts"], "int64")
        return counts, class_counts

    def _fit_sufficient_statistic(self, counts, class_counts):
        """Per-class Dirichlet EM on the host
        (reference dirichlet_mix.py:207-257). The solver is selected by
        config['estimator'] — the reference keeps all four importable
        (dirichlet_mix.py:6-9) but only 'differentiation' wired in."""
        import modular_semantic_segmentation_tpu.ops.dirichlet_estimation \
            as de

        num_classes = self.config["num_classes"]
        estimator = self.config.get("estimator", "differentiation")

        def solve(ss, neg_ss, n_obs):
            prior = np.ones(num_classes, "float64")
            if estimator == "differentiation":
                return find_dirichlet_priors(
                    ss, neg_ss, prior, max_iter=10000,
                    delta=self.config["delta"], beta=self.config["beta"])
            if estimator == "estimation":
                return de.find_dirichlet_priors_alt(
                    ss, prior, max_iter=10000, delta=self.config["delta"])
            if estimator in ("fixedpoint", "meanprecision"):
                fit = (de.fixedpoint_with_sufficient_statistic
                       if estimator == "fixedpoint"
                       else de.meanprecision_with_sufficient_statistic)
                return fit(ss, n_obs, num_classes, prior,
                           delta=self.config["delta"])
            raise ValueError(f"unknown estimator '{estimator}'")

        def dirichlet_em(measurements):
            params = np.ones((num_classes, num_classes), "float64")
            for c in range(num_classes):
                if class_counts[c] == 0:
                    continue
                ss = (measurements[c, :] / class_counts[c]).astype("float64")
                neg_ss = (measurements.sum(0) - measurements[c, :]) / \
                    (class_counts.sum() - class_counts[c])
                params[:, c] = solve(ss, neg_ss, class_counts[c])
            return params

        self.dirichlet_params = {m: dirichlet_em(counts[m]).astype("float32")
                                 for m in self.modalities}
        self.class_counts = class_counts.astype("float32")
        # re-specialize the jitted eval step with the fitted constants
        # (the functional analogue of the reference's graph rebuild)
        self._jit_eval_step = jax.jit(self._eval_step)

    def prediction_difference(self, data):
        """Per-branch diagnostics for the given data: fused label/score and
        each expert's normalized probabilities
        (reference dirichlet_mix.py:275-294)."""
        ret = {"fused_label": self.predict(data),
               "fused_score": self.predict(data,
                                           output_attr="fused_score")}
        for m in self.modalities:
            ret[f"{m}_prob"] = self.predict(data,
                                            output_attr=f"{m}_norm_prob")
        return ret

    def fit(self, data, *args, **kwargs):
        """Fit the Dirichlet parameters on the measure set. Returns the
        params dict incl. class_counts (reference dirichlet_mix.py:259-273).
        """
        counts, class_counts = self._get_sufficient_statistic(data)
        print("INFO: Measurements of classifiers finished, now EM")
        self._fit_sufficient_statistic(counts, class_counts)
        print("INFO: DirichletFusion fitted to data")
        ret = deepcopy(self.dirichlet_params)
        ret["class_counts"] = self.class_counts
        return ret
