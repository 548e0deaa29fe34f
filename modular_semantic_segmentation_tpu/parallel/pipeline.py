"""Pipeline parallelism (serving): network stages on separate devices.

The reference runs everything on one device (SURVEY.md §2.10 marks PP "not
needed" for capacity at this model size), so this module ships the form of
pipeline parallelism that actually pays on TPU serving: the network is split
into stages, each stage's parameters are resident on their own device, and
microbatches are streamed through. JAX's async dispatch overlaps stage ``i``
of microbatch ``m`` with stage ``i+1`` of microbatch ``m-1`` — GPipe's
inference schedule, with the inter-stage activation hop riding ICI via an
explicit ``device_put``. No bubbles: inference has no backward pass.
"""

import jax
import numpy as np


class Pipeline:
    """Multi-stage pipelined executor.

    Args:
        stages: list of ``(fn, variables)`` where ``fn(variables, x) -> y``
            is a pure stage function; stage 0 receives the microbatch, each
            later stage receives the previous stage's output.
        devices: one device per stage (default: the first ``len(stages)``
            of ``jax.devices()``).
    """

    def __init__(self, stages, devices=None):
        if devices is None:
            devices = jax.devices()[:len(stages)]
        if len(devices) != len(stages):
            raise ValueError(
                f"{len(stages)} stages need {len(stages)} devices, "
                f"got {len(devices)}")
        self._stages = []
        for (fn, variables), device in zip(stages, devices):
            placed = {key: jax.device_put(value, device)
                      for key, value in variables.items()}
            self._stages.append((jax.jit(fn), placed, device))

    def dispatch(self, microbatches):
        """Stream microbatches through all stages; returns per-microbatch
        outputs as (possibly still-executing) device arrays."""
        outputs = []
        for microbatch in microbatches:
            value = microbatch
            for fn, variables, device in self._stages:
                value = jax.tree.map(
                    lambda leaf: jax.device_put(leaf, device), value)
                value = fn(variables, value)
            outputs.append(value)
        return outputs

    def __call__(self, microbatches):
        """Pipelined run; blocks and returns stacked NumPy outputs."""
        outputs = self.dispatch(microbatches)
        return np.concatenate([np.asarray(out) for out in outputs], axis=0)


def fcn_inference_pipeline(estimator, devices=None):
    """Split a SimpleFCN estimator into an (encoder | decoder) two-stage
    inference pipeline (stage boundary at the 'fused' skip feature,
    reference simple_fcn.py:137-170).

    Returns a :class:`Pipeline` whose microbatch outputs are the argmax
    predictions, identical to ``estimator.predict``.
    """
    from modular_semantic_segmentation_tpu.models.simple_fcn import (
        encoder, decoder)
    from modular_semantic_segmentation_tpu.ops import layers as ll
    from modular_semantic_segmentation_tpu.ops.variables import Ctx

    config = estimator.config
    prefix, modality = estimator.prefix, estimator.modality
    decoder_scopes = (f"{prefix}/upscore/", f"{prefix}/score/")
    encoder_vars, decoder_vars = {}, {}
    for name, value in estimator.variables.items():
        target = (decoder_vars if name.startswith(decoder_scopes)
                  else encoder_vars)
        target[name] = value

    def encoder_stage(variables, batch):
        ctx = Ctx(variables, train=False,
                  compute_dtype=estimator.compute_dtype,
                  act_scales=estimator.act_scales)
        inputs = estimator._preprocess(batch)[modality]
        return encoder(ctx, inputs, prefix, config["num_units"],
                       trainable=config["train_encoder"],
                       batchnorm=config["batch_normalization"])["fused"]

    def decoder_stage(variables, features):
        ctx = Ctx(variables, train=False,
                  compute_dtype=estimator.compute_dtype,
                  act_scales=estimator.act_scales)
        score = decoder(ctx, features, prefix, config["num_units"],
                        config["num_classes"],
                        trainable=config["train_encoder"],
                        batchnorm=config["batch_normalization"])["score"]
        return ll.softmax(score).argmax(-1)

    return Pipeline([(encoder_stage, encoder_vars),
                     (decoder_stage, decoder_vars)], devices=devices)
