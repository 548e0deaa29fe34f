"""Fusion driver base: builds frozen expert networks per modality and fuses
their per-pixel outputs (reference xview/models/basic_fusion_model.py).

TPU note: the experts run inside ONE jitted eval step — XLA schedules both
expert convolution stacks plus the fusion math as a single program, so the
fusion overhead on top of the experts is an elementwise epilogue instead of
the reference's separate graph branches. With a device mesh the expert axis
can additionally be sharded (parallel/expert_parallel.py).
"""

from modular_semantic_segmentation_tpu.ops import layers as ll
from modular_semantic_segmentation_tpu.models.estimator import Estimator
from modular_semantic_segmentation_tpu.models.simple_fcn import fcn
from modular_semantic_segmentation_tpu.models.adapnet import adapnet


def test_pipeline(ctx, inputs, prefix, expert_model, num_units, num_classes,
                  batch_normalization=False, channel_factor=1.0,
                  stem_layers=None, **_):
    """Unified expert pipeline: FCN or AdapNet, frozen, + softmax 'prob' and
    argmax 'classification' (reference basic_fusion_model.py:9-23).

    ``batch_normalization`` defaults to False like the reference's hardcoded
    ``batchnorm=False`` (basic_fusion_model.py:17-18) — but can be enabled so
    experts TRAINED with batch norm transfer bit-exactly into the fusion
    (eval-mode BN uses the imported moving statistics). The reference could
    not fuse BN-trained experts at all; its own timing.py:29 carries a
    'TODO make sure this does not use batchnorm' wart.

    ``stem_layers``: precomputed conv1_1..conv2_1 layers from the
    cross-expert packed stem (models/packed_experts.py), FCN only."""
    if expert_model == "adapnet":
        outputs = adapnet(ctx, inputs, prefix, num_units, num_classes)
    elif expert_model == "fcn":
        outputs = fcn(ctx, inputs, prefix, num_units, num_classes,
                      trainable=False, batchnorm=batch_normalization,
                      channel_factor=channel_factor, stem_layers=stem_layers)
    else:
        raise UserWarning(f"ERROR: Expert Model {expert_model} not found")
    outputs["prob"] = ll.softmax(outputs["score"])
    # argmax of the raw score == argmax of its softmax (monotone), but XLA
    # cannot prove that — taking it from the score lets the softmax be
    # dead-code-eliminated in fusions that only use classifications (Bayes)
    outputs["classification"] = outputs["score"].argmax(-1)
    return outputs


def expert_pipelines(ctx, batch, modalities, config):
    """Per-modality expert outputs, cross-expert-packing the FCN stems
    when eligible (models/packed_experts.py: the lane-starved
    conv1_1..conv2_1 stacks of all experts run as one block-diagonal
    dense stack, 1.17x on the v5e; ``pack_experts=False`` disables)."""
    from modular_semantic_segmentation_tpu.models.packed_experts import (
        can_pack_stems, packed_fcn_stems)
    stems = {}
    if can_pack_stems(ctx, batch, modalities, config):
        stems = packed_fcn_stems(
            ctx, batch, modalities, config["prefixes"],
            channel_factor=config.get("channel_factor", 1.0),
            batch_normalization=config.get("batch_normalization", False))
    return {m: test_pipeline(ctx, batch[m], config["prefixes"][m],
                             stem_layers=stems.get(m), **config)
            for m in modalities}


class FusionModel(Estimator):
    """Mixture-of-experts base (reference basic_fusion_model.py:26-66).

    Config:
        prefixes: dict {modality: variable-name prefix} for the experts.
        expert_model: 'fcn' | 'adapnet'.
    """

    # _test_outputs -> expert_pipelines packs eligible FCN stems
    packs_expert_stems = True

    @property
    def ptq_min_pixels(self):
        """PTQ spatial floor by expert family: FCN's small-spatial convs
        win int8 (floor 0), AdapNet's bottlenecks regress (floor 2048) —
        see Estimator.ptq_min_pixels."""
        return 0 if self.config.get("expert_model") == "fcn" else 2048

    def __init__(self, name=None, output_dir=None, **config):
        self.modalities = list(config["prefixes"].keys())
        Estimator.__init__(self, data_description=config.pop(
            "data_description"), name=name, output_dir=output_dir,
            custom_training=True, **config)

    def _fusion(self, expert_outputs):
        """Fuse expert outputs into a prediction dict. Must return a dict
        containing at least 'prediction'."""
        raise NotImplementedError

    def _test_outputs(self, ctx, batch):
        expert_outputs = expert_pipelines(ctx, batch, self.modalities,
                                          self.config)
        out = self._fusion(expert_outputs)
        # expose per-expert diagnostics for predict(output_attr=...)
        for m in self.modalities:
            out[f"{m}_prob"] = expert_outputs[m]["prob"]
            out[f"{m}_classification"] = expert_outputs[m]["classification"]
        return out

    def import_expert_weights(self, weight_files, **kwargs):
        """Import per-expert npz files: {modality: filepath} or a single
        path for all (the experiment layer's dict-form starting_weights,
        reference evaluation.py:58-91)."""
        if isinstance(weight_files, str):
            return self.import_weights(weight_files, **kwargs)
        reports = {}
        for modality, filepath in weight_files.items():
            reports[modality] = self.import_weights(
                filepath, translate_prefix=self.config["prefixes"][modality],
                **kwargs)
        return reports
