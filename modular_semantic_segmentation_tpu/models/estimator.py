"""Estimator — the framework kernel (TPU-native BaseModel equivalent).

Replaces the reference's graph/session god-class
(xview/models/base_model.py:51-451) with a functional runtime:

    * variables are a flat pytree dict; train/eval steps are jitted pure
      functions (optionally pjit-sharded over a Mesh — see parallel/);
    * the twin train/test pipelines with shared weights become two traces of
      the same network function with ``ctx.train`` flipped — no tf.AUTO_REUSE;
    * the confusion matrix is accumulated ON DEVICE across eval batches, one
      transfer at the end (vs per-batch host sync in base_model.py:308-313);
    * batch-norm moving stats update functionally (no UPDATE_OPS);
    * partial final batches are padded with ignore-labels (-1) so every XLA
      program has a static shape — no recompiles, no OutOfRangeError dance.

Public API preserved (reference README.md:60-87): fit / predict / score /
load_weights / import_weights / export_weights / close, context manager.

Subclass contract:
    _train_outputs(ctx, batch) -> dict with 'loss'   (labels arrive one-hot)
    _test_outputs(ctx, batch)  -> dict with 'prediction' (+ 'prob', ...)
An eval-only model (custom_training=True) only needs _test_outputs.
"""

import json
import os
import pickle
import time
from os import path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from modular_semantic_segmentation_tpu.ops.variables import (
    Ctx, init_variables, split_trainable)
from modular_semantic_segmentation_tpu.ops import metrics as metrics_lib
from modular_semantic_segmentation_tpu.models import params as params_lib
from modular_semantic_segmentation_tpu.utils.data_io import (
    iterate_batches, training_batches, to_device_prefetched)


def _make_optimizer(name, learning_rate):
    """Optimizer registry (reference base_model.py:157-162)."""
    optimizers = {
        "adagrad": lambda lr: optax.adagrad(lr),
        "adam": lambda lr: optax.adam(lr),
        "rmsprop": lambda lr: optax.rmsprop(lr, decay=0.9),
    }
    return optimizers[name](learning_rate)


class Estimator:
    """Base class for all models. See module docstring."""

    #: whether this class's _test_outputs routes FCN expert stems through
    #: the cross-expert packed stack (models/packed_experts.py) when
    #: eligible — quantize_for_serving only judges stem convs at the
    #: packed width for classes that will actually run the packed op
    packs_expert_stems = False

    #: default min_pixels for quantize_for_serving. The spatial floor
    #: exists for AdapNet (1x1 bottlenecks at 48x24 regress int8 —
    #: docs/TIMING.md); VGG/FCN-family models override to 0 because their
    #: smallest-spatial convs (the 512-in conv5 block + score_conv5 at
    #: 48x24) MEASURE as int8 wins: 3.73 -> 3.65 ms/frame on the fused
    #: Bayes flagship (scripts/int8_decoder_probe.py, round 5)
    ptq_min_pixels = 2048

    def __init__(self, data_description, name=None, output_dir=None,
                 custom_training=False, batchsize=1, compute_dtype="float32",
                 **config):
        self.name = name if name is not None else type(self).__name__
        self.output_dir = output_dir
        self.custom_training = custom_training
        self.config = config
        self.config["batchsize"] = batchsize
        self.config["num_classes"] = data_description[2]
        self.data_description = data_description
        self.compute_dtype = jnp.bfloat16 if compute_dtype == "bfloat16" \
            else jnp.float32
        self.global_step = 0
        self._closed = False
        # int8 PTQ serving: None = float path; set by quantize_for_serving
        self.act_scales = None

        self._rng = jax.random.PRNGKey(int(config.get("seed", 0)))
        self._build()

        if not self.custom_training:
            self._optimizer = _make_optimizer(
                self.config.get("trainer", "adam"),
                self.config.get("learning_rate", 0.0001))
            train_vars, _ = split_trainable(self.variables, self.trainable)
            self.opt_state = self._optimizer.init(
                {k: jnp.asarray(v) for k, v in train_vars.items()})
        else:
            self._optimizer = None
            self.opt_state = None

        self._jit_train_step = jax.jit(self._train_step)
        self._jit_eval_step = jax.jit(self._eval_step, static_argnames=())

    # ------------------------------------------------------------------ build
    def _example_batch(self, batchsize=1, spatial=(32, 32)):
        """Tiny concrete batch from the data description, for init tracing."""
        dtypes, shapes, num_classes = self.data_description
        batch = {}
        for modality, shape in shapes.items():
            shape = [batchsize] + [
                (spatial[i] if i < 2 and (s is None) else s)
                for i, s in enumerate(shape)]
            shape = [s if s is not None else spatial[0] for s in shape]
            if modality == "labels":
                batch[modality] = jnp.zeros(shape, jnp.int32)
            else:
                batch[modality] = jnp.zeros(shape, jnp.float32)
        if "labels" in batch:
            batch["labels_onehot"] = jax.nn.one_hot(
                batch["labels"], num_classes, dtype=jnp.float32)
        return batch

    def _build(self):
        """Initialize all variables by tracing the train and test networks."""
        example = self._example_batch()

        def both(ctx, batch):
            if not self.custom_training:
                train_batch = dict(batch)
                train_batch["labels"] = batch.get("labels_onehot")
                ctx.train = True
                self._train_outputs(ctx, train_batch)
            ctx.train = False
            self._test_outputs(ctx, batch)

        self._rng, init_rng = jax.random.split(self._rng)
        self.variables, self.trainable = init_variables(
            both, init_rng, example, compute_dtype=self.compute_dtype)

    # ------------------------------------------------------------- contracts
    def _train_outputs(self, ctx, batch):
        """Subclass contract: return a dict with key 'loss'.

        CONSTRAINT when ``microbatch_size`` is configured: the loss must
        be the valid-pixel MEAN (normalized by the one-hot label count,
        i.e. ops/losses.cross_entropy) — the microbatch accumulation
        recombines gradients weighted by each microbatch's non-void
        pixel count, which reconstructs the full-batch gradient only for
        that loss form. A subclass with a differently-normalized loss or
        additive regularizers must not be trained with microbatching.
        """
        raise NotImplementedError

    def _test_outputs(self, ctx, batch):
        raise NotImplementedError

    # ----------------------------------------------------------------- steps
    def _preprocess(self, batch):
        """Device-side input normalization fused into the jitted step.

        config ``input_scaling``: {modality: scale | (scale, offset)}. Lets
        the host ship compact uint8 frames and moves normalize into the
        forward program (SURVEY.md §7 design mapping). Integer inputs
        (uint8 compact transfer, DataSource(compact_transfer=True)) are
        always promoted to float32 here — identical numerics to a host
        astype, at a quarter of the H2D bytes."""
        scaling = self.config.get("input_scaling") or {}
        out = dict(batch)
        for modality, value in batch.items():
            if modality in ("labels", "labels_onehot"):
                continue
            spec = scaling.get(modality)
            if spec is not None:
                scale, offset = (spec if isinstance(spec, (tuple, list))
                                 else (spec, 0.0))
                out[modality] = value.astype(jnp.float32) * scale + offset
            elif jnp.issubdtype(value.dtype, jnp.integer):
                out[modality] = value.astype(jnp.float32)
        return out

    def _microbatch_grads(self, variables, batch, rng, spatial_axis):
        """Loss, valid-pixel weight, BN updates and gradients for one
        (micro)batch — the body shared by the plain and the
        gradient-accumulation paths of :meth:`_train_step`."""
        num_classes = self.config["num_classes"]
        if self.config.get("device_augmentation"):
            if spatial_axis is not None:
                raise NotImplementedError(
                    "device_augmentation resamples across the height axis "
                    "and cannot run under spatial partitioning")
            # augmentation runs on device INSIDE the jitted step (the host
            # pipeline was the reference's bottleneck, SURVEY.md §7); raw
            # [0, 255] frames in, same probability-gated op set
            from modular_semantic_segmentation_tpu.ops import device_augment
            rng, aug_rng = jax.random.split(rng)
            batch = device_augment.augment_batch(
                aug_rng, batch, **self.config["device_augmentation"])
        train_batch = dict(self._preprocess(batch))
        train_batch["labels"] = jax.nn.one_hot(
            batch["labels"], num_classes, dtype=jnp.float32)
        train_vars, frozen_vars = split_trainable(variables, self.trainable)

        def loss_fn(tvars):
            ctx = Ctx({**frozen_vars, **tvars}, train=True, rng=rng,
                      compute_dtype=self.compute_dtype,
                      spatial_axis=spatial_axis)
            out = self._train_outputs(ctx, train_batch)
            return out["loss"], ctx.updates

        if self.config.get("remat"):
            # Rematerialization: recompute forward activations during the
            # backward pass instead of keeping them resident — trades
            # FLOPs for HBM so memory-bound configs (large batches /
            # oversized frames on one chip) fit. Semantics-preserving by
            # construction (jax.checkpoint); gradient equality locked by
            # tests/test_simple_fcn.py::test_remat_training_matches_plain.
            loss_fn = jax.checkpoint(loss_fn)

        (loss, bn_updates), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(train_vars)
        weight = jnp.sum(train_batch["labels"])  # non-void pixel count
        return loss, weight, bn_updates, grads

    def _train_step(self, variables, opt_state, batch, rng,
                    spatial_axis=None):
        micro = int(self.config.get("microbatch_size") or 0)
        batchsize = int(next(iter(batch.values())).shape[0])
        if micro:
            # loud misconfiguration: a user who set microbatch_size is
            # relying on the small per-microbatch program (memory or the
            # large-batch tiling penalty) — silently running the
            # full-batch path would defeat exactly that
            if spatial_axis is not None:
                raise NotImplementedError(
                    "microbatch_size does not compose with spatial "
                    "partitioning (distribute_spatial)")
            if batchsize % micro:
                raise ValueError(
                    f"microbatch_size={micro} must divide the batch "
                    f"size ({batchsize})")
        if micro and batchsize > micro:
            # Gradient accumulation over statically-unrolled microbatches:
            # XLA's spatial tiling degrades at batch >1 for these
            # full-frame shapes (batch-4 step 54.9 ms vs 4x11.0 unrolled,
            # docs/TIMING.md), so each microbatch runs the efficient
            # batch-`micro` program and one optimizer step consumes the
            # pixel-weighted mean. The masked CE is a valid-pixel mean, so
            # weighting each microbatch gradient by its non-void pixel
            # count reconstructs the full-batch gradient exactly —
            # EXCEPT batch-norm batch statistics, which become
            # per-microbatch ("ghost batch norm"); moving stats update
            # with the microbatch mean. Opt-in via microbatch_size.
            num, den = None, 0.0
            loss_sum = 0.0
            bn_acc = {}
            steps = batchsize // micro
            for i in range(steps):
                rng, sub = jax.random.split(rng)
                # STRIDED partition (i::steps), not contiguous blocks:
                # under data-parallel sharding the batch axis is split
                # across devices, and a strided slice keeps every
                # microbatch balanced over the mesh (a contiguous block
                # would live on a subset of devices and serialize them).
                # Any partition is an equally valid grouping — the
                # pixel-weighted accumulation below is partition-exact.
                sl = {k: v[i::steps] for k, v in batch.items()}
                loss_i, w, bn_i, g_i = self._microbatch_grads(
                    variables, sl, sub, None)
                weighted = jax.tree.map(lambda a: a * w, g_i)
                num = weighted if num is None else jax.tree.map(
                    lambda a, b: a + b, num, weighted)
                den = den + w
                loss_sum = loss_sum + loss_i * w
                for k, v in bn_i.items():
                    bn_acc.setdefault(k, []).append(v)
            scale = 1.0 / jnp.maximum(den, 1e-20)
            grads = jax.tree.map(lambda a: a * scale, num)
            loss = loss_sum * scale
            bn_updates = {k: sum(vs) / len(vs) for k, vs in bn_acc.items()}
        else:
            loss, _, bn_updates, grads = self._microbatch_grads(
                variables, batch, rng, spatial_axis)
        train_vars, _ = split_trainable(variables, self.trainable)
        if spatial_axis is not None:
            # Every shard differentiates its own copy of the (identical,
            # psum-global) loss; the transpose of the loss psum replicates
            # the cotangent to all shards, so each local grad is already
            # N x (that shard's pixel contribution). pmean — not psum —
            # therefore reconstructs the exact global gradient (verified
            # against the unsharded step in tests/test_parallel.py), after
            # which every shard applies an identical optimizer update.
            grads = jax.lax.pmean(grads, spatial_axis)
        updates, opt_state = self._optimizer.update(grads, opt_state,
                                                    train_vars)
        train_vars = optax.apply_updates(train_vars, updates)
        new_vars = {**variables, **train_vars, **bn_updates}
        return new_vars, opt_state, loss

    def _eval_step(self, variables, batch, rng, spatial_axis=None):
        ctx = Ctx(variables, train=False, rng=rng,
                  compute_dtype=self.compute_dtype,
                  act_scales=self.act_scales, spatial_axis=spatial_axis)
        out = self._test_outputs(ctx, self._preprocess(batch))
        if "labels" in batch:
            out["confusion_matrix"] = metrics_lib.confusion_matrix(
                out["prediction"], batch["labels"],
                self.config["num_classes"])
            if spatial_axis is not None:
                out["confusion_matrix"] = jax.lax.psum(
                    out["confusion_matrix"], spatial_axis)
        return out

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # ------------------------------------------------------------------- fit
    def fit(self, data, iterations, output=True, validation_dataset=None,
            validation_interval=100, additional_eval_datasets=None):
        """Train for ``iterations`` steps (reference base_model.py:179-261).

        Args:
            data: a DataSource (from dataset.get_trainset()), a dict of
                arrays, or an iterator of batch dicts.
            validation_dataset: scored every ``validation_interval`` steps.
        """
        if self.custom_training:
            raise UserWarning(
                f"ERROR: Model {self.name} does not support training")
        additional_eval_datasets = additional_eval_datasets or {}
        # decode/augment/pack in a worker pool (native ops + cv2 release
        # the GIL); default pool size = host cores, so a 1-core box stays
        # sequential while real hosts overlap assembly with device compute
        workers = self.config.get("loader_workers", os.cpu_count())
        # shuffle order derives from the model seed: two runs with the
        # same config see the same data order (full-trajectory
        # reproducibility; the reference's tf.data shuffle was unseeded)
        batches = training_batches(data, self.config["batchsize"],
                                   workers=workers,
                                   seed=int(self.config.get("seed", 0)))
        batches = to_device_prefetched(batches)

        summary_file = None
        event_writer = None
        if self.output_dir is not None:
            summary_file = open(path.join(self.output_dir, "summaries.jsonl"),
                                "a")
            # reference-layout twin: a TF event file the reference's own
            # tooling (summary_iterator-based get_summary, notebooks) reads
            # directly (reference experiments/utils.py:130-149)
            from modular_semantic_segmentation_tpu.utils.tfevents import \
                EventWriter
            event_writer = EventWriter(self.output_dir)
        # periodic checkpoint for resume-from-step (the reference has no
        # failure recovery — SURVEY.md §5)
        checkpoint_interval = self.config.get("checkpoint_interval")

        print("INFO: Start training")
        start = time.time()
        for i in range(iterations):
            batch = next(batches)
            self.variables, self.opt_state, loss = self._jit_train_step(
                self.variables, self.opt_state, batch, self._next_rng())
            self.global_step += 1
            if (checkpoint_interval and self.output_dir is not None
                    and self.global_step % checkpoint_interval == 0):
                self.save_checkpoint(
                    path.join(self.output_dir, "checkpoint.pkl"))
            if i % validation_interval == 0 and validation_dataset is not None:
                score, _ = self.score(validation_dataset)
                if output:
                    print("{:4d}: loss {:.4f}, accuracy {:.2f}, IoU {:.2f}"
                          .format(i, float(loss), score["total_accuracy"],
                                  score["mean_IoU"]))
                record = {"step": self.global_step, "loss": float(loss),
                          "accuracy": float(score["total_accuracy"]),
                          "IoU": float(score["mean_IoU"]),
                          "wall_time": time.time() - start}
                for key, extra_data in additional_eval_datasets.items():
                    record[key] = float(self.score(extra_data)[0]["mean_IoU"])
                if summary_file is not None:
                    summary_file.write(json.dumps(record) + "\n")
                    summary_file.flush()
                if event_writer is not None:
                    event_writer.add_scalars(
                        self.global_step,
                        {k: v for k, v in record.items()
                         if k not in ("step", "wall_time")})
                if "abort_at_iou" in self.config and \
                        score["mean_IoU"] > self.config["abort_at_iou"]:
                    break
        if summary_file is not None:
            summary_file.close()
        if event_writer is not None:
            event_writer.close()
        print("INFO: Training finished.")

    # --------------------------------------------------------------- predict
    def predict(self, data, output_attr=None):
        """Per-pixel classification for the input data
        (reference base_model.py:263-292)."""
        attr = output_attr or "prediction"
        outputs = []
        for batch, valid in iterate_batches(data, self.config["batchsize"],
                                            pad=True):
            out = self._jit_eval_step(self.variables, batch, self._next_rng())
            if attr in out:
                value = out[attr]
            elif hasattr(self, attr):
                value = getattr(self, attr)
            else:
                raise AttributeError(
                    f"unknown output_attr '{attr}'; this model produces "
                    f"{sorted(k for k in out if k != 'confusion_matrix')}")
            outputs.append(np.asarray(value)[:valid])
        return np.concatenate(outputs)

    # ----------------------------------------------------------------- score
    def score(self, data, max_iterations=None):
        """Confusion-matrix metric suite (reference base_model.py:294-331).

        Returns (measures dict, confusion matrix)."""
        num_classes = self.config["num_classes"]
        total = jnp.zeros((num_classes, num_classes), jnp.float32)
        count = 0
        # un-distributed path: double-buffered H2D prefetch (the transfer of
        # batch i+1 overlaps the eval of batch i — utils/data_io.py). Mesh-
        # distributed steps keep host arrays: device-committed inputs must
        # not be fed to sharded programs.
        undistributed = (getattr(self, "_mesh", None) is None
                         and getattr(self, "_redistribute", None) is None)
        if undistributed:
            from modular_semantic_segmentation_tpu.utils.data_io import \
                prefetch_eval_batches
            batches = prefetch_eval_batches(data, self.config["batchsize"],
                                            pad_label=-1)
        else:
            batches = iterate_batches(data, self.config["batchsize"],
                                      pad=True, pad_label=-1)
        for batch, valid in batches:
            out = self._jit_eval_step(self.variables, batch, self._next_rng())
            total = total + out["confusion_matrix"]
            count += 1
            if max_iterations is not None and count >= max_iterations:
                break
        confusion = np.asarray(total)
        measures = metrics_lib.measures_from_confusion_matrix(confusion)
        return measures, confusion

    # ---------------------------------------------------------- quantization
    def quantize_for_serving(self, data, num_batches=8, min_channels=128,
                             percentile=100.0, min_pixels=None):
        """Enable int8 post-training-quantized inference (models/quantize.py).

        Calibrates per-conv activation scales on a few batches of ``data``
        (use the measure set — same data the fusion models are fitted on),
        then switches eligible convs (>= ``min_channels`` input channels
        AND >= ``min_pixels`` input positions — small-spatial convs lose
        to bf16, see quantize.select_scales) to the int8 MXU path for all
        subsequent predict/score calls. ``min_pixels=None`` uses the
        model family's measured default (``ptq_min_pixels``: 0 for the
        VGG/FCN family whose small-spatial convs win int8, 2048 for
        AdapNet whose bottlenecks regress). Training and weight IO are
        unaffected. To re-enable without recalibration, pass a previously
        returned scales dict AS ``data``. Returns the scales dict (empty
        + a warning if no conv qualifies — serving then stays on the
        float path).
        """
        from modular_semantic_segmentation_tpu.models import quantize as q
        if min_pixels is None:
            min_pixels = self.ptq_min_pixels
        if isinstance(data, dict) and all(
                isinstance(v, float) for v in data.values()):
            scales = data
        else:
            amax = q.calibrate_amax(self, data, num_batches=num_batches,
                                    percentile=percentile)
            # fusion models whose FCN stems run cross-expert-packed
            # (models/packed_experts.py) get their stem convs judged at
            # the packed width — int8-eligible where the per-expert
            # 64-ch convs are not. Gated on packs_expert_stems so
            # classes whose _test_outputs never packs (FusionFCN,
            # UncertaintyDirichletFusion) are never judged packed;
            # select_scales mirrors the remaining batch-shape gates.
            prefixes = self.config.get("prefixes")
            packed_prefixes = (
                list(prefixes.values())
                if self.packs_expert_stems
                and isinstance(prefixes, dict) and len(prefixes) >= 2
                and self.config.get("expert_model") == "fcn"
                and self.config.get("pack_experts", True) else None)
            scales = q.select_scales(amax, self.variables,
                                     min_channels=min_channels,
                                     min_pixels=min_pixels,
                                     packed_stem_prefixes=packed_prefixes)
        if not scales:
            print("WARNING: quantize_for_serving found no eligible conv "
                  f"(>= {min_channels} input channels and >= {min_pixels} "
                  "input positions) — serving stays float.")
        self.act_scales = scales or None
        # fresh jit wrapper: the scales are baked into the trace as
        # constants, so the old compiled cache must not be reused
        self._rejit_eval_step()
        return scales

    def dequantize_serving(self):
        """Return to the float serving path."""
        self.act_scales = None
        self._rejit_eval_step()

    def _rejit_eval_step(self):
        """Invalidate the compiled eval step, preserving any mesh shardings
        installed by parallel.distribute()/distribute_tp() (each records its
        own re-apply closure so quantize/dequantize cannot silently replace
        a tensor-parallel layout with replicated shardings)."""
        redistribute = getattr(self, "_redistribute", None)
        if redistribute is not None:
            redistribute()
        else:
            self._jit_eval_step = jax.jit(self._eval_step)

    # ------------------------------------------------------------- weight IO
    def export_weights(self, save_dir=None):
        out_dir = save_dir or self.output_dir
        if out_dir is None:
            print("ERROR: No path specified to save weights to.")
            return None
        store = {k: np.asarray(v) for k, v in self.variables.items()}
        store["global_step"] = np.asarray(self.global_step)
        return params_lib.export_weights(store, out_dir, self.name,
                                         self.global_step)

    def import_weights(self, filepath, translate_prefix=False,
                       chill_mode=False, warnings=True):
        self.variables, report = params_lib.import_weights(
            self.variables, filepath, translate_prefix=translate_prefix,
            chill_mode=chill_mode, warnings=warnings)
        # keep the variable dict device-resident so eval-only models do not
        # re-upload weights on every predict/score call
        self.variables = {k: jax.device_put(v)
                          for k, v in self.variables.items()}
        return report

    def load_weights(self, filepath):
        """Restore a full checkpoint (weights [+ optimizer state + step])."""
        if filepath.endswith(".npz"):
            self.import_weights(filepath, warnings=False)
            return
        with open(filepath, "rb") as f:
            state = pickle.load(f)
        self.variables = {k: jax.device_put(np.asarray(v))
                          for k, v in state["variables"].items()}
        self.global_step = int(state.get("global_step", 0))
        if state.get("opt_state") is not None and self.opt_state is not None:
            leaves, _ = jax.tree_util.tree_flatten(self.opt_state)
            treedef = jax.tree_util.tree_structure(self.opt_state)
            self.opt_state = jax.tree_util.tree_unflatten(
                treedef, [np.asarray(x) for x in state["opt_state"]])

    def save_checkpoint(self, filepath):
        """Periodic checkpoint incl. optimizer state, for resume-from-step
        (the reference has none — SURVEY.md §5 failure detection)."""
        state = {
            "variables": {k: np.asarray(v) for k, v in self.variables.items()},
            "global_step": self.global_step,
            "opt_state": None if self.opt_state is None else [
                np.asarray(x)
                for x in jax.tree_util.tree_flatten(self.opt_state)[0]],
        }
        with open(filepath, "wb") as f:
            pickle.dump(state, f)
        return filepath

    # ----------------------------------------------------------- API parity
    def close(self):
        """No session to close — kept for API parity."""
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()
