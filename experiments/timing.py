"""Inference-timing harness (reference experiments/timing.py:23-311 +
Inference Time.ipynb, paper Table V).

Every command times jitted inference on a constant 1x768x384 input,
host->device transfer excluded (device-resident inputs +
block_until_ready), reporting mean +- std seconds/frame over
``repetitions``. The reference's bayes_lookup one-hot-contraction trick
existed because gather_nd had no GPU kernel; on TPU both paths are timed.

Usage: python -m experiments.timing [command] with k=v ...
Defaults: num_units=64, num_classes=14, repetitions=50, bfloat16 compute.
"""


import numpy as np

from modular_semantic_segmentation_tpu.utils.sacred_shim import (
    Experiment, apply_backspaces_and_linefeeds)
from modular_semantic_segmentation_tpu.models import get_model
from experiments.utils import get_observer

ex = Experiment()
ex.captured_out_filter = apply_backspaces_and_linefeeds
ex.observers.append(get_observer())

HEIGHT, WIDTH = 768, 384

DEFAULTS = dict(num_units=64, num_classes=14, repetitions=50,
                compute_dtype="bfloat16", num_samples=5, dropout_rate=0.2,
                int8=False, height=HEIGHT, width=WIDTH)


def _cfg(overrides):
    cfg = dict(DEFAULTS)
    cfg.update({k: v for k, v in overrides.items() if v is not None})
    return cfg


def _description(num_classes):
    return ({"labels": np.int32, "rgb": np.float32, "depth": np.float32},
            {"rgb": (None, None, 3), "depth": (None, None, 1),
             "labels": (None, None)}, num_classes)


def _inputs(modalities, cfg=None):
    h = (cfg or DEFAULTS)["height"]
    w = (cfg or DEFAULTS)["width"]
    shapes = {"rgb": (1, h, w, 3), "depth": (1, h, w, 1)}
    return {m: np.ones(shapes[m], np.float32) for m in modalities}


def _time(net, batch, cfg):
    repetitions = cfg["repetitions"]
    import jax
    from modular_semantic_segmentation_tpu.ops.variables import Ctx
    from modular_semantic_segmentation_tpu.utils.profiling import time_fn

    rng = jax.random.PRNGKey(0)

    if cfg.get("int8"):
        # int8 PTQ serving path (models/quantize.py; `with int8=True`) —
        # calibration inputs don't matter for timing, accuracy parity is
        # locked by tests/test_quantized_serving.py
        net.quantize_for_serving(batch, num_batches=1)

    def forward(variables, batch):
        ctx = Ctx(variables, train=False, rng=rng,
                  compute_dtype=net.compute_dtype,
                  act_scales=net.act_scales)
        return net._test_outputs(ctx, batch)["prediction"]

    fn = jax.jit(forward)
    device_batch = {k: jax.device_put(v) for k, v in batch.items()}
    # variables are already device-resident; device_put is a no-op then
    variables = {k: jax.device_put(v) for k, v in net.variables.items()}
    result = time_fn(fn, variables, device_batch, repetitions=repetitions)
    # The pipelined number is the chip's per-frame cost (production serving
    # loop); the sync number includes the host<->device link round trip.
    print(f"{net.name}: {result['pipelined_mean_s']:.4f} s/frame pipelined "
          f"({result['pipelined_fps']:.1f} fps); "
          f"{result['sync_mean_s']:.4f} +- {result['sync_std_s']:.4f} "
          "s/frame sync")
    # stored verbatim — experiments/report.build_timing_table reads these
    # keys (pipelined_mean_s / sync_mean_s / ...)
    return result


def _expert_config(cfg, modality):
    return dict(prefix=modality, modality=modality,
                num_units=cfg["num_units"],
                data_description=_description(cfg["num_classes"]),
                compute_dtype=cfg["compute_dtype"],
                batch_normalization=False)


def _fusion_config(cfg, **extra):
    base = dict(data_description=_description(cfg["num_classes"]),
                num_units=cfg["num_units"], expert_model="fcn",
                prefixes={"rgb": "rgb", "depth": "depth"},
                compute_dtype=cfg["compute_dtype"])
    base.update(extra)
    return base


def _random_cms(num_classes, seed=0):
    rng = np.random.RandomState(seed)
    return {m: rng.rand(num_classes, num_classes) + np.eye(num_classes) * 5
            for m in ("rgb", "depth")}


def _record(_run, name, result):
    _run.info.setdefault("timings", {})[name] = result


@ex.command
def time_rgb_fcn(_run, num_units=None, num_classes=None, repetitions=None,
                 compute_dtype=None, int8=None,
                 height=None, width=None):
    cfg = _cfg(locals())
    net = get_model("simple_fcn")(**_expert_config(cfg, "rgb"))
    _record(_run, "rgb_fcn", _time(net, _inputs(["rgb"], cfg),
                                   cfg))


@ex.command
def time_depth_fcn(_run, num_units=None, num_classes=None, repetitions=None,
                   compute_dtype=None, int8=None,
                 height=None, width=None):
    cfg = _cfg(locals())
    net = get_model("simple_fcn")(**_expert_config(cfg, "depth"))
    _record(_run, "depth_fcn", _time(net, _inputs(["depth"], cfg),
                                     cfg))


@ex.command
def time_fusion_fcn(_run, num_units=None, num_classes=None, repetitions=None,
                    compute_dtype=None, int8=None,
                 height=None, width=None):
    cfg = _cfg(locals())
    net = get_model("fusion_fcn")(
        data_description=_description(cfg["num_classes"]),
        prefixes={"rgb": "rgb", "depth": "depth"},
        num_units=cfg["num_units"], compute_dtype=cfg["compute_dtype"])
    _record(_run, "fusion_fcn",
            _time(net, _inputs(["rgb", "depth"], cfg), cfg))


@ex.command
def time_average_fcn(_run, num_units=None, num_classes=None,
                     repetitions=None, compute_dtype=None, int8=None,
                 height=None, width=None):
    cfg = _cfg(locals())
    net = get_model("average")(**_fusion_config(cfg))
    _record(_run, "average_fcn",
            _time(net, _inputs(["rgb", "depth"], cfg), cfg))


@ex.command
def time_bayes_fcn(_run, num_units=None, num_classes=None, repetitions=None,
                   compute_dtype=None, int8=None,
                 height=None, width=None):
    cfg = _cfg(locals())
    net = get_model("bayes_mix")(**_fusion_config(
        cfg, confusion_matrices=_random_cms(cfg["num_classes"])))
    _record(_run, "bayes_fcn",
            _time(net, _inputs(["rgb", "depth"], cfg), cfg))


@ex.command
def time_bayes_adapnet(_run, num_units=None, num_classes=None,
                       repetitions=None, compute_dtype=None, int8=None,
                 height=None, width=None):
    """Fused Bayes with ADAPNET experts — the expert architecture behind
    the reference's headline quality tables I-III (its Table V timing only
    covered the SimpleFCN family)."""
    cfg = _cfg(locals())
    net = get_model("bayes_mix")(**_fusion_config(
        cfg, confusion_matrices=_random_cms(cfg["num_classes"]),
        expert_model="adapnet"))
    _record(_run, "bayes_adapnet",
            _time(net, _inputs(["rgb", "depth"], cfg), cfg))


@ex.command
def time_bayes_lookup_fcn(_run, num_units=None, num_classes=None,
                          repetitions=None, compute_dtype=None, int8=None,
                 height=None, width=None):
    cfg = _cfg(locals())
    net = get_model("bayes_mix")(**_fusion_config(
        cfg, confusion_matrices=_random_cms(cfg["num_classes"]),
        use_decision_matrix=True))
    _record(_run, "bayes_lookup_fcn",
            _time(net, _inputs(["rgb", "depth"], cfg), cfg))


@ex.command
def time_dirichlet_fcn(_run, num_units=None, num_classes=None,
                       repetitions=None, compute_dtype=None, int8=None,
                 height=None, width=None):
    cfg = _cfg(locals())
    k = cfg["num_classes"]
    rng = np.random.RandomState(0)
    params = {m: rng.rand(k, k).astype("float32") + 1
              for m in ("rgb", "depth")}
    params["class_counts"] = np.ones(k, "float32")
    net = get_model("dirichlet_mix")(**_fusion_config(
        cfg, dirichlet_params=params, sigma=0.2))
    _record(_run, "dirichlet_fcn",
            _time(net, _inputs(["rgb", "depth"], cfg), cfg))


@ex.command
def time_variance_fcn(_run, num_units=None, num_classes=None,
                      repetitions=None, compute_dtype=None,
                      num_samples=None, dropout_rate=None, int8=None,
                 height=None, width=None):
    cfg = _cfg(locals())
    net = get_model("variance")(**_fusion_config(
        cfg, num_samples=cfg["num_samples"],
        dropout_rate=cfg["dropout_rate"]))
    _record(_run, "variance_fcn",
            _time(net, _inputs(["rgb", "depth"], cfg), cfg))


@ex.command
def time_adapnet(_run, num_units=None, num_classes=None, repetitions=None,
                 compute_dtype=None, int8=None, modality="rgb"):
    """AdapNet single-expert inference. The reference's Table V times only
    the SimpleFCN family (timing.py:23-311), but its headline quality
    tables (I-III) use AdapNet experts — this measures the architecture
    those numbers actually run on."""
    cfg = _cfg(dict(num_units=num_units, num_classes=num_classes,
                    repetitions=repetitions, compute_dtype=compute_dtype,
                    int8=int8))
    kwargs = _expert_config(cfg, modality)
    del kwargs["batch_normalization"]  # AdapNet always batch-normalizes
    net = get_model("adapnet")(**kwargs)
    _record(_run, f"adapnet_{modality}", _time(net, _inputs([modality], cfg),
                                               cfg))


def _serving_builders():
    """model name -> (build(cfg) -> net, modalities). Constructions mirror
    the per-call commands above exactly."""
    def dirichlet(cfg):
        k = cfg["num_classes"]
        rng = np.random.RandomState(0)
        params = {m: rng.rand(k, k).astype("float32") + 1
                  for m in ("rgb", "depth")}
        params["class_counts"] = np.ones(k, "float32")
        return get_model("dirichlet_mix")(**_fusion_config(
            cfg, dirichlet_params=params, sigma=0.2))

    def adapnet(cfg):
        kwargs = _expert_config(cfg, "rgb")
        del kwargs["batch_normalization"]
        return get_model("adapnet")(**kwargs)

    both = ["rgb", "depth"]
    return {
        "rgb_fcn": (lambda cfg: get_model("simple_fcn")(
            **_expert_config(cfg, "rgb")), ["rgb"]),
        "depth_fcn": (lambda cfg: get_model("simple_fcn")(
            **_expert_config(cfg, "depth")), ["depth"]),
        "adapnet": (adapnet, ["rgb"]),
        "average_fcn": (lambda cfg: get_model("average")(
            **_fusion_config(cfg)), both),
        "bayes_fcn": (lambda cfg: get_model("bayes_mix")(**_fusion_config(
            cfg, confusion_matrices=_random_cms(cfg["num_classes"]))), both),
        "bayes_adapnet": (lambda cfg: get_model("bayes_mix")(
            **_fusion_config(
                cfg, confusion_matrices=_random_cms(cfg["num_classes"]),
                expert_model="adapnet")), both),
        "dirichlet_fcn": (dirichlet, both),
        "fusion_fcn": (lambda cfg: get_model("fusion_fcn")(
            data_description=_description(cfg["num_classes"]),
            prefixes={"rgb": "rgb", "depth": "depth"},
            num_units=cfg["num_units"],
            compute_dtype=cfg["compute_dtype"]), both),
        "variance_fcn": (lambda cfg: get_model("variance")(**_fusion_config(
            cfg, num_samples=cfg["num_samples"],
            dropout_rate=cfg["dropout_rate"])), both),
    }


@ex.command
def time_serving(_run, model="bayes_fcn", unroll=4, num_units=None,
                 num_classes=None, repetitions=None, compute_dtype=None,
                 int8=None, height=None, width=None):
    """Production serving-loop timing: the InferenceServer unroll-N group
    program (N batch-1 frames per jitted dispatch, async in flight) for
    any timed model. The per-call commands above pay one dispatch per
    frame — the reference's semantics (timing.py:63-78) — which on a
    tunneled host adds ~0.9 ms/frame; this is the number a deployment
    actually serves at (docs/TIMING.md round-5 family tables).
    `with model=fusion_fcn int8=True unroll=4` etc."""
    import jax
    from modular_semantic_segmentation_tpu.serving import InferenceServer
    from modular_semantic_segmentation_tpu.utils.profiling import time_fn

    cfg = _cfg(dict(num_units=num_units, num_classes=num_classes,
                    repetitions=repetitions, compute_dtype=compute_dtype,
                    int8=int8, height=height, width=width))
    build, modalities = _serving_builders()[model]
    net = build(cfg)
    batch = _inputs(modalities, cfg)
    if cfg["int8"]:
        net.quantize_for_serving(batch, num_batches=1)
    program = InferenceServer(net, unroll=unroll).group_program
    variables = {k: jax.device_put(v) for k, v in net.variables.items()}
    group = [{k: jax.device_put(v) for k, v in batch.items()}
             for _ in range(unroll)]
    result = time_fn(program, variables, group, jax.random.PRNGKey(0),
                     repetitions=max(1, cfg["repetitions"] // unroll))
    per_frame = result["pipelined_mean_s"] / unroll
    result = dict(result, serving_s_per_frame=float(per_frame),
                  serving_fps=float(1.0 / per_frame), unroll=unroll)
    print(f"{net.name} serving (unroll={unroll}): {per_frame:.4f} s/frame "
          f"({1.0 / per_frame:.1f} fps)")
    _record(_run, f"serving_{model}" + ("_int8" if cfg["int8"] else ""),
            result)


@ex.command
def time_train_step(_run, num_units=None, num_classes=None,
                    repetitions=None, compute_dtype=None, batchsize=1,
                    augment=False, height=HEIGHT, width=WIDTH,
                    model="simple_fcn", microbatch=0, remat=False):
    """Full train step (forward + backward + Adam + BN stats) on constant
    frames, ``model`` in {simple_fcn, adapnet};
    ``augment=True`` adds the on-device augmentation chain
    (scale / crop-to-width / hflip / gamma, ops/device_augment.py). The
    reference has no training-throughput harness — its 60k-iteration runs
    were simply left running; this quantifies ours (docs/TIMING.md).
    Measured with the loop-difference device timer (the iteration loop runs
    on device, immune to host-link jitter)."""
    import jax
    from modular_semantic_segmentation_tpu.utils.profiling import \
        device_time_fn

    cfg = _cfg(dict(num_units=num_units, num_classes=num_classes,
                    repetitions=repetitions, compute_dtype=compute_dtype))
    kwargs = _expert_config(cfg, "rgb")
    kwargs["batch_normalization"] = True
    if model == "adapnet":
        del kwargs["batch_normalization"]  # AdapNet always batch-normalizes
    if augment:
        kwargs["device_augmentation"] = dict(
            scale=(0.4, 0.7, 1.5), crop=(1.0, width), hflip=0.5,
            gamma=(0.4, 0.3, 1.2))
    if microbatch:
        # gradient accumulation over unrolled microbatch programs
        # (estimator.py _train_step; ghost-BN statistics)
        kwargs["microbatch_size"] = int(microbatch)
    if remat:
        # rematerialize forward activations in the backward (jax.checkpoint)
        kwargs["remat"] = True
    net = get_model(model)(batchsize=batchsize, **kwargs)
    rng = np.random.RandomState(0)
    batch = {
        "rgb": jax.device_put(np.asarray(
            rng.rand(batchsize, height, width, 3) * 255, np.float32)),
        "labels": jax.device_put(rng.randint(
            0, cfg["num_classes"],
            (batchsize, height, width)).astype(np.int32))}
    variables = {k: jax.device_put(v) for k, v in net.variables.items()}
    opt_state = jax.device_put(net.opt_state)
    spf = device_time_fn(net._train_step, variables, opt_state, batch,
                         jax.random.PRNGKey(0), iters=8,
                         repetitions=cfg["repetitions"])
    result = {"s_per_step": spf, "img_per_s": batchsize / spf,
              "batchsize": batchsize, "augment": bool(augment),
              "model": model, "microbatch": int(microbatch)}
    print(f"{model} train step (batch {batchsize}, "
          f"augment={bool(augment)}): "
          f"{spf:.4f} s/step, {batchsize / spf:.1f} img/s")
    _record(_run, "train_step" if model == "simple_fcn"
            else f"train_step_{model}", result)


@ex.command
def time_offline_eval(_run, num_units=None, num_classes=None,
                      compute_dtype=None, int8=None, batchsize=8,
                      num_frames=100, height=HEIGHT, width=WIDTH):
    """Offline evaluation throughput: img/s for a full score() over a
    synthetic corpus, HOST LOADER INCLUDED — the reference's evaluation
    loop equivalent (xview/models/base_model.py:294-331), complementing
    the serving-latency rows. Batch 8 is the measured break-even for the
    batched eval path (docs/TIMING.md)."""
    import time

    from modular_semantic_segmentation_tpu.datasets.unittest_data import \
        UnittestData

    cfg = _cfg(dict(num_units=num_units, num_classes=num_classes,
                    compute_dtype=compute_dtype, int8=int8))
    k = min(cfg["num_classes"], 8)
    data = UnittestData(height=height, width=width, num_train=4,
                        num_measure=4, num_test=num_frames, num_classes=k)
    kwargs = _expert_config(cfg, "rgb")
    kwargs["data_description"] = UnittestData.get_data_description(
        num_classes=k)
    net = get_model("simple_fcn")(batchsize=batchsize, **kwargs)
    if cfg.get("int8"):
        net.quantize_for_serving(data.get_measureset(), num_batches=1)
    # Pre-materialize the corpus: the synthetic generator costs ~0.4 s per
    # 768x384 frame on this 1-core host and is NOT the production loader
    # (that is PNG decode + native augmentation, measured separately by
    # scripts/loader_bench.py at ~64 img/s/core). This row measures the
    # evaluation loop itself — batching, padding, host->device transfer,
    # device compute, on-device confusion accumulation.
    corpus = data.get_testset(tf_dataset=False)
    # compact transfer (the production path, DataSource(compact_transfer=
    # True)): uint8 rgb (estimator._preprocess promotes to f32 in-graph)
    # and int8 labels (confusion matrix widens on device) — quarter the
    # H2D bytes of both, the offline-eval bottleneck on this link
    corpus["rgb"] = corpus["rgb"].astype(np.uint8)
    corpus["labels"] = corpus["labels"].astype(np.int8)
    net.score(corpus, max_iterations=1)  # compile + warm cache
    start = time.perf_counter()
    measures, _ = net.score(corpus)
    wall = time.perf_counter() - start
    result = {"s_total": wall, "img_per_s": num_frames / wall,
              "num_frames": num_frames, "batchsize": batchsize,
              "int8": bool(cfg.get("int8"))}
    print(f"offline eval: {num_frames} frames in {wall:.2f} s = "
          f"{num_frames / wall:.1f} img/s (batch {batchsize}, "
          f"pre-materialized corpus; host PNG loader is a separate row, "
          f"loader_bench)")
    _record(_run, "offline_eval", result)


@ex.main
def main(_run, num_units=None, num_classes=None, repetitions=None,
         compute_dtype=None, int8=None,
                 height=None, width=None):
    """Time every configuration (the full paper Table V sweep)."""
    for cmd in [time_rgb_fcn, time_depth_fcn, time_average_fcn,
                time_bayes_fcn, time_bayes_lookup_fcn, time_dirichlet_fcn,
                time_fusion_fcn, time_variance_fcn]:
        cmd(_run=_run, num_units=num_units, num_classes=num_classes,
            repetitions=repetitions, compute_dtype=compute_dtype, int8=int8)


if __name__ == "__main__":
    ex.run_commandline()
