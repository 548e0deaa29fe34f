"""int8 post-training-quantized serving (models/quantize.py).

A TPU-native production feature with no reference equivalent: symmetric
per-tensor activation scales + per-output-channel weight scales on the
deep convs, everything else float. These tests lock (a) the conv-level
quantization error bound, (b) calibration/eligibility mechanics, and
(c) end-to-end score parity on a trained model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from modular_semantic_segmentation_tpu.ops import layers
from modular_semantic_segmentation_tpu.ops.variables import Ctx, init_variables
from modular_semantic_segmentation_tpu.models import get_model, quantize


def test_conv2d_int8_error_bounded():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 16, 16, 128).astype(np.float32) * 4 - 2)

    def net(ctx, x):
        return layers.conv2d(ctx, x, 32, 3, "conv", activation=None,
                             use_bias=False)

    variables, _ = init_variables(net, jax.random.PRNGKey(0), x)
    want = net(Ctx(variables), x)

    amax = float(jnp.max(jnp.abs(x)))
    got = net(Ctx(variables, act_scales={"conv/input_amax": amax / 127.0}), x)

    # int8 symmetric quantization: error per operand is <= step/2; the
    # 9*128-term dot concentrates well below the worst case.
    scale = float(jnp.max(jnp.abs(want)))
    err = float(jnp.max(jnp.abs(got - want))) / scale
    assert err < 0.05, err
    # and it must actually differ from the float path (the int8 branch ran)
    assert float(jnp.max(jnp.abs(got - want))) > 0


def test_conv2d_calibration_records_amax():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 8, 8, 16).astype(np.float32) * 2 - 1)

    def net(ctx, x):
        return layers.conv2d(ctx, x, 8, 3, "convA", activation=jax.nn.relu,
                             use_bias=True)

    variables, _ = init_variables(net, jax.random.PRNGKey(0), x)
    ctx = Ctx(variables, calibrate=True)
    net(ctx, x)
    assert "convA/input_amax" in ctx.amax
    np.testing.assert_allclose(float(ctx.amax["convA/input_amax"]),
                               float(jnp.max(jnp.abs(x))), rtol=1e-6)


def test_calibration_running_max_over_reentrant_scopes():
    """MC-sampling models re-enter the same conv scope several times per
    forward (variance_fusion); calibration must keep the max over ALL
    invocations, not the last one."""
    big = jnp.ones((1, 4, 4, 8), jnp.float32) * 7.0
    small = jnp.ones((1, 4, 4, 8), jnp.float32) * 2.0

    def net(ctx, xs):
        outs = []
        for x in xs:  # same scope, two invocations
            outs.append(layers.conv2d(ctx, x, 4, 3, "shared",
                                      activation=None, use_bias=False))
        return outs[0] + outs[1]

    variables, _ = init_variables(net, jax.random.PRNGKey(0), [big, small])
    ctx = Ctx(variables, calibrate=True)
    net(ctx, [big, small])
    np.testing.assert_allclose(float(ctx.amax["shared/input_amax"]), 7.0)
    ctx = Ctx(variables, calibrate=True)
    net(ctx, [small, big])  # order must not matter
    np.testing.assert_allclose(float(ctx.amax["shared/input_amax"]), 7.0)


def test_select_scales_eligibility():
    variables = {
        "rgb/conv1_1/kernel": jnp.zeros((3, 3, 3, 64)),
        "rgb/conv4_1/kernel": jnp.zeros((3, 3, 256, 512)),
        "rgb/score/kernel": jnp.zeros((1, 1, 512, 14)),
    }
    amax = {
        "rgb/conv1_1/input_amax": 2.0,
        "rgb/conv4_1/input_amax": 8.0,
        "rgb/score/input_amax": 4.0,
        "rgb/nosuchconv/input_amax": 1.0,
    }
    scales = quantize.select_scales(amax, variables, min_channels=128)
    assert set(scales) == {"rgb/conv4_1/input_amax",
                           "rgb/score/input_amax"}
    assert scales["rgb/conv4_1/input_amax"] == pytest.approx(8.0 / 127.0)

    # min_pixels rule: convs whose calibrated input spatial extent is
    # below the floor fall back to the float path (AdapNet's 48x24
    # bottlenecks regressed int8, docs/TIMING.md); absent pixel metadata
    # (hand-written scales dicts) keeps the conv eligible.
    amax["rgb/conv4_1/input_pixels"] = 48 * 24
    amax["rgb/score/input_pixels"] = 96 * 48
    scales = quantize.select_scales(amax, variables, min_channels=128,
                                    min_pixels=2048)
    assert set(scales) == {"rgb/score/input_amax"}
    assert "input_pixels" not in " ".join(scales)  # metadata never emitted


@pytest.fixture(scope="module")
def trained_fcn():
    from modular_semantic_segmentation_tpu.datasets import get_dataset
    data = get_dataset("unittest")(batchsize=4)
    description = data.get_data_description()
    net = get_model("simple_fcn")(
        data_description=description, prefix="rgb", modality="rgb",
        num_units=32, batchsize=4, learning_rate=0.002,
        batch_normalization=True, output_dir=None)
    net.fit(data.get_trainset(), 60)
    return net, data


def test_quantized_serving_score_parity(trained_fcn):
    net, data = trained_fcn
    float_measures, _ = net.score(data.get_testset())

    # toy 32x32 frames: every conv input is under the production
    # min_pixels floor, so disable it (full-res eligibility is locked by
    # test_select_scales_eligibility + the TIMING.md sweep)
    scales = net.quantize_for_serving(data.get_measureset(), num_batches=2,
                                      min_channels=64, min_pixels=0)
    assert scales, "no convs were quantized"
    assert net.act_scales
    int8_measures, _ = net.score(data.get_testset())

    # PTQ on the deep convs must not visibly move segmentation quality
    assert abs(int8_measures["total_accuracy"]
               - float_measures["total_accuracy"]) < 0.02
    assert abs(int8_measures["mean_IoU"] - float_measures["mean_IoU"]) < 0.04

    # round-trip: disabling returns the exact float path
    net.dequantize_serving()
    back, _ = net.score(data.get_testset())
    np.testing.assert_allclose(back["mean_IoU"], float_measures["mean_IoU"],
                               rtol=1e-6)

    # re-enable from a saved scales dict without recalibration
    again = net.quantize_for_serving(scales)
    assert again == scales
    # leave the shared fixture in the float state for later tests
    net.dequantize_serving()


def test_quantized_serving_preserves_distribution(trained_fcn):
    """quantize_for_serving after parallel.distribute must keep the
    batch-sharded eval step (and still run int8)."""
    import jax
    from modular_semantic_segmentation_tpu.parallel import (
        make_mesh, distribute)

    net, data = trained_fcn
    try:
        mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
        distribute(net, mesh)
        sharded, _ = net.score(data.get_testset())
        net.quantize_for_serving(data.get_measureset(), num_batches=1,
                                 min_channels=64, min_pixels=0)
        assert net.act_scales
        q, _ = net.score(data.get_testset())
        # eval step still carries the mesh shardings
        assert getattr(net, "_mesh", None) is mesh
        assert abs(q["mean_IoU"] - sharded["mean_IoU"]) < 0.04
    finally:
        net.dequantize_serving()
        net._mesh = None
        net._jit_eval_step = jax.jit(net._eval_step)


def test_calibration_percentile_clips_outliers():
    """percentile < 100 clips rare outliers out of the activation scale
    (calibrate_percentile, ops/layers.py conv2d calibration branch): a
    single huge spike dominates the max-abs scale but not the 99th
    percentile."""
    x = np.ones((1, 8, 8, 8), np.float32)
    x[0, 0, 0, 0] = 1000.0  # one outlier in 512 values
    x = jnp.asarray(x)

    def net(ctx, x):
        return layers.conv2d(ctx, x, 4, 3, "convP", activation=None,
                             use_bias=False)

    variables, _ = init_variables(net, jax.random.PRNGKey(0), x)
    ctx_max = Ctx(variables, calibrate=True)
    net(ctx_max, x)
    ctx_p99 = Ctx(variables, calibrate=True, calibrate_percentile=99.0)
    net(ctx_p99, x)
    assert float(ctx_max.amax["convP/input_amax"]) == pytest.approx(1000.0)
    assert float(ctx_p99.amax["convP/input_amax"]) == pytest.approx(1.0)

    # and the percentile plumbs through the model-level entry point
    from modular_semantic_segmentation_tpu.datasets import get_dataset
    data = get_dataset("unittest")(height=32, width=32, num_train=4,
                                   num_measure=2, num_test=2, batchsize=2)
    model = get_model("simple_fcn")(
        data_description=data.get_data_description(), prefix="rgb",
        modality="rgb", num_units=4, batchsize=2)
    s_max = model.quantize_for_serving(data.get_measureset(), num_batches=1,
                                       min_channels=64, min_pixels=0)
    model.dequantize_serving()
    s_p99 = model.quantize_for_serving(data.get_measureset(), num_batches=1,
                                       min_channels=64, percentile=99.0,
                                       min_pixels=0)
    assert set(s_p99) == set(s_max)
    assert all(s_p99[k] <= s_max[k] + 1e-9 for k in s_max)


def test_select_scales_packed_stem_widths():
    """Cross-expert packed stems (models/packed_experts.py) are judged at
    the PACKED input width: two 64-ch experts pack conv1_2 to 128-in —
    int8-eligible where the per-expert convs are not — and a packed stem
    conv quantizes all-or-none across experts (the packed kernel is one
    op with per-expert input scales). Packed scales land in the
    ``packed:`` namespace only the packed stem op reads, so an unpacked
    serving path can never run a 64-in stem conv int8."""
    z = jnp.zeros
    variables = {
        "rgb/conv1_1/kernel": z((3, 3, 3, 64)),
        "depth/conv1_1/kernel": z((3, 3, 1, 64)),
        "rgb/conv1_2/kernel": z((3, 3, 64, 64)),
        "depth/conv1_2/kernel": z((3, 3, 64, 64)),
        "rgb/conv2_1/kernel": z((3, 3, 64, 128)),
        "depth/conv2_1/kernel": z((3, 3, 64, 128)),
    }
    amax = {
        "rgb/conv1_2/input_amax": 4.0,
        "depth/conv1_2/input_amax": 0.5,
        "rgb/conv2_1/input_amax": 2.0,
        "depth/conv2_1/input_amax": 0.25,
    }
    # without the packed hint nothing qualifies at the production floor
    assert quantize.select_scales(dict(amax), variables,
                                  min_channels=128) == {}
    # with it, every stem conv of every expert gets its own scale —
    # emitted under packed: keys (consumed only by packed_fcn_stems)
    scales = quantize.select_scales(
        dict(amax), variables, min_channels=128,
        packed_stem_prefixes=("rgb", "depth"))
    assert set(scales) == {"packed:" + k for k in amax}
    assert scales["packed:depth/conv1_2/input_amax"] == pytest.approx(
        0.5 / 127.0)
    # all-or-none: losing one expert's calibration drops the LAYER, not
    # the other layers
    partial = dict(amax)
    del partial["depth/conv2_1/input_amax"]
    scales = quantize.select_scales(
        partial, variables, min_channels=128,
        packed_stem_prefixes=("rgb", "depth"))
    assert set(scales) == {"packed:rgb/conv1_2/input_amax",
                           "packed:depth/conv1_2/input_amax"}
    # batch-shape gates mirrored from can_pack_stems: a wide (>4 channel)
    # expert input can't pack, so the packed hint is ignored and nothing
    # qualifies at the packed width
    wide = dict(variables)
    wide["depth/conv1_1/kernel"] = z((3, 3, 8, 64))
    assert quantize.select_scales(
        dict(amax), wide, min_channels=128,
        packed_stem_prefixes=("rgb", "depth")) == {}
    # ... and so does a grid mismatch between the experts' calibrated
    # conv1_1 inputs
    mismatched = dict(amax)
    mismatched["rgb/conv1_1/input_pixels"] = 768 * 384
    mismatched["depth/conv1_1/input_pixels"] = 384 * 192
    assert quantize.select_scales(
        mismatched, variables, min_channels=128,
        packed_stem_prefixes=("rgb", "depth")) == {}


@pytest.mark.slow
def test_packed_stem_int8_fusion_parity(tmp_path):
    """End-to-end: a Bayes fusion with packed stems quantizes its
    conv1_2/conv2_1 through the packed int8 path (per-expert input
    scales) and keeps score parity with the float path."""
    from modular_semantic_segmentation_tpu.datasets import get_dataset
    data = get_dataset("unittest")(height=32, width=32, num_train=8,
                                   num_measure=4, num_test=3)
    weights, cms = {}, {}
    for modality in ["rgb", "depth"]:
        expert = get_model("simple_fcn")(
            prefix=modality, modality=modality, num_units=4,
            data_description=data.get_data_description(), batchsize=2,
            learning_rate=0.02, batch_normalization=False)
        expert.fit(data.get_trainset(), 3)
        weights[modality] = expert.export_weights(save_dir=str(tmp_path))
        _, cms[modality] = expert.score(data.get_measureset())
        expert.close()

    net = get_model("bayes_mix")(
        data_description=data.get_data_description(),
        confusion_matrices=cms, num_units=4, expert_model="fcn",
        prefixes={"rgb": "rgb", "depth": "depth"}, batchsize=2)
    for filepath in weights.values():
        net.import_weights(filepath, warnings=False)

    float_measures, _ = net.score(data.get_testset())
    # min_channels at the production 128: only the PACKED widths qualify
    scales = net.quantize_for_serving(data.get_measureset(), num_batches=2,
                                      min_channels=128, min_pixels=0)
    for prefix in ("rgb", "depth"):
        assert f"packed:{prefix}/conv1_2/input_amax" in scales
        assert f"packed:{prefix}/conv2_1/input_amax" in scales
    # nothing else qualifies at 32x32 with min_channels=128 except the
    # 128-in conv2_2 and deeper convs; the stem keys above are the point
    int8_measures, _ = net.score(data.get_testset())
    assert abs(int8_measures["total_accuracy"]
               - float_measures["total_accuracy"]) < 0.03
    assert abs(int8_measures["mean_IoU"]
               - float_measures["mean_IoU"]) < 0.05

    net.dequantize_serving()
    back, _ = net.score(data.get_testset())
    np.testing.assert_allclose(back["mean_IoU"],
                               float_measures["mean_IoU"], rtol=1e-6)
    net.close()


def test_ptq_min_pixels_family_defaults():
    """The PTQ spatial floor is a model-family decision, measured on the
    v5e (scripts/int8_decoder_probe.py round 5): the VGG/FCN family's
    small-spatial convs (conv5 block + score_conv5 at 48x24, 512-in) WIN
    int8 — floor 0 — while AdapNet's 1x1 bottlenecks at the same pixel
    count regress — floor 2048. Fusion models resolve by expert family."""
    from modular_semantic_segmentation_tpu.models.adapnet import Adapnet
    from modular_semantic_segmentation_tpu.models.simple_fcn import SimpleFCN
    from modular_semantic_segmentation_tpu.models.estimator import Estimator

    assert Estimator.ptq_min_pixels == 2048
    assert SimpleFCN.ptq_min_pixels == 0
    assert Adapnet.ptq_min_pixels == 2048

    num_classes = 4
    dd = ({"labels": np.int32, "rgb": np.float32, "depth": np.float32},
          {"rgb": (None, None, 3), "depth": (None, None, 1),
           "labels": (None, None)}, num_classes)
    rng = np.random.RandomState(0)
    cms = {m: rng.rand(num_classes, num_classes) + np.eye(num_classes)
           for m in ("rgb", "depth")}
    net = get_model("bayes_mix")(
        data_description=dd, confusion_matrices=cms, num_units=2,
        expert_model="fcn",
        prefixes={"rgb": "rgb", "depth": "depth"}, batchsize=1)
    assert net.ptq_min_pixels == 0
    # the property resolves from config — flipping the expert family on
    # the same instance exercises the adapnet branch without paying a
    # second full model build
    net.config["expert_model"] = "adapnet"
    assert net.ptq_min_pixels == 2048


@pytest.mark.slow
def test_variance_fusion_int8_mc_parity(tmp_path):
    """The MC-dropout fusion path quantizes too (docs/TIMING.md round-5
    row: 59.3 -> 66.4 fps): calibration's running-max survives the
    re-entered conv scopes of the stochastic tails, and int8 scoring
    stays within tolerance of float — under ACTIVE dropout, so both
    paths sample; the lock is on aggregate quality, not bit equality."""
    from modular_semantic_segmentation_tpu.datasets import get_dataset
    data = get_dataset("unittest")(height=32, width=32, num_train=8,
                                   num_measure=4, num_test=4)
    weights = {}
    for modality in ["rgb", "depth"]:
        expert = get_model("simple_fcn")(
            prefix=modality, modality=modality, num_units=4,
            data_description=data.get_data_description(), batchsize=2,
            learning_rate=0.02, batch_normalization=False)
        expert.fit(data.get_trainset(), 5)
        weights[modality] = expert.export_weights(save_dir=str(tmp_path))
        expert.close()

    net = get_model("variance")(
        data_description=data.get_data_description(), num_units=4,
        expert_model="fcn", prefixes={"rgb": "rgb", "depth": "depth"},
        batchsize=2, num_samples=6, dropout_rate=0.2)
    for filepath in weights.values():
        net.import_weights(filepath, warnings=False)

    float_measures, _ = net.score(data.get_testset())
    scales = net.quantize_for_serving(data.get_measureset(), num_batches=2,
                                      min_channels=64, min_pixels=0)
    assert scales, "no convs quantized on the MC path"
    int8_measures, _ = net.score(data.get_testset())
    assert abs(int8_measures["total_accuracy"]
               - float_measures["total_accuracy"]) < 0.06
    net.dequantize_serving()


def test_fusion_fcn_int8_score_parity():
    """FusionFCN overrides _test_outputs without expert-stem packing
    (advisor round-4 note), so its int8 path must quantize BOTH
    modality encoders plus the fused score convs per-tensor — never
    under the packed: namespace — and keep scoring parity (backs the
    269.2 fps int8 serving row, docs/TIMING.md round-5 family table)."""
    from modular_semantic_segmentation_tpu.datasets import get_dataset
    data = get_dataset("unittest")(height=32, width=32, num_train=8,
                                   num_measure=4, num_test=4)
    net = get_model("fusion_fcn")(
        data_description=data.get_data_description(),
        prefixes={"rgb": "rgb", "depth": "depth"}, num_units=4,
        batchsize=2, learning_rate=0.01)
    net.fit(data.get_trainset(), 5)

    float_measures, _ = net.score(data.get_testset())
    scales = net.quantize_for_serving(data.get_measureset(), num_batches=2,
                                      min_channels=4, min_pixels=0)
    assert any(k.startswith("rgb_") for k in scales)
    assert any(k.startswith("depth_") for k in scales)
    assert any(k.startswith("fused_score_conv") for k in scales)
    assert not any(k.startswith("packed:") for k in scales)
    int8_measures, _ = net.score(data.get_testset())
    assert abs(int8_measures["total_accuracy"]
               - float_measures["total_accuracy"]) < 0.06

    net.dequantize_serving()
    restored, _ = net.score(data.get_testset())
    assert restored["total_accuracy"] == float_measures["total_accuracy"]
    net.close()
