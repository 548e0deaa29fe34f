"""Unit tests for ops: activations, pooling, losses, metrics — NumPy/scipy/
sklearn oracles (SURVEY.md §4 tier 1)."""

import numpy as np
import jax.numpy as jnp
import jax
import pytest
from scipy.special import log_softmax as sp_log_softmax, softmax as sp_softmax
from sklearn.metrics import confusion_matrix as sk_confusion_matrix

from modular_semantic_segmentation_tpu.ops.variables import Ctx, init_variables
from modular_semantic_segmentation_tpu.ops import layers, losses, metrics
from modular_semantic_segmentation_tpu.ops.init import bilinear_filter


def test_log_softmax_matches_scipy():
    x = np.random.RandomState(0).randn(2, 3, 5).astype(np.float32) * 10
    np.testing.assert_allclose(np.asarray(layers.log_softmax(jnp.asarray(x))),
                               sp_log_softmax(x, axis=-1), rtol=1e-5,
                               atol=1e-5)


def test_softmax_temperature():
    x = np.random.RandomState(1).randn(4, 6).astype(np.float32)
    for t in [1.0, 2.5, 0.5]:
        np.testing.assert_allclose(
            np.asarray(layers.softmax(jnp.asarray(x), temperature=t)),
            sp_softmax(x / t, axis=-1), rtol=1e-5, atol=1e-6)


def test_entropy_normalized():
    # uniform distribution -> normalized entropy of exactly 1
    k = 7
    p = np.full((3, k), 1.0 / k, np.float32)
    np.testing.assert_allclose(np.asarray(layers.entropy(jnp.asarray(p))),
                               np.ones(3), rtol=1e-5)
    # delta distribution -> 0
    d = np.eye(k, dtype=np.float32)[:3]
    np.testing.assert_allclose(np.asarray(layers.entropy(jnp.asarray(d))),
                               np.zeros(3), atol=1e-6)


def test_bilinear_filter_values():
    # 4x4/stride-2 kernel: classic 0.25/0.75 bilinear weights
    k = bilinear_filter((4, 4, 2, 2))
    expect_1d = np.array([0.25, 0.75, 0.75, 0.25])
    np.testing.assert_allclose(k[:, 1, 0, 0], expect_1d * 0.75)
    np.testing.assert_allclose(np.diag(k[1, 1]), [0.75 * 0.75] * 2)
    assert k[0, 0, 0, 1] == 0  # off-diagonal channels are zero


def test_dropout_scaling_and_determinism():
    ctx = Ctx({}, rng=jax.random.PRNGKey(0))
    x = jnp.ones((1000,))
    out = layers.dropout(ctx, x, 0.3)
    kept = np.asarray(out) > 0
    assert abs(kept.mean() - 0.7) < 0.05
    np.testing.assert_allclose(np.asarray(out)[kept], 1.0 / 0.7, rtol=1e-6)
    assert np.all(np.asarray(layers.dropout(ctx, x, 0.0)) == 1.0)


def test_unpool_roundtrip():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    pooled, idx = layers.max_pool_with_argmax(x)
    unpooled = layers.unpool_2d(pooled, idx)
    assert unpooled.shape == x.shape
    # re-pooling the unpooled tensor recovers the pooled values
    repooled = layers.max_pool2d(Ctx({}), unpooled, 2, 2)
    np.testing.assert_allclose(np.asarray(repooled), np.asarray(pooled))


def test_conv_taps_gradients():
    """The matmul-decomposed conv VJP (_conv_taps_grad: mirrored-conv
    input grad + per-tap shifted-slice kernel grad) matches XLA's own
    conv VJP — stride 1, SAME, odd kernels, with and without dilation."""
    rng = np.random.RandomState(11)
    for k, dil in [(3, (1, 1)), (3, (2, 2)), (5, (1, 1)), (3, (4, 4))]:
        x = jnp.asarray(rng.randn(2, 12, 16, 6).astype(np.float32))
        kernel = jnp.asarray(rng.randn(k, k, 6, 5).astype(np.float32))
        ct = jnp.asarray(rng.randn(2, 12, 16, 5).astype(np.float32))

        def ref_loss(x, kernel):
            return jnp.sum(layers._conv_same(x, kernel, dil) * ct)

        def taps_loss(x, kernel):
            return jnp.sum(layers._conv_taps_grad(x, kernel, dil) * ct)

        np.testing.assert_allclose(
            np.asarray(layers._conv_taps_grad(x, kernel, dil)),
            np.asarray(layers._conv_same(x, kernel, dil)), rtol=1e-6)
        ref_gx, ref_gk = jax.grad(ref_loss, argnums=(0, 1))(x, kernel)
        got_gx, got_gk = jax.grad(taps_loss, argnums=(0, 1))(x, kernel)
        np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx),
                                   rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_gk), np.asarray(ref_gk),
                                   rtol=2e-4, atol=1e-4)


def test_conv2d_train_gradient_routes_through_taps():
    """conv2d in train mode (stride 1, SAME, <=256 ch) produces gradients
    equal to the plain-XLA formulation used in eval tracing."""
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(1, 10, 12, 8).astype(np.float32))
    var_ctx = Ctx({}, train=True, rng=jax.random.PRNGKey(0), init=True)
    layers.conv2d(var_ctx, x, 7, 3, "c", activation=None)
    variables = dict(var_ctx.created)

    def loss(variables, train):
        ctx = Ctx(variables, train=train, rng=jax.random.PRNGKey(1))
        return jnp.sum(layers.conv2d(ctx, x, 7, 3, "c", activation=None)
                       ** 2)

    g_train = jax.grad(lambda v: loss(v, True))(variables)
    g_plain = jax.grad(lambda v: loss(v, False))(variables)
    for name in g_train:
        np.testing.assert_allclose(np.asarray(g_train[name]),
                                   np.asarray(g_plain[name]),
                                   rtol=2e-4, atol=1e-4, err_msg=name)


def test_conv2d_1x1_matmul_path_matches_conv():
    """Large-spatial 1x1 convs route through the [pixels, Cin] @ [Cin,
    Cout] matmul (the class-score conv fast path); output must equal the
    direct conv lowering."""
    rng = np.random.RandomState(13)
    # 260*130 = 33800 pixels >= the 32768-pixel gate
    x = jnp.asarray(rng.randn(1, 260, 130, 6).astype(np.float32))
    var_ctx = Ctx({}, init=True, rng=jax.random.PRNGKey(0))
    out = layers.conv2d(var_ctx, x, 5, 1, "s", activation=None,
                        use_bias=False)
    kernel = var_ctx.created["s/kernel"]
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_max_pool_gradient_matches_reduce_window():
    """The mask-based custom pool gradient (non-overlapping fast path)
    equals the reduce_window/SelectAndScatter gradient — including the
    first-match tie rule (duplicated maxima within a window)."""
    rng = np.random.RandomState(9)
    # quantized values force plenty of within-window ties
    x = jnp.asarray(
        np.round(rng.rand(2, 8, 12, 3) * 4).astype(np.float32))
    ct = jnp.asarray(rng.randn(2, 4, 6, 3).astype(np.float32))

    def fast(x):
        return jnp.sum(layers.max_pool2d(Ctx({}), x, 2, 2,
                                         custom_grad=True) * ct)

    def reference(x):
        out = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, window_dimensions=(1, 2, 2, 1),
            window_strides=(1, 2, 2, 1), padding="VALID")
        return jnp.sum(out * ct)

    np.testing.assert_allclose(np.asarray(jax.grad(fast)(x)),
                               np.asarray(jax.grad(reference)(x)),
                               rtol=1e-6, atol=1e-6)
    # odd shapes fall back to the reduce_window path (trailing row/col
    # dropped by VALID) and still differentiate
    x_odd = jnp.asarray(rng.rand(1, 7, 9, 2).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(
        layers.max_pool2d(Ctx({}), x, 2, 2)))(x_odd)
    assert g.shape == x_odd.shape


def test_cross_entropy_void_masking():
    rng = np.random.RandomState(4)
    logp = sp_log_softmax(rng.randn(2, 4, 4, 3).astype(np.float32), axis=-1)
    labels = rng.randint(0, 3, (2, 4, 4))
    onehot = np.eye(3, dtype=np.float32)[labels]
    onehot[0, :2, :, :] = 0.0  # void pixels: all-zero rows
    got = float(losses.cross_entropy(jnp.asarray(logp), jnp.asarray(onehot)))
    mask = onehot.sum(-1) > 0
    expect = (-(onehot * logp).sum(-1)[mask]).sum() / mask.sum()
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_confusion_matrix_matches_sklearn():
    rng = np.random.RandomState(5)
    k = 6
    labels = rng.randint(0, k, 1000)
    preds = rng.randint(0, k, 1000)
    got = np.asarray(metrics.confusion_matrix(jnp.asarray(preds),
                                              jnp.asarray(labels), k))
    expect = sk_confusion_matrix(labels, preds, labels=np.arange(k))
    np.testing.assert_array_equal(got, expect)


def test_confusion_matrix_ignores_negative_labels():
    k = 3
    labels = np.array([0, 1, 2, -1, -1])
    preds = np.array([0, 1, 2, 0, 1])
    got = np.asarray(metrics.confusion_matrix(jnp.asarray(preds),
                                              jnp.asarray(labels), k))
    np.testing.assert_array_equal(got, np.eye(k))


def test_measures_match_reference_formulas():
    cm = np.array([[5, 1, 0], [2, 7, 1], [0, 0, 9]], np.float64)
    m = metrics.measures_from_confusion_matrix(cm)
    np.testing.assert_allclose(m["recall"], np.diag(cm) / cm.sum(1))
    np.testing.assert_allclose(m["precision"], np.diag(cm) / cm.sum(0))
    # void exclusion: class 0 dropped from accuracy + mean_IoU
    np.testing.assert_allclose(m["total_accuracy"],
                               (7 + 9) / cm[1:, :].sum())
    iou = np.diag(cm) / (cm.sum(1) + cm.sum(0) - np.diag(cm))
    np.testing.assert_allclose(m["mean_IoU"], iou[1:].mean())


def test_auroc_perfect_and_random():
    scores = np.array([0.9, 0.8, 0.2, 0.1])
    labels = np.array([1, 1, 0, 0])
    assert metrics.auroc(scores, labels) == pytest.approx(1.0)
    assert metrics.auroc(-scores, labels) == pytest.approx(0.0)


def test_init_variables_creates_and_applies():
    def net(ctx, x):
        h = layers.conv2d(ctx, x, 4, 3, "conv1", batch_normalization=True)
        return layers.conv2d(ctx, h, 2, 1, "score", activation=None)

    x = jnp.zeros((1, 8, 8, 3))
    variables, trainable = init_variables(net, jax.random.PRNGKey(0), x)
    assert set(variables) == {
        "conv1/kernel", "conv1/bias", "conv1/gamma", "conv1/beta",
        "conv1/moving_mean", "conv1/moving_variance",
        "score/kernel", "score/bias"}
    assert not trainable["conv1/moving_mean"]
    assert trainable["conv1/kernel"]
    out = net(Ctx(variables), x)
    assert out.shape == (1, 8, 8, 2)


def test_batch_norm_bf16_training_stats_are_float32():
    """BN batch statistics must be computed in f32 even when the compute
    dtype is bfloat16 — bf16 means over 768x384 frames of 0..255-magnitude
    images lose ~7 bits (round-1 verdict weak #7, SURVEY §7 'BN semantics')."""
    rng = np.random.RandomState(0)
    x64 = rng.rand(2, 96, 64, 8) * 255.0
    x_bf16 = jnp.asarray(x64, jnp.bfloat16)
    ctx = Ctx({"bn/gamma": jnp.ones(8), "bn/beta": jnp.zeros(8),
               "bn/moving_mean": jnp.zeros(8),
               "bn/moving_variance": jnp.ones(8)}, train=True)
    layers.batch_norm(ctx, x_bf16, "bn")
    # updates: moving = 0.99 * old + 0.01 * batch_stat
    got_mean = np.asarray(ctx.updates["bn/moving_mean"]) / 0.01
    got_var = (np.asarray(ctx.updates["bn/moving_variance"]) - 0.99) / 0.01
    # oracle on the BF16-ROUNDED input (the rounding is legitimate; the
    # statistic accumulation must not add further error)
    x_r = np.asarray(x_bf16, np.float64)
    expect_mean = x_r.mean((0, 1, 2))
    expect_var = x_r.var((0, 1, 2))
    np.testing.assert_allclose(got_mean, expect_mean, rtol=1e-4)
    np.testing.assert_allclose(got_var, expect_var, rtol=1e-3)

