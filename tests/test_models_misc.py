"""Smoke tests for the remaining model families: Adapnet, BayesianFCN +
UncertaintyModel metrics, FusionFCN, ProgressiveFCN."""

import numpy as np
import pytest

from modular_semantic_segmentation_tpu.datasets import get_dataset
from modular_semantic_segmentation_tpu.models import get_model


@pytest.fixture(scope="module")
def data():
    return get_dataset("unittest")(height=32, width=32, num_train=6,
                                   num_measure=2, num_test=2)


def test_lazy_class_exports():
    """Reference-style direct class imports (reference README.md:64-65)
    resolve through the registries via PEP 562 module __getattr__."""
    from modular_semantic_segmentation_tpu.models import SimpleFCN
    from modular_semantic_segmentation_tpu.datasets import Synthia
    assert SimpleFCN is get_model("simple_fcn")
    assert Synthia is get_dataset("synthia")
    import modular_semantic_segmentation_tpu.models as models_pkg
    with pytest.raises(AttributeError):
        models_pkg.NotAModel


def test_adapnet_build_and_train(data):
    net = get_model("adapnet")(
        data_description=data.get_data_description(), modality="rgb",
        num_units=4, batchsize=1, learning_rate=0.001)
    assert "rgb/block_layer_1/stage_1/kernel" in net.variables
    assert "rgb/block_layer_7/stage_2_2/kernel" in net.variables
    assert "rgb/second_deconvolution_upconv/kernel" in net.variables
    net.fit(data.get_trainset(), 1)
    preds = net.predict(data.get_testset())
    assert preds.shape == (2, 32, 32)
    net.close()


def test_bayesian_fcn_uncertainty(data):
    net = get_model("bayesian_fcn")(
        prefix="rgb", modality="rgb", num_units=4, num_samples=3,
        dropout_rate=0.3, data_description=data.get_data_description(),
        batchsize=2, learning_rate=0.01)
    net.fit(data.get_trainset(), 1)
    ent = net.predict(data.get_testset(), output_attr="entropy")
    assert ent.shape == (2, 32, 32)
    assert 0 <= float(ent.min()) and float(ent.max()) <= 1 + 1e-5
    cond = net.predict(data.get_testset(), output_attr="cond_entropy")
    var = net.predict(data.get_testset(), output_attr="variance")
    assert cond.shape == var.shape == (2, 32, 32)

    fpr, tpr, auroc, thr = net.misclassification_detection_score(
        data.get_testset(), "entropy")
    assert 0 <= auroc <= 1
    assert len(fpr) == len(tpr) == len(thr)
    nll, counts = net.nll_score(data.get_testset())
    assert nll > 0 and counts.sum() > 0
    dist = net.value_distribution(data.get_testset(), "entropy")
    assert dist["counts"].sum() > 0
    alphas, mean = net.prob_distribution(data.get_testset())
    assert alphas.shape == (4,) and (alphas > 0).all()
    np.testing.assert_allclose(mean.sum(), 1.0, rtol=1e-3)
    net.close()


def test_bayesian_fcn_batched_samples_are_exact(data):
    """BayesianFCN runs its N MC samples as one batched stochastic-tail
    pass (bayesian_fcn.py _test_outputs); at dropout_rate=0 all samples
    must bit-match, so the sample variance collapses to 0 and the mean
    conditional entropy equals the entropy of the mean."""
    net = get_model("bayesian_fcn")(
        prefix="rgb", modality="rgb", num_units=4, num_samples=3,
        dropout_rate=0.0, data_description=data.get_data_description(),
        batchsize=2, seed=3)
    var = np.asarray(net.predict(data.get_testset(),
                                 output_attr="variance"))
    assert float(np.abs(var).max()) < 1e-12
    ent = np.asarray(net.predict(data.get_testset(), output_attr="entropy"))
    cond = np.asarray(net.predict(data.get_testset(),
                                  output_attr="cond_entropy"))
    np.testing.assert_allclose(cond, ent, atol=1e-6)
    net.close()


def test_bayesian_fcn_temperature_scaling(data):
    config = dict(prefix="rgb", modality="rgb", num_units=4, num_samples=2,
                  dropout_rate=0.0,
                  data_description=data.get_data_description(), batchsize=2,
                  seed=7)
    cold = get_model("bayesian_fcn")(**config)
    hot = get_model("bayesian_fcn")(temperature_scaling=10.0, **config)
    hot.variables = dict(cold.variables)
    p_cold = cold.predict(data.get_testset(), output_attr="prob")
    p_hot = hot.predict(data.get_testset(), output_attr="prob")
    # higher temperature flattens the distribution
    assert p_hot.max() < p_cold.max()


def test_fusion_fcn(data):
    net = get_model("fusion_fcn")(
        data_description=data.get_data_description(),
        prefixes={"rgb": "rgb", "depth": "depth"}, num_units=4, batchsize=2,
        learning_rate=0.01)
    assert "rgb_conv1_1/kernel" in net.variables
    assert "fused_score_conv4/kernel" in net.variables
    assert "fused/score/kernel" in net.variables
    net.fit(data.get_trainset(), 1)
    preds = net.predict(data.get_testset())
    assert preds.shape == (2, 32, 32)
    net.close()


def test_progressive_fcn(data):
    net = get_model("progressive_fcn")(
        data_description=data.get_data_description(), modality="depth",
        lateral_columns={"rgb": "rgb"}, num_units=4, batchsize=2,
        learning_rate=0.01, adapter={"initial_scales": [1, 0.1]})
    # lateral column frozen, adapter scale trainable
    assert not net.trainable["rgb_conv1_1/kernel"]
    assert net.trainable["depth_conv1_2/adapter/scale"]
    before = np.asarray(net.variables["rgb_conv1_1/kernel"]).copy()
    net.fit(data.get_trainset(), 1)
    np.testing.assert_array_equal(
        before, np.asarray(net.variables["rgb_conv1_1/kernel"]))
    preds = net.predict(data.get_testset())
    assert preds.shape == (2, 32, 32)
    net.close()
