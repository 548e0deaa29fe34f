"""Pallas kernels must agree exactly with their XLA formulations
(interpret mode on CPU; the same code compiles for TPU via Mosaic)."""

import numpy as np
import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops import fusion_math as fm
from modular_semantic_segmentation_tpu.ops import metrics
from modular_semantic_segmentation_tpu.ops.pallas import dirichlet_kernel
from modular_semantic_segmentation_tpu.ops.pallas import confusion_kernel


def test_dirichlet_kernel_matches_xla():
    rng = np.random.RandomState(0)
    k = 14
    probs = [jnp.asarray(rng.dirichlet(np.ones(k), size=(2, 24, 16)),
                         jnp.float32) for _ in range(2)]
    alphas = [rng.rand(k, k) * 4 + 0.5 for _ in range(2)]
    prior = rng.dirichlet(np.ones(k))
    sigma = 0.3

    want = np.argmax(np.asarray(
        fm.dirichlet_fusion(probs, alphas, prior, sigma=sigma)), axis=-1)
    got = np.asarray(dirichlet_kernel.dirichlet_fusion_label(
        probs, alphas, prior, sigma=sigma, tile=256, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_confusion_kernel_matches_xla():
    rng = np.random.RandomState(1)
    k = 12
    preds = jnp.asarray(rng.randint(0, k, (3, 40, 40)))
    labels = jnp.asarray(rng.randint(-1, k, (3, 40, 40)))
    want = np.asarray(metrics.confusion_matrix(preds, labels, k))
    got = np.asarray(confusion_kernel.confusion_matrix(
        preds, labels, k, tile=1024, interpret=True))
    np.testing.assert_allclose(got, want)
