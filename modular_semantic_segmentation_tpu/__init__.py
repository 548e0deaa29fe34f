"""modular_semantic_segmentation_tpu — TPU-native modular sensor fusion for
semantic segmentation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ethz-asl/modular_semantic_segmentation (IROS 2018, "Modular Sensor Fusion for
Semantic Segmentation"): per-modality expert CNNs (FCN/VGG16, AdapNet) whose
per-pixel class probabilities are fused by statistical fusion layers (Bayes via
confusion matrices, Dirichlet class-conditional likelihoods, MC-dropout
variance weighting, averaging) that need no joint training.

Layout:
    ops/        functional NN ops, fusion math, metrics, Pallas kernels
    models/     Estimator runtime + architectures + fusion models
    datasets/   dataset drivers, augmentation, synthetic fixtures
    parallel/   jax.sharding Mesh helpers: DP / expert / spatial partitioning
    utils/      experiment storage, config, prefetch, timing
    native/     C++ host-side data/augmentation library (ctypes)

Public API mirrors the reference (see reference README.md:60-87):
    model = get_model('simple_fcn')(data_description=..., **config)
    model.fit(dataset, iterations)
    model.predict(data); model.score(data)
    model.import_weights(npz); model.export_weights()
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it via
    # the config API (must run before the backend initializes).
    try:
        import jax as _jax
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - best effort
        pass

from modular_semantic_segmentation_tpu.models import get_model  # noqa: F401,E402
from modular_semantic_segmentation_tpu.datasets import get_dataset  # noqa: F401,E402
