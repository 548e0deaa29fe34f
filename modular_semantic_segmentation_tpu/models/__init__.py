"""Model registry (reference xview/models/__init__.py:10-26).

Lazy imports so that ``get_model`` works even while optional heavy deps are
unavailable, and so importing the package stays fast.
"""

_REGISTRY = {
    "fcn": ("simple_fcn", "SimpleFCN"),
    "simple_fcn": ("simple_fcn", "SimpleFCN"),
    "fusion_fcn": ("fusion_fcn", "FusionFCN"),
    "bayes_mix": ("bayes_fusion", "BayesFusion"),
    "bayes_fusion": ("bayes_fusion", "BayesFusion"),
    "dirichlet_mix": ("dirichlet_fusion", "DirichletFusion"),
    "dirichlet_fusion": ("dirichlet_fusion", "DirichletFusion"),
    "average": ("average_fusion", "AverageFusion"),
    "average_fusion": ("average_fusion", "AverageFusion"),
    "variance": ("variance_fusion", "VarianceFusion"),
    "variance_fusion": ("variance_fusion", "VarianceFusion"),
    "adapnet": ("adapnet", "Adapnet"),
    "bayesian_fcn": ("bayesian_fcn", "BayesianFCN"),
    "progressive_fcn": ("progressive_fcn", "ProgressiveFCN"),
    "uncertainty_dirichlet_mix": ("uncertainty_dirichlet_fusion",
                                  "UncertaintyDirichletFusion"),
}


def get_model(name):
    """Look up a model class by registry name."""
    try:
        module_name, cls_name = _REGISTRY[name]
    except KeyError:
        raise UserWarning(f"ERROR: Model {name} not found") from None
    import importlib
    module = importlib.import_module(
        f"modular_semantic_segmentation_tpu.models.{module_name}")
    return getattr(module, cls_name)


_CLASS_NAMES = {cls: name for name, (_, cls) in _REGISTRY.items()}


def __getattr__(name):
    """Lazy class exports (PEP 562): ``from ...models import SimpleFCN``
    mirrors the reference's direct class imports (reference README.md:64)
    while keeping package import fast."""
    if name in _CLASS_NAMES:
        return get_model(_CLASS_NAMES[name])
    raise AttributeError(name)
