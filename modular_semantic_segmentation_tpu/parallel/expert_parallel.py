"""Expert parallelism for fusion inference.

The reference runs its modality experts sequentially inside one graph
(basic_fusion_model.py:63-65). On a mesh we offer two strategies:

1. ``dispatch_experts``: each expert's forward runs on its own device;
   JAX's async dispatch overlaps them, fusion runs where the outputs meet.
   No collectives, works for heterogeneous experts (rgb 3ch vs depth 1ch).
2. mesh axis 'expert' in a ('data', 'expert') mesh: batches shard over
   'data' while the per-expert slices of the fused computation land on
   different devices (used by __graft_entry__.dryrun_multichip).
"""

import jax
import numpy as np

from modular_semantic_segmentation_tpu.ops.variables import Ctx
from modular_semantic_segmentation_tpu.models.fusion_base import test_pipeline


def dispatch_experts(fusion_model, batch, devices=None):
    """Run each expert's forward pass on a separate device, concurrently.

    Returns {modality: {'prob': np.ndarray, 'classification': np.ndarray}}.
    """
    devices = list(devices if devices is not None else jax.devices())
    config = fusion_model.config
    variables = fusion_model.variables

    def expert_fn(modality):
        prefix = config["prefixes"][modality]

        def fn(variables, x):
            ctx = Ctx(variables, train=False)
            out = test_pipeline(ctx, x, prefix, **config)
            return out["prob"], out["classification"]
        return fn

    futures = {}
    for i, modality in enumerate(fusion_model.modalities):
        device = devices[i % len(devices)]
        fn = jax.jit(expert_fn(modality))
        # committed inputs pin the computation to the expert's device
        placed = {k: jax.device_put(v, device) for k, v in variables.items()}
        x = jax.device_put(np.asarray(batch[modality]), device)
        # async dispatch: all experts run concurrently on their devices
        futures[modality] = fn(placed, x)

    return {m: {"prob": np.asarray(prob), "classification": np.asarray(cls)}
            for m, (prob, cls) in futures.items()}
