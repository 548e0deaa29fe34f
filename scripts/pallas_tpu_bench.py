"""Pallas-vs-XLA on the REAL TPU: numerics + device-time comparison.

Round-1 verdict item 3: the Mosaic kernels had only ever run in interpret
mode on CPU. This script compiles both kernels on the actual chip, checks
they agree with the XLA formulations (exact for confusion; argmax-boundary
tolerance for the Dirichlet posterior, whose XLA counterpart fuses the
f32 ops in a different order), and reports device-measured time per frame
for both paths at the reference benchmark shape 1x768x384
(xview/models/dirichlet_mix.py:96-138, experiments/timing.py:131-177).

Run on the TPU host:  python scripts/pallas_tpu_bench.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import modular_semantic_segmentation_tpu  # noqa: F401,E402 (platform config)
import jax
import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops import fusion_math as fm
from modular_semantic_segmentation_tpu.ops import metrics
from modular_semantic_segmentation_tpu.ops.pallas import (confusion_kernel,
                                                          dirichlet_kernel)
from modular_semantic_segmentation_tpu.utils.profiling import device_time_fn


def main(height=768, width=384, k=14, experts=2, sigma=0.3):
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    probs = [jnp.asarray(rng.dirichlet(np.ones(k), size=(1, height, width)),
                         jnp.float32) for _ in range(experts)]
    alphas = [rng.rand(k, k) * 4 + 0.5 for _ in range(experts)]
    prior = rng.dirichlet(np.ones(k))

    # ---- numerics: Dirichlet fusion ------------------------------------
    fused = np.asarray(fm.dirichlet_fusion(probs, alphas, prior, sigma=sigma))
    want = np.argmax(fused, axis=-1)
    got = np.asarray(dirichlet_kernel.dirichlet_fusion_label(
        probs, alphas, prior, sigma=sigma, interpret=False))
    mism = got != want
    n_mism = int(mism.sum())
    # every mismatch must be an argmax tie within float noise of the
    # per-pixel best score — anything larger is a real kernel bug
    margins = np.take_along_axis(
        fused, want[..., None], -1)[..., 0] - np.take_along_axis(
        fused, got[..., None], -1)[..., 0]
    max_margin = float(np.abs(margins[mism]).max()) if n_mism else 0.0
    scale = float(np.abs(fused).max())
    print(f"dirichlet: {n_mism}/{got.size} label diffs, "
          f"max score margin {max_margin:.3e} (score scale {scale:.1f})")
    assert max_margin <= 1e-4 * scale, "pallas dirichlet disagrees beyond ties"

    # ---- numerics: confusion accumulation ------------------------------
    preds = jnp.asarray(rng.randint(0, k, (4, height, width)))
    labels = jnp.asarray(rng.randint(-1, k, (4, height, width)))
    gotc = np.asarray(confusion_kernel.confusion_matrix(
        preds, labels, k, interpret=False))
    wantc = np.asarray(metrics.confusion_matrix(preds, labels, k))
    assert np.array_equal(gotc, wantc), "pallas confusion mismatch"
    print("confusion: exact match")

    if os.environ.get("MSSTPU_BENCH_NUMERICS_ONLY"):
        print(json.dumps({"dirichlet_label_diffs": n_mism,
                          "dirichlet_max_margin": max_margin}))
        return

    # ---- device time ----------------------------------------------------
    def xla_dirichlet(ps):
        return jnp.argmax(fm.dirichlet_fusion(ps, alphas, prior,
                                              sigma=sigma), -1)

    def pallas_dirichlet(ps):
        return dirichlet_kernel.dirichlet_fusion_label(
            ps, alphas, prior, sigma=sigma, interpret=False)

    # iters=200: both ops are far below the tunnel's dispatch jitter, so
    # the on-device loop must be long enough to dominate the noise floor
    t_xla = device_time_fn(jax.jit(xla_dirichlet), probs, iters=200)
    t_pal = device_time_fn(jax.jit(pallas_dirichlet), probs, iters=200)

    def xla_conf(p, l):
        return metrics.confusion_matrix(p, l, k)

    def pallas_conf(p, l):
        return confusion_kernel.confusion_matrix(p, l, k, interpret=False)

    tc_xla = device_time_fn(jax.jit(xla_conf), preds, labels, iters=200)
    tc_pal = device_time_fn(jax.jit(pallas_conf), preds, labels, iters=200)

    result = {
        "dirichlet_fusion_ms_xla": round(t_xla * 1e3, 4),
        "dirichlet_fusion_ms_pallas": round(t_pal * 1e3, 4),
        "confusion_ms_xla_4frames": round(tc_xla * 1e3, 4),
        "confusion_ms_pallas_4frames": round(tc_pal * 1e3, 4),
        "dirichlet_label_diffs": n_mism,
        "dirichlet_max_margin": max_margin,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
