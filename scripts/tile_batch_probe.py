"""Probe: does TILE-BATCHING recover the deep-conv batch-1 headroom?

docs/TIMING.md shows the fused Bayes forward at 768x384 runs 5.87
ms/frame at batch 1 but 4.78 ms/frame-equivalent at batch 16 — XLA's
conv tiling underfeeds the MXU at batch 1 in the deep (/8, /16) stages.
Hypothesis (round-3 verdict item 8): split ONE frame into T height tiles
with halos, run them as a batch-T forward, keep only the valid interior
— trading (768 + 2*halo*T)/768 FLOP inflation for batch-T tiling
efficiency.

The halo needed for EXACT equivalence is the network's half receptive
field (~100 px for VGG16 + the stride-8 decoder), which makes tiles
barely smaller than the frame; this probe measures APPROXIMATE tiling
(halo 32/48/64) and reports both device time and the seam error
(fraction of prediction pixels differing from the full-frame forward).

Run on the real TPU: python scripts/tile_batch_probe.py
Result recorded in docs/TIMING.md (kept only if it wins end-to-end).
"""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

print = functools.partial(print, flush=True)  # noqa: A001

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_flagship  # noqa: E402


def main():
    import jax

    from modular_semantic_segmentation_tpu.ops.variables import Ctx

    net, batch = build_flagship()
    height = batch["rgb"].shape[1]
    rng = jax.random.PRNGKey(0)
    variables = {k: jax.device_put(v) for k, v in net.variables.items()}
    # Device-resident inputs: a host-side batch costs ~5 MB per call over
    # the ~30 ms tunnel and buries the 5-6 ms device time we compare.
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    def forward(variables, b, rng):
        ctx = Ctx(variables, train=False, rng=rng,
                  compute_dtype=net.compute_dtype,
                  act_scales=net.act_scales)
        return net._test_outputs(ctx, net._preprocess(b))["prediction"]

    def tiled_forward(variables, b, rng, tiles, halo):
        th = height // tiles
        slabs = {k: [v[:, max(0, i * th - halo):
                       min(height, (i + 1) * th + halo)]
                     for i in range(tiles)] for k, v in b.items()}
        # equal-size interior slabs need uniform padding; pad edge slabs
        pads = []
        for i in range(tiles):
            top = halo if i > 0 else 0
            bot = halo if i < tiles - 1 else 0
            pads.append((halo - top, halo - bot))
        import jax.numpy as jnp
        stacked = {}
        for k, vs in slabs.items():
            padded = [jnp.pad(v, ((0, 0), pads[i], (0, 0), (0, 0)),
                              mode="edge")
                      for i, v in enumerate(vs)]
            stacked[k] = jnp.concatenate(padded, axis=0)
        ctx = Ctx(variables, train=False, rng=rng,
                  compute_dtype=net.compute_dtype,
                  act_scales=net.act_scales)
        pred = net._test_outputs(ctx, net._preprocess(stacked))["prediction"]
        outs = [pred[i, halo:halo + th] for i in range(tiles)]
        return jnp.concatenate(outs, axis=0)[None]

    def timed(fn, *args, calls=25):
        np.asarray(fn(*args))  # compile + warmup
        np.asarray(fn(*args))
        start = time.perf_counter()
        outs = [fn(*args) for _ in range(calls)]
        np.asarray(outs[-1])
        return (time.perf_counter() - start) / calls

    base_fn = jax.jit(forward)
    base_ms = timed(base_fn, variables, batch, rng) * 1e3
    ref = np.asarray(base_fn(variables, batch, rng))
    print(f"batch-1 full frame: {base_ms:.2f} ms/frame")

    for tiles in (2, 4):
        for halo in (32, 48, 64):
            fn = jax.jit(functools.partial(tiled_forward, tiles=tiles,
                                           halo=halo))
            ms = timed(fn, variables, batch, rng) * 1e3
            got = np.asarray(fn(variables, batch, rng))
            seam_err = float((got != ref).mean())
            inflate = (height + 2 * halo * tiles) / height
            print(f"tiles={tiles} halo={halo}: {ms:.2f} ms/frame "
                  f"(FLOP x{inflate:.2f}, seam mismatch {seam_err:.4f})")


if __name__ == "__main__":
    main()
