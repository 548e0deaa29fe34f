"""Micro-probe the decoder+fusion remainder pieces at actual shapes.

int8_decoder_probe measured the post-encoder remainder at ~1.0 ms/frame
(27% of the int8 serving floor) — 3x its ~0.3 ms HBM traffic bound.
This probe times each piece in isolation (loop-difference device timer):

  A. diagonal x8 upsample [1,96,48,64] -> [1,768,384,64] (as-is:
     phase einsum + depth-to-space interleave + relu)
  B. 1x1 score conv 64->14 @768x384 (the pixel-matmul path)
  C. A+B chained (what the decoder runs today, x2 experts in-model)
  D. phase-form fusion: upsample WITHOUT the 64-ch interleave, relu +
     score conv on the compact [1,96,48,pq64] phase tensor, then
     depth-to-space of the 14-ch result — exact (relu is elementwise,
     the 1x1 conv is per-pixel, both commute with the spatial
     permutation), but the 37.7 MB relayout happens at 14 channels
     instead of 64.
  E. the Bayes fusion epilogue: two [1,768,384,14] score argmaxes +
     one-hot confusion contraction + fused argmax.

Run on the TPU: python scripts/decoder_piece_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

from modular_semantic_segmentation_tpu.utils.profiling import device_time_fn


def main():
    import jax
    import jax.numpy as jnp
    from modular_semantic_segmentation_tpu.ops import fast_upsample as fu

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.RandomState(0)
    h, w, c, s, k, nc = 96, 48, 64, 8, 16, 14

    x = jax.device_put(np.asarray(rng.rand(1, h, w, c) - 0.3, np.float32)
                       .astype(jnp.bfloat16))
    diag = jax.device_put(np.asarray(rng.rand(k, k, c), np.float32))
    score_k = jax.device_put(np.asarray(rng.rand(1, 1, c, nc) - 0.5,
                                        np.float32).astype(jnp.bfloat16))
    score_b = jax.device_put(np.zeros((nc,), np.float32))

    def upsample(x, diag):
        return jax.nn.relu(fu.diagonal_upsample(x, diag, s))

    def score(y, kern, bias):
        out = jax.lax.conv_general_dilated(
            y, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out + bias

    def chained(x, diag, kern, bias):
        return score(upsample(x, diag), kern, bias)

    def phase_form(x, diag, kern, bias):
        """Upsample staying in phase-channel form; relu + 1x1 score per
        phase; depth-to-space the 14-channel result. Exact vs chained."""
        n = x.shape[0]
        offsets, m = fu._selection_tensor(k, s)
        kf = diag[::-1, ::-1, :].astype(jnp.float32)
        mj = jnp.asarray(m)
        weights = jnp.einsum("pyi,qxj,ijc->pqyxc", mj, mj,
                             kf).astype(x.dtype)
        lo, hi = -min(offsets), max(offsets)
        xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
        shifted = jnp.stack(
            [jnp.stack([xp[:, oy + lo:oy + lo + h, ox + lo:ox + lo + w, :]
                        for ox in offsets], axis=0)
             for oy in offsets], axis=0)
        y = jnp.einsum("pqyxc,yxnhwc->nhwpqc", weights, shifted,
                       preferred_element_type=jnp.float32)
        y = jax.nn.relu(y).astype(x.dtype)
        out = jnp.einsum("nhwpqc,cd->nhwpqd", y,
                         kern[0, 0].astype(x.dtype),
                         preferred_element_type=jnp.float32) + bias
        out = out.transpose(0, 1, 3, 2, 4, 5)  # n h p w q d
        return out.reshape(n, h * s, w * s, nc)

    # exactness check (same contraction, different order: bf16-ulp scale)
    ref = np.asarray(chained(x, diag, score_k, score_b), np.float32)
    alt = np.asarray(phase_form(x, diag, score_k, score_b), np.float32)
    err = np.max(np.abs(ref - alt)) / max(1e-9, np.max(np.abs(ref)))
    print(f"phase-form max rel err vs chained: {err:.2e}")

    sa = jax.device_put(np.asarray(
        rng.rand(1, h * s, w * s, nc), np.float32))
    sb = jax.device_put(np.asarray(
        rng.rand(1, h * s, w * s, nc), np.float32))
    cm = np.asarray(rng.rand(nc, nc) + np.eye(nc) * 5, np.float32)

    def bayes_tail(sa, sb):
        # cms are trace-time constants, as in the model (bayes_fusion
        # takes host arrays and embeds the log-conditionals)
        from modular_semantic_segmentation_tpu.ops import fusion_math
        ca = jnp.argmax(sa, -1)
        cb = jnp.argmax(sb, -1)
        return jnp.argmax(fusion_math.bayes_fusion([ca, cb], [cm, cm])[0],
                          -1)

    def floor(fn, *args, name):
        t = device_time_fn(fn, *args, iters=40, n2=160, repetitions=6)
        print(f"{name:42s} {t * 1e3:6.3f} ms", flush=True)
        return t

    def score_matmul(y, kern, bias):
        """The conv2d large-spatial 1x1 fast path (what the model runs
        today): [pixels, 64] @ [64, 14] pixel matmul."""
        n, hh, ww, cc = y.shape
        out = (y.reshape(n * hh * ww, cc)
               @ kern[0, 0].astype(y.dtype))
        return out.reshape(n, hh, ww, nc).astype(jnp.float32) + bias

    def chained_matmul(x, diag, kern, bias):
        return score_matmul(upsample(x, diag), kern, bias)

    floor(upsample, x, diag, name="A upsample+relu (interleaved, 64ch)")
    y = jax.device_put(np.asarray(upsample(x, diag)))
    floor(score, y, score_k, score_b, name="B 1x1 score conv @768x384")
    floor(score_matmul, y, score_k, score_b,
          name="B' 1x1 score as pixel matmul (in-model)")
    floor(chained, x, diag, score_k, score_b, name="C chained A->B")
    floor(chained_matmul, x, diag, score_k, score_b,
          name="C' chained A->B' (today's in-model path)")
    floor(phase_form, x, diag, score_k, score_b,
          name="D phase-form upsample+score")
    floor(bayes_tail, sa, sb, name="E bayes epilogue (2 experts)")


if __name__ == "__main__":
    main()
