"""Phase-form decoder fusion: measured IN-MODEL and REJECTED.

decoder_piece_probe measured the isolated decoder pair at 0.465 ms and
the phase-form fusion (1x1 score conv applied BEFORE the upsample's
depth-to-space interleave — exact, since relu and per-pixel matmuls
commute with the spatial permutation) at 0.206 — yet wiring the fused
path into simple_fcn.decoder moved the full-model bf16 floor
4.53 -> 5.34 ms. This probe swaps decoder variants in-model
(monkeypatching simple_fcn.decoder) to locate the interaction:

  V0 fused (phase einsum nhwpqc + 6-D score einsum)        5.36 ms
  V1 standard deconv2d + conv2d (the production pair)      4.53 ms
  V2 phase einsum -> interleave 64ch -> pixel matmul       4.54 ms
  V3 fused, upscore slot returns score (no 64ch d2s)       5.37 ms
  V4 fused, score as explicit 2-D reshape matmul           5.37 ms

Verdict (docs/TIMING.md round 5): ANY score matmul consuming the
un-interleaved phase tensor costs +0.8 ms in-model regardless of how
the contraction is written (V0/V3/V4), while the isolated measurement
of the same shapes wins 2.3x — the micro-benchmark lied about the
in-context layout choices. V2 == V1 shows the phase einsum itself is
neutral; the production pair (diagonal_upsample + conv2d's pixel
matmul) is already the in-model optimum, so simple_fcn.decoder keeps
the standard two ops. The briefly-added library implementation
(ops/layers.fused_bilinear_decoder) was removed with this rejection;
the variants live here self-contained.

Run on the TPU: python scripts/fused_decoder_inmodel_probe.py
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
    import bench
    from modular_semantic_segmentation_tpu.models import simple_fcn
    from modular_semantic_segmentation_tpu.ops import layers as ll
    from modular_semantic_segmentation_tpu.ops import fast_upsample as fu
    from modular_semantic_segmentation_tpu.ops import init as initializers
    from modular_semantic_segmentation_tpu.ops.variables import Ctx

    print("devices:", jax.devices(), file=sys.stderr)
    net, batch = bench.build_flagship()
    rng = jax.random.PRNGKey(0)
    variables = {k: jax.device_put(v) for k, v in net.variables.items()}
    dbatch = {k: jax.device_put(v) for k, v in batch.items()}
    standard_decoder = simple_fcn.decoder

    def forward(variables, b):
        ctx = Ctx(variables, train=False, rng=rng,
                  compute_dtype=net.compute_dtype,
                  act_scales=net.act_scales)
        return net._test_outputs(ctx, b)["prediction"]

    def floor(name):
        t = device_time_fn(forward, variables, dbatch,
                           iters=20, n2=60, repetitions=6)
        print(f"{name:52s} {t * 1e3:6.2f} ms/frame ({1.0 / t:6.1f} fps)",
              flush=True)

    def phase_upsample(x, diag, s):
        """diagonal_upsample stopping BEFORE depth-to-space:
        [N, H, W, s, s, C] phase tensor (same taps, same contraction)."""
        k = int(diag.shape[0])
        n, h, w, c = x.shape
        offsets, m = fu._selection_tensor(k, s)
        kern = diag[::-1, ::-1, :].astype(jnp.float32)
        mj = jnp.asarray(m)
        weights = jnp.einsum("pyi,qxj,ijc->pqyxc", mj, mj,
                             kern).astype(x.dtype)
        lo, hi = -min(offsets), max(offsets)
        xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
        shifted = jnp.stack(
            [jnp.stack([xp[:, oy + lo:oy + lo + h, ox + lo:ox + lo + w, :]
                        for ox in offsets], axis=0)
             for oy in offsets], axis=0)
        out = jnp.einsum("pqyxc,yxnhwc->nhwpqc", weights, shifted,
                         preferred_element_type=jnp.float32)
        return out.astype(x.dtype)

    def interleave(y):
        n, h, w, s, s2, c = y.shape
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * s, w * s2, c)

    def make_decoder(mode):
        def decoder_variant(ctx, features, prefix, num_units, num_classes,
                            trainable=True, batchnorm=True,
                            dropout_rate=None):
            if ctx.train or ctx.calibrate or ctx.spatial_axis is not None:
                return standard_decoder(ctx, features, prefix, num_units,
                                        num_classes, trainable=trainable,
                                        batchnorm=batchnorm,
                                        dropout_rate=dropout_rate)
            dtype = ctx.compute_dtype
            in_ch = int(features.shape[-1])
            with ctx.scope(prefix):
                if dropout_rate is not None:
                    features = ll.dropout(ctx, features, dropout_rate)
                with ctx.scope("upscore"):
                    up_kernel = ctx.get(
                        "kernel", (16, 16, in_ch, in_ch),
                        initializers.bilinear_filter_initializer,
                        trainable=False)
                idx = np.arange(in_ch)
                diag = up_kernel[:, :, idx, idx]
                phase = phase_upsample(features.astype(dtype),
                                       diag.astype(dtype), 8)
                phase = phase.astype(dtype)
                if batchnorm:
                    phase = ll.batch_norm(ctx, phase, "upscore",
                                          trainable=True)
                phase = jax.nn.relu(phase)
                with ctx.scope("score"):
                    sk = ctx.get("kernel", (1, 1, in_ch, int(num_classes)),
                                 initializers.glorot_uniform,
                                 trainable=trainable)
                    sb = ctx.get("bias", (int(num_classes),),
                                 initializers.zeros, trainable=trainable)
                if mode == "einsum6d" or mode == "no_upscore_d2s":
                    out = jnp.einsum("nhwpqc,cd->nhwpqd", phase,
                                     sk[0, 0].astype(dtype))
                    out = (out + sb).astype(dtype)
                    if batchnorm:
                        out = ll.batch_norm(ctx, out, "score",
                                            trainable=True)
                    score = interleave(out)
                    upscore = (score if mode == "no_upscore_d2s"
                               else interleave(phase))
                elif mode == "reshape2d":
                    n, hh, ww, p, q, cc = phase.shape
                    out = (phase.reshape(n * hh * ww * p * q, cc)
                           @ sk[0, 0].astype(dtype))
                    out = out.reshape(n, hh, ww, p, q, int(num_classes))
                    out = (out + sb).astype(dtype)
                    if batchnorm:
                        out = ll.batch_norm(ctx, out, "score",
                                            trainable=True)
                    score = interleave(out)
                    upscore = score
                else:  # interleave_then_matmul
                    upscore = interleave(phase)
                    n, hh, ww, cc = upscore.shape
                    out = (upscore.reshape(n * hh * ww, cc)
                           @ sk[0, 0].astype(dtype))
                    out = (out.reshape(n, hh, ww, int(num_classes)) + sb
                           ).astype(dtype)
                    if batchnorm:
                        out = ll.batch_norm(ctx, out, "score",
                                            trainable=True)
                    score = out
            return {"upscore": upscore, "score": score}
        return decoder_variant

    simple_fcn.decoder = make_decoder("einsum6d")
    floor("V0 fused (6-D score einsum, upscore interleave)")
    simple_fcn.decoder = standard_decoder
    floor("V1 standard pair (production)")
    simple_fcn.decoder = make_decoder("interleave_then_matmul")
    floor("V2 phase upsample -> interleave -> pixel matmul")
    simple_fcn.decoder = make_decoder("no_upscore_d2s")
    floor("V3 fused, upscore slot returns score (no 64ch d2s)")
    simple_fcn.decoder = make_decoder("reshape2d")
    floor("V4 fused, score as 2-D reshape matmul on phases")
    simple_fcn.decoder = standard_decoder


if __name__ == "__main__":
    main()
