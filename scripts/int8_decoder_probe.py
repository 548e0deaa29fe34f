"""Probe the int8 Amdahl remainder: decoder + small score convs.

Round-4 verdict item 3: end-to-end int8 serving is ~1.2x float while the
conv-chain probe measured 1.35-1.74x on the quantized stack — the float
remainder (decoder phase-decomposed deconv + 1x1 class-score conv,
score_conv5 under the min_pixels gate, softmax/fusion epilogue, pool
boundaries) now bounds the win. This probe measures, with the
loop-difference device timer (the tunnel-stable discipline):

  * the full fused-Bayes model at the production quantization gates
    (min_channels=128, min_pixels=2048) vs widened gates that pull in
    score_conv5 (min_pixels=0) and the 64-in decoder score conv + all
    64-in stem convs (min_channels=64) — int8 residency halves the
    decoder's dominant 768x384x64 activation traffic IF the quantize
    fuses into the upsample epilogue;
  * the encoder-only floor (both experts to their 'fused' features),
    separating the encoder segment from the decoder+softmax+fusion
    remainder by difference.

Run on the TPU: python scripts/int8_decoder_probe.py
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
    import bench
    from modular_semantic_segmentation_tpu.models.simple_fcn import encoder
    from modular_semantic_segmentation_tpu.ops.variables import Ctx

    print("devices:", jax.devices(), file=sys.stderr)

    net, batch = bench.build_flagship()
    rng = jax.random.PRNGKey(0)
    variables = {k: jax.device_put(v) for k, v in net.variables.items()}
    dbatch = {k: jax.device_put(v) for k, v in batch.items()}

    def full_forward(act_scales):
        def forward(variables, b):
            ctx = Ctx(variables, train=False, rng=rng,
                      compute_dtype=net.compute_dtype,
                      act_scales=act_scales)
            return net._test_outputs(ctx, b)["prediction"]
        return forward

    def encoder_forward(act_scales):
        """Both experts to their 'fused' skip features — everything
        BEFORE the decoder deconv/score/softmax/fusion epilogue. Runs
        the same cross-expert packed stems as the full model, so the
        full-minus-encoder difference isolates the decoder+fusion
        remainder instead of re-measuring the packing win."""
        from modular_semantic_segmentation_tpu.models.packed_experts \
            import packed_fcn_stems

        def forward(variables, b):
            ctx = Ctx(variables, train=False, rng=rng,
                      compute_dtype=net.compute_dtype,
                      act_scales=act_scales)
            modalities = ["rgb", "depth"]
            stems = packed_fcn_stems(ctx, b, modalities,
                                     net.config["prefixes"])
            outs = []
            for m in modalities:
                layers = encoder(ctx, b[m], net.config["prefixes"][m],
                                 net.config["num_units"], trainable=False,
                                 batchnorm=False, stem_layers=stems[m])
                outs.append(layers["fused"])
            return outs[0] + outs[1]
        return forward

    def floor(forward):
        return device_time_fn(forward, variables, dbatch,
                              iters=20, n2=60, repetitions=6)

    def calibrated(min_channels, min_pixels):
        net.act_scales = None
        scales = net.quantize_for_serving(batch, num_batches=1,
                                          min_channels=min_channels,
                                          min_pixels=min_pixels)
        return dict(scales)

    rows = []

    def report(name, seconds):
        rows.append((name, seconds))
        print(f"{name:46s} {seconds * 1e3:6.2f} ms/frame "
              f"({1.0 / seconds:6.1f} fps)", flush=True)

    report("full float bf16", floor(full_forward(None)))
    prod = calibrated(128, 2048)
    print(f"  production gates quantize {len(prod)} convs", file=sys.stderr)
    report("full int8 (mc=128, mp=2048; production)",
           floor(full_forward(prod)))
    wide_px = calibrated(128, 0)
    print(f"  min_pixels=0 quantizes {len(wide_px)} convs", file=sys.stderr)
    report("full int8 (mc=128, mp=0; +score_conv5)",
           floor(full_forward(wide_px)))
    wide_ch = calibrated(64, 0)
    print(f"  min_channels=64 quantizes {len(wide_ch)} convs",
          file=sys.stderr)
    report("full int8 (mc=64, mp=0; +decoder score conv)",
           floor(full_forward(wide_ch)))

    report("encoder-only float", floor(encoder_forward(None)))
    report("encoder-only int8 (production gates)",
           floor(encoder_forward(prod)))

    full_f = dict(rows)["full float bf16"]
    full_i = dict(rows)["full int8 (mc=128, mp=2048; production)"]
    enc_f = dict(rows)["encoder-only float"]
    enc_i = dict(rows)["encoder-only int8 (production gates)"]
    print(f"\ndecoder+fusion remainder: float {1e3 * (full_f - enc_f):.2f} "
          f"ms | int8 path {1e3 * (full_i - enc_i):.2f} ms")
    net.act_scales = None


if __name__ == "__main__":
    main()
