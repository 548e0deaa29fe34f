"""Post-training int8 quantization for TPU serving.

A production-serving feature with no reference equivalent (the reference
serves f32 on GPU, timing.py:23-311): the v5e MXU executes int8 at up to
2x its bf16 rate and int8 activation streams halve HBM traffic, so
quantizing the deep conv stack buys measurable single-chip latency at
zero training cost.

Design (measured in scripts/int8_probe.py / int8_chain_probe.py):
  * symmetric per-tensor activation scales, calibrated as the maximum
    |activation| seen over a few measure-set batches (the standard PTQ
    recipe);
  * symmetric per-output-channel weight scales, computed in-graph from
    the stored f32 kernels — the npz weight contract is untouched and a
    quantized model can still export/import weights;
  * only convs with at least ``min_channels`` input channels AND at
    least ``min_pixels`` input positions are quantized: the probes show
    int8 losing to bf16 below 128 channels at batch 1 (the 64-wide
    full-resolution convs are layout-bound, not MXU-bound) and winning
    1.3-1.6x on the deep blocks, while below ~2k spatial positions the
    MXU is underfed and the quantize ops at residual junctions dominate
    (AdapNet's 48x24 bottlenecks; min_pixels sweep in docs/TIMING.md);
  * everything else (BN, bias, activations, fusion math, softmax) stays
    in the float path; XLA folds the dequant multiply into the following
    BN/bias affine and fuses the next layer's quantize into the same
    epilogue, so intermediate tensors are int8-resident between convs.

Usage:
    net.quantize_for_serving(data.get_measureset())   # calibrate + enable
    net.score(data.get_testset())                     # runs int8 convs
"""

import jax
import jax.numpy as jnp
import numpy as np

from modular_semantic_segmentation_tpu.ops.variables import Ctx
from modular_semantic_segmentation_tpu.utils.data_io import iterate_batches


def calibrate_amax(net, data, num_batches=8, percentile=100.0):
    """Run ``num_batches`` of ``data`` through the test network recording
    each conv input's absolute max (or the given percentile of |input|
    per batch; the estimate across batches is always the running max).

    Returns a dict full-scope-name -> float amax (e.g.
    ``'rgb/conv4_1/input_amax' -> 5.31``).
    """
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def one(variables, batch):
        ctx = Ctx(variables, train=False, rng=rng,
                  compute_dtype=net.compute_dtype, calibrate=True,
                  calibrate_percentile=percentile)
        net._test_outputs(ctx, net._preprocess(batch))
        return ctx.amax

    running = {}
    # pad=True keeps every batch at the full static shape — a trailing
    # partial batch would otherwise force a second full-network compile
    for i, (batch, _valid) in enumerate(iterate_batches(
            data, net.config["batchsize"], pad=True)):
        if i >= num_batches:
            break
        batch = {k: v for k, v in batch.items() if k != "labels"}
        for key, value in one(net.variables, batch).items():
            value = float(value)
            running[key] = max(running.get(key, 0.0), value)
    if not running:
        raise ValueError("calibration saw no batches / no convs")
    return running


#: stem convs the cross-expert packed stack can run in int8
#: (models/packed_experts.py; conv1_1's thin im2col matmul stays bf16)
PACKED_STEM_CONVS = ("conv1_2", "conv2_1")


def select_scales(amax, variables, min_channels=128, min_pixels=2048,
                  packed_stem_prefixes=None):
    """Turn calibrated amaxes into activation scales for eligible convs.

    Eligibility:
      * the conv kernel's input-channel count (``<scope>/kernel``
        shape[2]) must be at least ``min_channels`` — below 128 channels
        at batch 1 the conv is layout-bound and int8 loses;
      * the conv input's spatial extent (recorded at calibration as
        ``<scope>/input_pixels``) must be at least ``min_pixels`` — at
        small spatial sizes the MXU is underfed and the quantize ops at
        residual junctions cost more than the int8 matmuls save. This is
        what regressed AdapNet (1x1 bottlenecks at 48x24 = 1152
        positions) before round 3; measured sweep in docs/TIMING.md.

    ``packed_stem_prefixes``: expert name prefixes whose FCN stems will
    execute cross-expert-packed (models/packed_experts.py). Their
    conv1_2/conv2_1 layers are judged at the PACKED width — the summed
    input channels across experts — because that is the conv that will
    actually run (two 64-ch experts pack to 128-in, int8-eligible;
    measured 1.18x on the stem, scripts/int8_stem_probe.py). A packed
    stem conv goes int8 only if EVERY expert's scale qualifies (the
    packed kernel is one op; per-expert input scales keep quantization
    granularity — see packed_experts._packed_int8_conv). Packed-stem
    scales are emitted under ``packed:<scope>/input_amax`` keys: only
    the packed stem op consumes that namespace, so if serving ends up
    on the unpacked path (spatial sharding, a model that doesn't pack)
    the 64-in stem convs run bf16 as the width rule intends — they can
    never silently pick up a packed-width int8 scale. The config-level
    packing conditions the caller can't see from a batch are mirrored
    here from the variables/calibration record: every prefix's conv1_1
    must take a thin (<= 4 channel) input and all experts must share
    one calibrated input grid (can_pack_stems' own gates).
    """
    scales = {}
    packed_stem_prefixes = list(packed_stem_prefixes or ())

    def packing_applies():
        """Mirror can_pack_stems' batch-shape gates from stored state."""
        if len(packed_stem_prefixes) < 2:
            return False
        grids = set()
        for prefix in packed_stem_prefixes:
            kernel = variables.get(f"{prefix}/conv1_1/kernel")
            if kernel is None or int(kernel.shape[2]) > 4:
                return False
            pixels = amax.get(f"{prefix}/conv1_1/input_pixels")
            if pixels is not None:
                grids.add(float(pixels))
        return len(grids) <= 1

    if not packing_applies():
        packed_stem_prefixes = []

    def packed_in_channels(name):
        total = 0
        for prefix in packed_stem_prefixes:
            kernel = variables.get(f"{prefix}/{name}/kernel")
            if kernel is None:
                return 0
            total += int(kernel.shape[2])
        return total

    for key, value in amax.items():
        if not key.endswith("/input_amax"):
            continue
        scope = key.rsplit("/", 1)[0]
        kernel = variables.get(scope + "/kernel")
        if kernel is None or kernel.ndim != 4:
            continue
        in_ch = int(kernel.shape[2])
        prefix, _, name = scope.rpartition("/")
        packed = prefix in packed_stem_prefixes and name in PACKED_STEM_CONVS
        if packed:
            in_ch = packed_in_channels(name)
        if in_ch < min_channels:
            continue
        pixels = amax.get(scope + "/input_pixels")
        if pixels is not None and pixels < min_pixels:
            continue
        if value <= 0.0 or not np.isfinite(value):
            continue
        scales[("packed:" + key) if packed else key] = value / 127.0
    # all-or-none per packed stem conv: the packed op can only quantize a
    # layer when every expert's input scale survived the filters above
    for name in PACKED_STEM_CONVS:
        keys = [f"packed:{p}/{name}/input_amax"
                for p in packed_stem_prefixes]
        if keys and not all(k in scales for k in keys):
            for k in keys:
                scales.pop(k, None)
    return scales
