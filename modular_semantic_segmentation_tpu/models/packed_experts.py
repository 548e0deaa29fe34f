"""Cross-expert block-diagonal packing of the FCN stems (serving path).

Fusion models run E structurally-identical expert networks on the same
spatial grid (reference xview/models/basic_fusion_model.py:9-23 builds
them purely by name prefix). On TPU the experts' conv1_1..conv2_1 stems
are the one part of the forward that runs far below the MXU ceiling: at
64 channels half the 128 vector lanes idle (conv1_2 measures 38 TFLOP/s
vs ~130 for the deep convs — docs/TIMING.md roofline), and every
*within-expert* repacking (space-to-depth, W-pair packing, grouped
convs, Pallas) has been measured on the v5e and rejected.

This module packs *across experts* instead: the E stems execute as ONE
dense conv stack at E-times the channel width with BLOCK-DIAGONAL
kernels

    [ W_rgb   0      ]
    [ 0     W_depth  ]

Unlike ``feature_group_count=E`` (measured 9x slower — the grouped-conv
lowering) this is a plain dense conv that XLA tiles normally. The zero
blocks cost ExFLOPs, but the lane-starved stem trades them for full lane
occupancy: measured on the v5e the two-expert packed stem runs 1.17x the
separate stems (1.94 -> 1.66 ms, scripts/expert_pack_probe.py), and the
win survives in-model because the pack happens at the raw inputs and the
split lands on conv2_1's 256-channel output — a 128-lane tile boundary,
so slicing the per-expert halves costs no relayout. Packing stops there:
from conv2_2 on the per-expert convs already run at >=50% of peak, where
the ExFLOP inflation loses (conv1_2-only block-diag measures 1.03x;
conv2_2 would regress).

Numerics: adding zero products is exact in every float format, so the
packed stem computes the same contractions as the separate stems; only
the MXU tiling order of partial sums can differ (bf16-ulp scale, bounded
by tests/test_expert_packing.py). Variables are read through the SAME
``Ctx`` scopes the unpacked layers use (``<prefix>/conv1_1/kernel``...),
so init, npz import/export and the weight contract are untouched.
"""

import jax
import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops import init as initializers
from modular_semantic_segmentation_tpu.ops import layers as ll

#: stem convs replaced by the packed stack, in execution order
STEM_CONVS = ("conv1_1", "conv1_2", "conv2_1")


def can_pack_stems(ctx, batch, modalities, config):
    """True when the cross-expert packed stem applies.

    Requirements: >=2 FCN experts on the same spatial grid with thin
    (<=4-channel) inputs — the conv1_1 im2col fast path's own gate.
    Falls back to the plain per-expert build under spatial sharding (the
    packed convs don't exchange row halos) and during PTQ calibration
    (so the recorded amax keys match the unpacked scopes exactly). int8
    serving scales on stem convs are CONSUMED, not a fallback: when
    quantize.select_scales judged the packed widths eligible it emits
    them under ``packed:`` keys only this module reads, and conv1_2/
    conv2_1 run the int8 recipe with per-expert input scales (see
    :func:`_packed_int8_conv`); on any unpacked fallback the stems run
    bf16 — never per-tensor int8 at 64-in."""
    if not config.get("pack_experts", True):
        return False
    if config.get("expert_model") != "fcn":
        return False
    if len(modalities) < 2:
        return False
    if ctx.spatial_axis is not None or ctx.calibrate:
        return False
    shapes = {tuple(int(s) for s in batch[m].shape[:3]) for m in modalities}
    if len(shapes) != 1:
        return False
    if any(int(batch[m].shape[-1]) > 4 for m in modalities):
        return False
    return True


def _packed_int8_conv(x, kernel, scales, in_widths, out_widths):
    """int8 conv of a BLOCK-DIAGONAL kernel with PER-EXPERT input scales.

    A shared per-tensor activation scale across packed experts fails
    hard: rgb activations (0..255-scale inputs) dwarf depth's, so the
    depth half would quantize to ~zero (measured 0.99 rel err,
    scripts/int8_stem_probe.py). Per-input-channel scales normally don't
    commute through a dense conv — every output sums inputs with mixed
    scales — but a block-diagonal kernel routes input block e only to
    output block e, so quantizing each expert's channels with its own
    scale and dequantizing per OUTPUT channel with (input-block scale x
    per-channel weight scale) is exact int8 arithmetic at per-expert
    granularity. Same epilogue contract as the per-expert int8 path in
    ops/layers.conv2d: returns the float32 dequantized accumulator.
    """
    ascale_in = jnp.concatenate(
        [jnp.full((w,), s, jnp.float32) for s, w in zip(scales, in_widths)])
    ascale_out = jnp.concatenate(
        [jnp.full((w,), s, jnp.float32) for s, w in zip(scales, out_widths)])
    kscale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)),
                         1e-12) / 127.0
    kq = jnp.clip(jnp.round(kernel / kscale), -127, 127).astype(jnp.int8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale_in),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, kq, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (ascale_out * kscale)


def packed_fcn_stems(ctx, batch, modalities, prefixes, channel_factor=1.0,
                     batch_normalization=False, trainable=False):
    """Run all experts' conv1_1..conv2_1 stems as one block-diagonal stack.

    Returns ``{modality: layer dict}`` with the per-expert ``conv1_1``,
    ``conv1_2``, ``pool1`` and ``conv2_1`` slices — drop-in for
    :func:`..models.simple_fcn.encoder_stem` via ``stem_layers=``. Unused
    slice entries are dead-code-eliminated by XLA; only ``conv2_1`` (the
    lane-aligned split) feeds the per-expert rest.

    Epilogue semantics mirror ``ops.layers.conv2d`` exactly: conv + bias
    (float32 promote) -> cast to compute dtype -> optional eval-mode BN
    (float32 affine from the moving statistics) -> ReLU.
    """
    dtype = ctx.compute_dtype
    c = lambda w: max(1, int(w * channel_factor))  # noqa: E731
    c64, c128 = c(64), c(128)
    E = len(modalities)

    def get_conv(m, name, cin, cout):
        with ctx.scope(prefixes[m]), ctx.scope(name):
            k = ctx.get("kernel", (3, 3, cin, cout),
                        initializers.glorot_uniform, trainable=trainable)
            b = ctx.get("bias", (cout,), initializers.zeros,
                        trainable=trainable)
        return k, b

    def get_bn(m, name, dim):
        # conv2d's BN call creates gamma/beta with trainable=True even on
        # frozen convs (the reference's TF-layers quirk) — mirror it so
        # init from the packed path records identical trainable flags.
        with ctx.scope(prefixes[m]), ctx.scope(name):
            gamma = ctx.get("gamma", (dim,), initializers.ones,
                            trainable=True)
            beta = ctx.get("beta", (dim,), initializers.zeros,
                           trainable=True)
            mean = ctx.get("moving_mean", (dim,), initializers.zeros,
                           trainable=False)
            var = ctx.get("moving_variance", (dim,), initializers.ones,
                          trainable=False)
        return gamma, beta, mean, var

    def epilogue(out, name, widths):
        """bias -> [BN] -> relu on the packed tensor, per conv2d."""
        bias = jnp.concatenate(
            [get_conv_cache[(m, name)][1] for m in modalities])
        out = out + bias  # float32 promote, like conv2d
        out = out.astype(dtype)
        if batch_normalization:
            dim = out.shape[-1]
            g, b, mu, v = zip(*(get_bn(m, name, w)
                                for m, w in zip(modalities, widths)))
            gamma, beta = jnp.concatenate(g), jnp.concatenate(b)
            mean, var = jnp.concatenate(mu), jnp.concatenate(v)
            assert int(dim) == gamma.shape[0]
            x32 = out.astype(jnp.float32)
            inv = jax.lax.rsqrt(var + ll.BN_EPSILON) * gamma
            out = (x32 * inv + (beta - mean * inv)).astype(dtype)
        return jax.nn.relu(out)

    get_conv_cache = {}

    def kernels(name, cin_per_m, cout):
        ks = []
        for m in modalities:
            k, b = get_conv(m, name, cin_per_m[m], cout)
            get_conv_cache[(m, name)] = (k, b)
            ks.append(k)
        return ks

    # ---- conv1_1: concat the experts' im2col streams -> one matmul
    # (the conv2d thin-input fast path, generalized across experts)
    cins = {m: int(batch[m].shape[-1]) for m in modalities}
    k11 = kernels("conv1_1", cins, c64)
    h, w = int(batch[modalities[0]].shape[1]), int(batch[modalities[0]].shape[2])
    patch_list = []
    for m in modalities:
        xd = batch[m].astype(dtype)
        xp = jnp.pad(xd, ((0, 0), (1, 1), (1, 1), (0, 0)))
        patch_list.append(jnp.concatenate(
            [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(3)
             for dx in range(3)], axis=-1))
    patches = jnp.concatenate(patch_list, axis=-1)
    rows = sum(9 * cins[m] for m in modalities)
    kk = jnp.zeros((rows, E * c64), jnp.float32)
    r = col = 0
    for m, k in zip(modalities, k11):
        kk = kk.at[r:r + 9 * cins[m], col:col + c64].set(
            k.reshape(9 * cins[m], c64))
        r += 9 * cins[m]
        col += c64
    c11 = jnp.einsum("nhwp,pf->nhwf", patches, kk.astype(dtype),
                     preferred_element_type=dtype)
    c11 = epilogue(c11, "conv1_1", [c64] * E)

    def block_diag(ks):
        kh, kw = ks[0].shape[0], ks[0].shape[1]
        tot_in = sum(int(k.shape[2]) for k in ks)
        tot_out = sum(int(k.shape[3]) for k in ks)
        out = jnp.zeros((kh, kw, tot_in, tot_out), jnp.float32)
        i = o = 0
        for k in ks:
            out = out.at[:, :, i:i + k.shape[2], o:o + k.shape[3]].set(k)
            i += int(k.shape[2])
            o += int(k.shape[3])
        return out

    def conv(x, kernel):
        return jax.lax.conv_general_dilated(
            x, kernel.astype(dtype), window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype)

    def stem_conv(x, name, cout, out_w):
        """Block-diagonal stem conv; int8 when the serving scales carry
        ALL experts' calibrated amax for this layer (quantize.
        select_scales judged the packed width eligible and enforced
        all-or-none), bf16/f32 otherwise."""
        kernel = block_diag(kernels(name, {m: c64 for m in modalities},
                                    cout))
        # scales live in the packed: namespace — emitted by quantize.
        # select_scales ONLY for packed-width-judged stem convs, and
        # consumed ONLY here, so the unpacked conv2d path can never pick
        # up a packed-width scale for a 64-in conv it would run slowly
        keys = [f"packed:{prefixes[m]}/{name}/input_amax"
                for m in modalities]
        if ctx.act_scales and all(k in ctx.act_scales for k in keys):
            out = _packed_int8_conv(
                x, kernel, [jnp.float32(ctx.act_scales[k]) for k in keys],
                [c64] * E, [out_w] * E)
        else:
            out = conv(x, kernel)
        return epilogue(out, name, [out_w] * E)

    # ---- conv1_2 (dense ExC64 block-diagonal), pool1, conv2_1
    c12 = stem_conv(c11, "conv1_2", c64, c64)
    pl1 = ll.max_pool2d(ctx, c12, 2, 2)
    c21 = stem_conv(pl1, "conv2_1", c128, c128)

    stems = {}
    for i, m in enumerate(modalities):
        s64 = slice(i * c64, (i + 1) * c64)
        s128 = slice(i * c128, (i + 1) * c128)
        stems[m] = {"conv1_1": c11[..., s64], "conv1_2": c12[..., s64],
                    "pool1": pl1[..., s64], "conv2_1": c21[..., s128]}
    return stems
