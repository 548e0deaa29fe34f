"""Functional NN layers on JAX/XLA, matching the reference's TF1 semantics.

Semantics locked to the reference (validated against tf.compat.v1 in
tests/test_tf_parity.py):
    * conv2d: SAME padding, optional conv -> batch-norm -> activation ordering
      (reference xview/models/custom_layers.py:124-139).
    * batch-norm: TF layers defaults momentum=0.99, epsilon=1e-3; training mode
      uses batch stats and records moving-stat updates functionally.
    * deconv2d: transposed conv with a FROZEN bilinear-interpolation kernel,
      no bias (custom_layers.py:71-121). Kernel stored in the TF
      conv2d_transpose layout [H, W, out, in] — the npz weight contract.
    * adap_conv: progressive-nets adapter block (custom_layers.py:142-219).

All layers read/create variables through :class:`..ops.variables.Ctx`, so the
same function body serves init and apply; everything traces into one XLA
program — no graph/session split.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from modular_semantic_segmentation_tpu.ops import init as initializers

# TF tf.layers.batch_normalization defaults.
BN_MOMENTUM = 0.99
BN_EPSILON = 1e-3


def _accum_dtype(dtype):
    """Conv output/accumulation dtype.

    The TPU MXU always accumulates partial products in float32 internally;
    requesting the compute dtype as the output keeps forward/backward conv
    dtypes consistent (a float32 preferred_element_type over bfloat16
    inputs breaks jax's conv VJP with mismatched-dtype errors)."""
    return dtype


def _pair(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v), int(v))


def batch_norm(ctx, x, name, trainable=True):
    """TF1-style batch normalization over the channel (last) axis.

    In training mode normalizes with batch statistics and records
    moving-average updates in ``ctx.updates``; in eval mode uses the stored
    moving statistics. Variables: ``<name>/{gamma,beta,moving_mean,
    moving_variance}`` — same names TF layers produce, keeping npz
    import/export compatible (reference base_model.py:361-393).
    """
    dim = x.shape[-1]
    with ctx.scope(name):
        gamma = ctx.get("gamma", (dim,), initializers.ones, trainable=trainable)
        beta = ctx.get("beta", (dim,), initializers.zeros, trainable=trainable)
        moving_mean = ctx.get("moving_mean", (dim,), initializers.zeros,
                              trainable=False)
        moving_var = ctx.get("moving_variance", (dim,), initializers.ones,
                             trainable=False)
        # Statistics ALWAYS in float32: batch means/variances over
        # 768x384 frames in bf16 lose ~7 bits and drift training away
        # from the reference (the conv-VJP constraint in _accum_dtype
        # applies to conv preferred_element_type, not to this astype,
        # which has a well-defined VJP).
        x32 = x.astype(jnp.float32)
        if ctx.train:
            axes = tuple(range(x.ndim - 1))
            if ctx.spatial_axis is not None:
                # Spatial-parallel training (parallel/spatial.py): batch
                # statistics over the GLOBAL (N, H, W) — psum the per-shard
                # sums so every shard normalizes identically (the TPU
                # analogue of sync-BN; local-only stats would make the
                # sharded and unsharded models diverge).
                count = float(np.prod([x.shape[i] for i in axes])) \
                    * jax.lax.axis_size(ctx.spatial_axis)
                mean = jax.lax.psum(jnp.sum(x32, axis=axes),
                                    ctx.spatial_axis) / count
                var = jax.lax.psum(
                    jnp.sum(jnp.square(x32 - jax.lax.stop_gradient(mean)),
                            axis=axes), ctx.spatial_axis) / count
            else:
                mean = jnp.mean(x32, axis=axes)
                # Biased variance via the two-pass form (tf.nn.moments): the
                # E[x^2]-E[x]^2 shortcut cancels catastrophically for
                # large-magnitude inputs (raw 0..255 images).
                var = jnp.mean(
                    jnp.square(x32 - jax.lax.stop_gradient(mean)), axis=axes)
            ctx.record_update(
                "moving_mean",
                BN_MOMENTUM * moving_mean + (1.0 - BN_MOMENTUM) * mean)
            ctx.record_update(
                "moving_variance",
                BN_MOMENTUM * moving_var + (1.0 - BN_MOMENTUM) * var)
        else:
            mean, var = moving_mean, moving_var
        inv = jax.lax.rsqrt(var + BN_EPSILON) * gamma
        out = x32 * inv + (beta - mean * inv)
    return out.astype(x.dtype)


def _conv_same(x, kernel, dilation):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_taps_grad(x, kernel, dilation):
    """Stride-1 SAME conv with a matmul-decomposed kernel gradient.

    XLA's kernel-gradient lowering for batch-1 stride-1 convs (a conv
    whose spatial extent becomes the contraction) runs far below the HBM
    bound on TPU — 1.53 ms for conv1_2's 768x384x64->64 kernel grad vs a
    ~0.15 ms traffic floor (scripts/conv_kernel_grad_probe.py). Computing
    it instead as kh*kw shifted-slice contractions
    ``G[dy,dx] = x_shift(dy,dx)[pixels, Cin].T @ ct[pixels, Cout]``
    keeps every read a fused slice of the padded input and runs each tap
    on the MXU: 4.0x/4.3x/2.3x faster at the 64/128/256-channel VGG
    stages and 3.0x for the dilated AdapNet blocks (it loses only at
    96x48x512, where conv2d keeps XLA's VJP — see the gate there).
    Accumulation is full float32 (the einsum's preferred_element_type),
    unlike XLA's bf16-output conv VJP which rounds partial sums between
    K-tiles — locked by tests/test_ops.py::test_conv_taps_gradients.
    """
    return _conv_same(x, kernel, dilation)


def _conv_taps_grad_fwd(x, kernel, dilation):
    return _conv_same(x, kernel, dilation), (x, kernel)


def _conv_taps_grad_bwd(dilation, res, ct):
    x, kernel = res
    kh, kw, cin, cout = kernel.shape
    n, h, w, _ = x.shape
    dh, dw = dilation
    # input grad: mirrored conv (spatial flip + I/O swap); SAME padding of
    # an odd dilated kernel is symmetric, so the transpose is again SAME
    dx = _conv_same(ct, jnp.flip(kernel, (0, 1)).swapaxes(2, 3), dilation)
    # kernel grad: per-tap shifted-slice contractions
    ph, pw = dh * (kh // 2), dw * (kw // 2)
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    ctf = ct.reshape(n * h * w, cout)
    rows = []
    for ty in range(kh):
        cols = []
        for tx in range(kw):
            tap = xp[:, ty * dh:ty * dh + h,
                     tx * dw:tx * dw + w, :].reshape(n * h * w, cin)
            cols.append(jnp.einsum("pi,pc->ic", tap, ctf,
                                   preferred_element_type=jnp.float32))
        rows.append(jnp.stack(cols, 0))
    dk = jnp.stack(rows, 0).astype(kernel.dtype)
    return (dx.astype(x.dtype), dk)


_conv_taps_grad.defvjp(_conv_taps_grad_fwd, _conv_taps_grad_bwd)


# Channel gate for the taps kernel gradient in conv2d: XLA's own conv VJP
# catches up at 512 channels / small spatial (0.81x isolated at 96x48x512),
# and the in-context train-step sweep measured max_ch 64/128/256 at
# 12.8/12.7/12.9 ms — 128 keeps XLA's VJP for the 256-channel stage where
# its fusion wins back the isolated 2.3x. Dilated convs use taps at any
# width (3x win at dil 16).
TAPS_GRAD_MAX_CH = 128


def conv2d(ctx, x, filters, kernel_size, name, strides=1, dilation_rate=1,
           activation=jax.nn.relu, use_bias=True, trainable=True,
           batch_normalization=False, kernel_initializer=None, padding="same"):
    """2-D convolution with optional post-conv batch-norm-then-activation.

    Mirrors reference custom_layers.py:124-139: when batch_normalization is
    on, the order is conv -> BN -> activation; otherwise conv(+bias) ->
    activation. Kernel layout [H, W, in, out] (TF/HWIO — npz contract).
    """
    kh, kw = _pair(kernel_size)
    strides = _pair(strides)
    dilation = _pair(dilation_rate)
    in_ch = int(x.shape[-1])
    kernel_initializer = kernel_initializer or initializers.glorot_uniform
    with ctx.scope(name):
        kernel = ctx.get("kernel", (kh, kw, in_ch, int(filters)),
                         kernel_initializer, trainable=trainable)
        dtype = ctx.compute_dtype
        quant_key = ctx.full_name("input_amax")
        if ctx.calibrate:
            # PTQ calibration pass (models/quantize.py): record the input's
            # absolute max (or a percentile of |input|, clipping outliers
            # at the cost of saturating them later), keyed by this conv's
            # scope. Running max across invocations — MC-sampling models
            # (variance_fusion) re-enter the same conv scope several times
            # per forward.
            q = getattr(ctx, "calibrate_percentile", 100.0)
            absx = jnp.abs(x.astype(jnp.float32))
            amax = (jnp.max(absx) if q >= 100.0
                    else jnp.percentile(absx, q))
            if quant_key in ctx.amax:
                amax = jnp.maximum(ctx.amax[quant_key], amax)
            ctx.amax[quant_key] = amax
            # static spatial extent of this conv's input, for the
            # quantization-eligibility rule (models/quantize.select_scales
            # min_pixels): int8 loses below ~4k positions at batch 1 —
            # the MXU is underfed and the quantize ops at residual
            # junctions cost more than the int8 matmul saves (AdapNet's
            # 1x1 bottlenecks, docs/TIMING.md).
            ctx.amax[ctx.full_name("input_pixels")] = jnp.float32(
                int(x.shape[1]) * int(x.shape[2]))
        int8_serving = (not ctx.train and not ctx.calibrate
                        and ctx.act_scales is not None
                        and quant_key in ctx.act_scales
                        and ctx.spatial_axis is None)
        if int8_serving:
            # int8 post-training-quantized serving: symmetric per-tensor
            # activation scale (calibrated), symmetric per-output-channel
            # weight scale (computed in-graph from the f32 kernel, so the
            # npz weight contract is untouched). The MXU runs int8 at up
            # to 2x the bf16 rate and the int8 operand stream halves HBM
            # traffic; the dequant multiply folds into the following
            # bias/BN affine, and the round/clip/convert of the NEXT
            # layer's quantize fuses into this layer's epilogue, so
            # intermediate activations stay int8-resident between convs
            # (scripts/int8_chain_probe.py measures exactly this pattern).
            ascale = jnp.float32(ctx.act_scales[quant_key])
            kscale = jnp.maximum(
                jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0
            kq = jnp.clip(jnp.round(kernel / kscale), -127,
                          127).astype(jnp.int8)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xq, kq, window_strides=strides,
                padding=padding.upper(), rhs_dilation=dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * (ascale * kscale)
        elif ctx.spatial_axis is not None and kh > 1:
            # Height-sharded path (parallel/spatial.py): exchange row halos
            # with the ring neighbours, then run the height dimension VALID
            # — identical to the global SAME conv (edge shards receive zero
            # halos = SAME zero padding). Supports strided convs (AdapNet's
            # 7x7/s2 stem and downsampling blocks) as long as the stride
            # divides the local block height, so output rows never straddle
            # shard boundaries. When the dilated-kernel reach exceeds the
            # local block (AdapNet's dilation-16 blocks at 1/16 resolution),
            # single-hop ppermute halos can't reach far enough: fall back to
            # a tiled all_gather of the (tiny, deep) feature map, compute
            # the global SAME conv, and keep the local output rows.
            from modular_semantic_segmentation_tpu.parallel.spatial import \
                halo_exchange_rows
            sh, sw = strides
            h_local, w_local = int(x.shape[1]), int(x.shape[2])
            if h_local % sh:
                raise NotImplementedError(
                    "spatial sharding needs stride | local block height")
            kh_d = dilation[0] * (kh - 1) + 1
            kw_d = dilation[1] * (kw - 1) + 1
            # SAME pads over the GLOBAL height (stride divides it, so the
            # total is kh_d - sh), TF/XLA split: extra pad on the trailing
            # side for strided convs
            pad_h = max(kh_d - sh, 0)
            halo_top = pad_h // 2
            halo_bottom = pad_h - halo_top
            pad_w = max(kw_d - sw + (-w_local) % sw, 0)
            pw_lo = pad_w // 2
            r = max(halo_top, halo_bottom)
            if r <= h_local:
                top, bottom = halo_exchange_rows(x, ctx.spatial_axis,
                                                 rows=max(r, 1))
                haloed = jnp.concatenate(
                    [top[:, top.shape[1] - halo_top:], x,
                     bottom[:, :halo_bottom]], axis=1)
                out = jax.lax.conv_general_dilated(
                    haloed.astype(dtype), kernel.astype(dtype),
                    window_strides=strides,
                    padding=[(0, 0), (pw_lo, pad_w - pw_lo)],
                    rhs_dilation=dilation,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=_accum_dtype(dtype))
            else:
                x_full = jax.lax.all_gather(x, ctx.spatial_axis, axis=1,
                                            tiled=True)
                out_full = jax.lax.conv_general_dilated(
                    x_full.astype(dtype), kernel.astype(dtype),
                    window_strides=strides,
                    padding=[(halo_top, halo_bottom),
                             (pw_lo, pad_w - pw_lo)],
                    rhs_dilation=dilation,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=_accum_dtype(dtype))
                out_local = h_local // sh
                start = jax.lax.axis_index(ctx.spatial_axis) * out_local
                out = jax.lax.dynamic_slice_in_dim(out_full, start,
                                                   out_local, axis=1)
        elif (in_ch <= 4 and (kh, kw) == (3, 3) and strides == (1, 1)
              and dilation == (1, 1) and padding.upper() == "SAME"):
            # Thin-input fast path (conv1_1: 3 or 1 input channels).
            # XLA's conv lowering is layout-bound here (~4 TFLOP/s on the
            # v5e, docs/TIMING.md roofline); an explicit im2col matmul
            # [pixels, 9*in] @ [9*in, out] is bandwidth-bound instead —
            # measured 0.32 -> 0.18 ms at 768x384x3->64. Numerically it is
            # the same 9*in_ch-term f32 accumulation (bit-equal in the
            # prototype), and it is plain XLA, so it differentiates.
            xd = x.astype(dtype)
            xp = jnp.pad(xd, ((0, 0), (1, 1), (1, 1), (0, 0)))
            h, w = x.shape[1], x.shape[2]
            patches = jnp.concatenate(
                [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(3)
                 for dx in range(3)], axis=-1)
            kk = kernel.astype(dtype).reshape(9 * in_ch, int(filters))
            out = jnp.einsum("nhwp,pf->nhwf", patches, kk,
                             preferred_element_type=_accum_dtype(dtype))
        elif ((kh, kw) == (1, 1) and strides == (1, 1)
              and dilation == (1, 1)
              and int(x.shape[1]) * int(x.shape[2]) >= 32768):
            # Large-spatial 1x1 conv as a [pixels, Cin] @ [Cin, Cout]
            # matmul: XLA's conv lowering is layout-bound at thin output
            # channels (the class-score conv 64->14 @768x384 measures
            # 0.355 ms conv vs 0.047 matmul forward, 0.823 vs 0.186
            # f+b — scripts/conv_kernel_grad_probe.py sweep). Identical
            # contraction and accumulation dtype; plain XLA, so it
            # differentiates and fuses. Gated to >=32k pixels — at the
            # deep stages (<=96x48) both forms sit at the noise floor.
            xd = x.astype(dtype)
            n, h, w = xd.shape[0], int(xd.shape[1]), int(xd.shape[2])
            out = (xd.reshape(n * h * w, in_ch)
                   @ kernel.astype(dtype).reshape(in_ch, int(filters)))
            out = out.reshape(n, h, w, int(filters))
        elif (ctx.train and strides[0] == strides[1] and strides[0] > 1
              and kh == kw and kh > 1 and dilation == (1, 1)
              and padding.upper() == "SAME"
              and int(x.shape[1]) % strides[0] == 0
              and int(x.shape[2]) % strides[0] == 0
              and in_ch * strides[0] ** 2 >= 128):
            # Training-path strided conv via space-to-depth packing
            # (ops/fast_upsample.strided_conv_packed): the direct lowering's
            # VJPs are pathological on TPU (AdapNet's 7x7/s2 stem: input
            # grad 3.9 ms + kernel grad 1.9 ms vs 0.42 ms forward at
            # 768x384); packed, forward and both gradients are dense
            # stride-1 convs. Eval keeps the direct conv (faster forward).
            from modular_semantic_segmentation_tpu.ops.fast_upsample import \
                strided_conv_packed
            out = strided_conv_packed(x.astype(dtype), kernel.astype(dtype),
                                      strides[0],
                                      accum_dtype=_accum_dtype(dtype))
        elif (ctx.train and strides == (1, 1) and kh == kw and kh > 1
              and kh % 2 == 1 and padding.upper() == "SAME"
              and jnp.issubdtype(dtype, jnp.floating)
              and (in_ch <= TAPS_GRAD_MAX_CH or dilation[0] > 1)):
            # Training-path stride-1 conv with the matmul-decomposed kernel
            # gradient (_conv_taps_grad above): 2.3-4.3x faster kernel
            # grads at the <=256-channel stages and 3x for dilated blocks;
            # at 96x48x512/dil-1 XLA's own VJP is already faster, hence the
            # channel gate (scripts/conv_kernel_grad_probe.py). Eval mode
            # needs no gradients and keeps the plain lowering.
            out = _conv_taps_grad(x.astype(dtype), kernel.astype(dtype),
                                  dilation)
        else:
            out = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype),
                window_strides=strides,
                padding=padding.upper(),
                rhs_dilation=dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=_accum_dtype(dtype))
        if use_bias:
            bias = ctx.get("bias", (int(filters),), initializers.zeros,
                           trainable=trainable)
            out = out + bias
    out = out.astype(dtype)
    if batch_normalization:
        # TF layers BN is created without a trainable flag in the reference
        # (custom_layers.py:132-134), so gamma/beta train even when the conv
        # kernel is frozen — mirror that.
        out = batch_norm(ctx, out, name, trainable=True)
        if activation is not None:
            out = activation(out)
    elif activation is not None:
        out = activation(out)
    return out


def deconv2d(ctx, x, filters, kernel_size, name, strides=1, activation=None,
             use_bias=False, trainable=False, batch_normalization=True,
             padding="same"):
    """Transposed convolution with a frozen bilinear-interpolation kernel.

    The reference always freezes these kernels to bilinear upsampling
    (custom_layers.py:71-121 + simple_fcn.py:80-83); we keep the kernel as a
    real (non-trainable) variable so npz import/export round-trips. Kernel
    layout [H, W, out, in] (TF conv2d_transpose convention).
    """
    kh, kw = _pair(kernel_size)
    strides = _pair(strides)
    in_ch = int(x.shape[-1])
    with ctx.scope(name):
        kernel = ctx.get("kernel", (kh, kw, int(filters), in_ch),
                         initializers.bilinear_filter_initializer,
                         trainable=trainable)
        dtype = ctx.compute_dtype
        spatial = ctx.spatial_axis is not None
        if spatial:
            # Height-sharded: one halo row each side covers the kernel's
            # reach (requires k <= 2*stride, true for the reference's 4/2
            # and 16/8 deconvs); the overlapping stride-wide output strip
            # is trimmed below. SAME alignment is translation-covariant,
            # so local SAME on the haloed block + trim == the global SAME.
            from modular_semantic_segmentation_tpu.parallel.spatial import \
                halo_exchange_rows
            if kh > 2 * strides[0]:
                raise NotImplementedError(
                    "spatial sharding needs deconv kernel <= 2*stride")
            top, bottom = halo_exchange_rows(x, ctx.spatial_axis, rows=1)
            x = jnp.concatenate([top, x, bottom], axis=1)
        # The fast path assumes a channel-diagonal kernel (true for the
        # frozen bilinear initializer). When the kernel is concrete (eager
        # eval / imported npz), verify that before discarding off-diagonal
        # weights; traced kernels keep the fast path (the initializer
        # guarantees diagonality for frozen deconvs).
        def _channel_diagonal(k):
            if isinstance(k, jax.core.Tracer):
                return True
            k_np = np.asarray(k)
            off = k_np.copy()
            off[:, :, np.arange(in_ch), np.arange(in_ch)] = 0.0
            return not np.any(off)

        if (not trainable and int(filters) == in_ch and kh == kw
                and strides[0] == strides[1] and kh % strides[0] == 0
                and padding.upper() == "SAME" and _channel_diagonal(kernel)):
            # Frozen square-channel deconvs are channel-diagonal bilinear
            # kernels (custom_layers.py:8-25); the phase-decomposed 4-tap
            # upsample is exact and ~14x faster than the lhs-dilated conv
            # lowering on TPU (ops/fast_upsample.py).
            from modular_semantic_segmentation_tpu.ops.fast_upsample import \
                diagonal_upsample
            # numpy indices: works whether the kernel is a numpy array or a
            # traced jax array
            idx = np.arange(in_ch)
            diag = kernel[:, :, idx, idx]
            out = diagonal_upsample(x.astype(dtype), diag.astype(dtype),
                                    strides[0])
        elif (kh == kw and strides[0] == strides[1]
                and kh % strides[0] == 0 and padding.upper() == "SAME"):
            # Dense (trainable / non-diagonal) kernels with k % s == 0:
            # phase-decompose into one small forward conv + depth-to-space
            # (ops/fast_upsample.py dense_phase_upsample). AdapNet's
            # trainable 16x16/s8 score deconv drops ~1.8 -> ~0.07 ms on a
            # v5e this way; plain XLA, so the kernel keeps its gradient.
            from modular_semantic_segmentation_tpu.ops.fast_upsample import \
                dense_phase_upsample
            out = dense_phase_upsample(x.astype(dtype),
                                       kernel.astype(dtype), strides[0],
                                       accum_dtype=_accum_dtype(dtype))
        else:
            # TF conv2d_transpose == gradient of a forward conv wrt its
            # input; lax.conv_transpose(transpose_kernel=True) implements
            # exactly that (spatial flip + I/O swap), with SAME giving
            # out = in * stride. The [H, W, out, in] kernel is the forward
            # conv's HWIO.
            out = jax.lax.conv_transpose(
                x.astype(dtype), kernel.astype(dtype),
                strides=strides, padding=padding.upper(),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
                preferred_element_type=_accum_dtype(dtype))
        if spatial:
            out = out[:, strides[0]:out.shape[1] - strides[0]]
        if use_bias:
            bias = ctx.get("bias", (int(filters),), initializers.zeros,
                           trainable=trainable)
            out = out + bias
    out = out.astype(dtype)
    if batch_normalization:
        # BN params always trainable, as in the reference (see conv2d).
        out = batch_norm(ctx, out, name, trainable=True)
        if activation is not None:
            out = activation(out)
    elif activation is not None:
        out = activation(out)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _maxpool_nonoverlap(sh, sw, x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, sh, sw, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID")


def _maxpool_nonoverlap_fwd(sh, sw, x):
    out = _maxpool_nonoverlap(sh, sw, x)
    return out, (x, out)


def _maxpool_nonoverlap_bwd(sh, sw, res, ct):
    # Mask-based gradient: XLA's SelectAndScatter lowering of the
    # reduce_window-max VJP costs ~2.0 ms for ONE 2x2/s2 pool at
    # 768x384x64 on a v5e — more than the surrounding convs. For
    # non-overlapping windows the gradient is elementwise: route the
    # cotangent to the FIRST (row-major) maximum of each window, exactly
    # SelectAndScatter's tie rule (locked by
    # tests/test_ops.py::test_max_pool_gradient_matches_reduce_window).
    x, out = res
    n, h, w, c = x.shape
    hp, wp = h // sh, w // sw
    # phase slices + stacks keep the channel axis minor throughout (6-D
    # transposes with size-2 inner dims measured ~10x the HBM bound)
    xr = x.reshape(n, hp, sh, wp, sw, c)
    zero = jnp.zeros((), x.dtype)
    taken = jnp.zeros((n, hp, wp, c), bool)
    rows = []
    for dy in range(sh):
        cols = []
        for dx in range(sw):
            m = (xr[:, :, dy, :, dx, :] == out) & ~taken
            taken = taken | m
            cols.append(jnp.where(m, ct, zero))
        rows.append(jnp.stack(cols, axis=3))       # [n, hp, wp, sw, c]
    g = jnp.stack(rows, axis=2)                    # [n, hp, sh, wp, sw, c]
    return (g.reshape(n, h, w, c).astype(x.dtype),)


_maxpool_nonoverlap.defvjp(_maxpool_nonoverlap_fwd, _maxpool_nonoverlap_bwd)


def max_pool2d(ctx, x, pool_size, strides, name=None, padding="VALID",
               custom_grad=False):
    """Max pooling (TF layers default VALID padding).

    ``custom_grad=True`` uses the mask-based gradient
    (``_maxpool_nonoverlap_bwd``) for non-overlapping float pools.
    Measured IN CONTEXT on the v5e it cuts AdapNet's train step (single
    pool, 13.99 -> 13.2 ms) but REGRESSES SimpleFCN's (five pools,
    14.0 -> 17.8 ms): the custom_vjp boundary blocks XLA from fusing the
    pool gradient into the surrounding conv backward chain, and with five
    pools the lost fusion outweighs the 2x faster isolated op. Off by
    default; AdapNet's stem pool opts in.
    """
    ph, pw = _pair(pool_size)
    sh, sw = _pair(strides)
    if (custom_grad and (ph, pw) == (sh, sw) and padding.upper() == "VALID"
            and jnp.issubdtype(x.dtype, jnp.floating)
            and int(x.shape[1]) % sh == 0 and int(x.shape[2]) % sw == 0):
        return _maxpool_nonoverlap(sh, sw, x)
    # -inf identity keeps reduce_window on the recognized max-monoid path
    # (required for reverse-mode autodiff).
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x, neg_inf, jax.lax.max,
        window_dimensions=(1, ph, pw, 1),
        window_strides=(1, sh, sw, 1),
        padding=padding)


def dropout(ctx, x, rate, name=None, training=True, noise_shape=None):
    """TF-style dropout: zero with prob ``rate``, scale kept by 1/(1-rate).

    The reference's MC-dropout models run dropout with training=True even at
    test time (simple_fcn.py:52, variance_mix.py:55); callers control that via
    the ``training`` flag, independent of ctx.train. ``noise_shape``
    broadcasts the mask (e.g. whole-pixel dropout with channel dim 1,
    uncertainty_dirichlet_mix.py:120-128).
    """
    if not training or rate == 0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(ctx.next_rng(), keep,
                                noise_shape if noise_shape else x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def adap_conv(ctx, x, adapter_inputs, filters, kernel_size, name="adap_conv",
              extra_convolution=True, initial_scales=(1, 0.1),
              initialize_half_zero=False, trainable=True,
              activation=jax.nn.relu, **conv_kwargs):
    """Progressive-networks adapter block (arXiv 1606.04671 eq. 2).

    Per-column trainable scales -> optional 1x1 adapter conv -> concat with
    the current column -> combination conv. Reference
    custom_layers.py:142-219.
    """
    with ctx.scope(name):
        with ctx.scope("adapter"):
            scale = ctx.get("scale", (len(adapter_inputs),),
                            initializers.selection(list(initial_scales)),
                            trainable=trainable)
            scaled = jnp.concatenate(
                [scale[i] * adapter_inputs[i]
                 for i in range(len(adapter_inputs))], axis=-1)
            if extra_convolution:
                adapter = conv2d(ctx, scaled, int(x.shape[-1]), (1, 1),
                                 name="adapter", trainable=trainable,
                                 activation=activation)
            else:
                adapter = scaled
        together = jnp.concatenate([x, adapter], axis=-1)
        kernel_init = (initializers.half_zeros() if initialize_half_zero
                       else None)
        out = conv2d(ctx, together, filters, kernel_size, name="combination",
                     trainable=trainable, activation=activation,
                     kernel_initializer=kernel_init, **conv_kwargs)
    return out


def log_softmax(x, axis=-1):
    """Numerically-stable log-softmax (reference custom_layers.py:222-236)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    d = x - m
    return d - jnp.log(jnp.sum(jnp.exp(d), axis=axis, keepdims=True))


def softmax(x, temperature=1.0, axis=-1):
    """Temperature-scaled softmax (reference custom_layers.py:239-248)."""
    scaled = x / temperature
    m = jnp.max(scaled, axis=axis, keepdims=True)
    e = jnp.exp(scaled - m)
    return e / jnp.sum(e, axis=axis, keepdims=True)


def entropy(x, axis=-1):
    """Entropy normalized by log(num classes) (custom_layers.py:251-256)."""
    h = -jnp.sum(x * jnp.log(jnp.clip(x, 1e-10, 1.0)), axis=axis)
    return h / jnp.log(float(x.shape[axis]))


def max_pool_with_argmax(x, pool_size=2, strides=2):
    """Max pool returning TF-convention flattened argmax indices
    (index into the flattened [H*W*C] per-batch-item tensor)."""
    n, h, w, c = x.shape
    flat_idx = (jnp.arange(h * w).reshape(1, h, w, 1) * c +
                jnp.arange(c).reshape(1, 1, 1, c))
    flat_idx = jnp.broadcast_to(flat_idx, x.shape)

    def reducer(a, b):
        av, ai = a
        bv, bi = b
        take_b = bv > av
        return jnp.where(take_b, bv, av), jnp.where(take_b, bi, ai)

    neg_inf = jnp.finfo(x.dtype).min
    pooled, idx = jax.lax.reduce_window(
        (x, flat_idx), (neg_inf, jnp.int32(0)), reducer,
        window_dimensions=(1, pool_size, pool_size, 1),
        window_strides=(1, strides, strides, 1), padding="VALID")
    return pooled, idx


def unpool_2d(pool, ind, stride=2):
    """Scatter-based max unpooling (reference custom_layers.py:259-301).

    Args:
        pool: pooled tensor [N, H, W, C].
        ind: flattened argmax indices as from :func:`max_pool_with_argmax`.
        stride: upsampling factor.
    """
    n, h, w, c = pool.shape
    out_flat = jnp.zeros((n, h * stride * w * stride * c), pool.dtype)
    pool_flat = pool.reshape(n, -1)
    ind_flat = ind.reshape(n, -1)
    out_flat = jax.vmap(lambda o, i, p: o.at[i].set(p))(
        out_flat, ind_flat, pool_flat)
    return out_flat.reshape(n, h * stride, w * stride, c)
