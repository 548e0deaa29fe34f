"""Exact fast path for the frozen bilinear transposed convolutions.

The reference's deconvolutions are always FROZEN bilinear-interpolation
kernels, diagonal over channels (custom_layers.py:71-121). Lowered as a
dense lhs-dilated convolution, the 16x16/stride-8 decoder deconv runs ~3 ms
per expert on a v5e at 768x384 — yet mathematically each output pixel is a
(k/s)^2-tap (4-tap for k=2s) interpolation of the low-res feature map.

This module phase-decomposes the transposed conv: for output phase (p, q)
within each s x s block, the contributing kernel taps and input offsets are
fixed, so upsampling becomes one small einsum over 4 shifted copies of the
input — ~14x faster, bit-identical to lax.conv_transpose(SAME,
transpose_kernel=True) for diagonal kernels (validated in
tests/test_fast_upsample.py against tf.nn.conv2d_transpose).
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


def _same_pad_lo(kernel, stride):
    """Leading pad of the equivalent lhs-dilated conv for conv_transpose
    SAME padding with k % s == 0 (out = in * s): the total dilated-conv
    pad is 2*(k-1) - (k-s), split with the EXTRA going to the leading
    side (TF/XLA convention), i.e. pad_lo = k - 1 - (k - s) // 2."""
    return kernel - 1 - (kernel - stride) // 2


@lru_cache(maxsize=None)
def _phase_tables(k, s):
    """Per-phase tap weights index tables.

    Returns (offsets, tap_index) where
        offsets: sorted list of input offsets o used by any phase,
        tap_index: int array [s, taps] of kernel indices i per phase, and
        offset_pos: int array [s, taps] position of each tap's offset in
            ``offsets``.
    """
    pad_lo = _same_pad_lo(k, s)
    taps = k // s
    tap_index = np.zeros((s, taps), np.int64)
    tap_offset = np.zeros((s, taps), np.int64)
    for p in range(s):
        i0 = (pad_lo - p) % s
        for a in range(taps):
            i = i0 + a * s
            tap_index[p, a] = i if i < k else -1
            tap_offset[p, a] = (p + i - pad_lo) // s if i < k else 0
    offsets = sorted(set(tap_offset[tap_index >= 0].tolist()) | {0})
    offset_pos = np.searchsorted(offsets, tap_offset)
    return tuple(offsets), tap_index, offset_pos


@lru_cache(maxsize=None)
def _selection_tensor(k, s):
    """Static selection tensor M[p, o, i]: 1 when output phase p uses
    kernel tap i with input offset o (per axis)."""
    offsets, tap_index, offset_pos = _phase_tables(k, s)
    n_off = len(offsets)
    taps = k // s
    m = np.zeros((s, n_off, k), np.float32)
    for p in range(s):
        for a in range(taps):
            i = tap_index[p, a]
            if i >= 0:
                m[p, offset_pos[p, a], i] = 1.0
    return offsets, m


def diagonal_upsample(x, diag_kernel, stride):
    """Transposed-conv upsampling with a channel-diagonal kernel.

    Args:
        x: [N, H, W, C] input.
        diag_kernel: [k, k, C] — the per-channel 2-D kernels (the diagonal
            of the dense [k, k, C, C] transposed-conv kernel). May be a
            traced array.
        stride: upsampling factor s; requires k % s == 0.
    Returns:
        [N, H*s, W*s, C], equal to lax.conv_transpose(x, dense_kernel,
        (s, s), 'SAME', transpose_kernel=True) when the dense kernel is
        diagonal.
    """
    k = int(diag_kernel.shape[0])
    s = int(stride)
    assert k % s == 0, "fast path needs kernel size divisible by stride"
    n, h, w, c = x.shape
    offsets, m = _selection_tensor(k, s)

    # correlation semantics: the conv_transpose kernel is spatially flipped
    kern = diag_kernel[::-1, ::-1, :].astype(jnp.float32)
    mj = jnp.asarray(m)
    # weight table W[p, q, oy, ox, C] from the static selection tensor
    weights = jnp.einsum("pyi,qxj,ijc->pqyxc", mj, mj, kern).astype(x.dtype)

    lo = -min(offsets)
    hi = max(offsets)
    xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    shifted = jnp.stack(
        [jnp.stack([xp[:, oy + lo:oy + lo + h, ox + lo:ox + lo + w, :]
                    for ox in offsets], axis=0)
         for oy in offsets], axis=0)  # [Oy, Ox, N, H, W, C]

    out = jnp.einsum("pqyxc,yxnhwc->nhpwqc", weights, shifted,
                     preferred_element_type=jnp.float32)
    return out.reshape(n, h * s, w * s, c).astype(x.dtype)


@lru_cache(maxsize=None)
def _dense_selection(k, s):
    """Selection tensor over a CONTIGUOUS offset window.

    Returns (lo, hi, M) where M[p, o + lo, i] = 1 when output phase p uses
    kernel tap i with input offset o; the window spans offsets
    [-lo, hi] so the decomposition can run as one (lo+hi+1)-wide forward
    convolution over the padded input.
    """
    offsets, tap_index, offset_pos = _phase_tables(k, s)
    lo, hi = -min(offsets), max(offsets)
    taps = tap_index.shape[1]
    m = np.zeros((s, lo + hi + 1, k), np.float32)
    for p in range(s):
        for a in range(taps):
            i = tap_index[p, a]
            if i >= 0:
                m[p, offsets[offset_pos[p, a]] + lo, i] = 1.0
    return lo, hi, m


@lru_cache(maxsize=None)
def _pack_selection(k, s):
    """Selection tensor for space-to-depth packing of a stride-s conv.

    A SAME stride-s conv (s | H) pads (k-s)//2 leading; output row i, tap u
    reads input row s*i + u - pad_lo = s*(i + t) + d with u = s*t + d +
    pad_lo, i.e. packed-phase d at packed tap offset t. Returns
    (taps, pad_lo_p, pad_hi_p, M) with M[t, d, u] = 1 for valid triples;
    the packed conv runs VALID over an input padded by (pad_lo_p, pad_hi_p).
    """
    pad_lo = (k - s) // 2
    t_min = -(-(-(s - 1) - pad_lo) // s)   # ceil((-(s-1) - pad_lo) / s)
    t_max = (k - 1 - pad_lo) // s
    taps = t_max - t_min + 1
    m = np.zeros((taps, s, k), np.float32)
    for t in range(t_min, t_max + 1):
        for d in range(s):
            u = s * t + d + pad_lo
            if 0 <= u < k:
                m[t - t_min, d, u] = 1.0
    return taps, -t_min, t_max, m


def strided_conv_packed(x, kernel, stride, accum_dtype=jnp.float32):
    """SAME stride-s conv as a space-to-depth packed stride-1 conv.

    The TRAINING-path formulation for strided convs (AdapNet's 7x7/s2
    stem): the direct lowering's forward is fine (~0.42 ms at 768x384x64
    on a v5e) but its VJPs are not — the input gradient is an lhs-dilated
    transposed conv (3.9 ms) and the kernel gradient a huge-window conv
    (1.9 ms), 18.6x the forward combined. Packing input parity phases into
    channels turns forward AND both backward ops into dense stride-1 convs
    (the pack/unpack transposes are bandwidth-bound reshapes, and the
    kernel repack is a tiny einsum that differentiates back to the stored
    [k, k, ci, co] npz layout). Exact up to f32 summation order; only the
    k -> s*ceil(k/s) zero-tap inflation (64/49 for 7/2) is paid.

    Requires s | H and s | W (the reference's 16-multiple crop guarantees
    it). Forward-only serving keeps the direct conv: the packed forward
    alone measured 0.82 vs 0.66 ms (scripts/stem_pack_probe.py) — the win
    is in the gradients.
    """
    k = int(kernel.shape[0])
    s = int(stride)
    n, h, w, cin = x.shape
    cout = int(kernel.shape[3])
    assert h % s == 0 and w % s == 0, "packed path needs s | H and s | W"
    taps, plo, phi, m = _pack_selection(k, s)
    mj = jnp.asarray(m)

    kern = kernel.astype(jnp.float32)
    # PK[ty, tx, (dy, dx, ci), co]: packed tap (ty, tx), phase (dy, dx)
    pk = jnp.einsum("adu,bev,uvio->abdeio", mj, mj, kern)
    pk = pk.reshape(taps, taps, s * s * cin, cout).astype(x.dtype)

    # space-to-depth: [N, H, W, C] -> [N, H/s, W/s, s*s*C], (dy, dx, c)
    xp = x.reshape(n, h // s, s, w // s, s, cin)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // s, w // s,
                                                s * s * cin)
    xp = jnp.pad(xp, ((0, 0), (plo, phi), (plo, phi), (0, 0)))
    # NOTE: wrapping this conv in a taps-kernel-grad custom_vjp (the
    # ops/layers._conv_taps_grad formulation) was measured and REJECTED:
    # the isolated kernel grad wins 3.2x (1.01 -> 0.32 ms) but the full
    # AdapNet train step REGRESSES 13.0 -> 13.8 ms — the custom_vjp
    # boundary pins the padded space-to-depth buffer as a residual and
    # blocks the pack/pad fusion into the backward chain (docs/TIMING.md).
    return jax.lax.conv_general_dilated(
        xp, pk, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype)


def dense_phase_upsample(x, kernel, stride, accum_dtype=jnp.float32):
    """Transposed-conv upsampling for DENSE (e.g. trainable) kernels.

    Phase decomposition of ``lax.conv_transpose(x, kernel, (s, s), 'SAME',
    transpose_kernel=True)``: each output phase (p, q) within an s x s
    block reads a fixed (k/s)^2-tap neighbourhood of the input, so the
    whole upsample is ONE small forward convolution producing all s*s*C_out
    phase channels, followed by a depth-to-space interleave. The direct
    lhs-dilated lowering of AdapNet's trainable 16x16/stride-8 score
    deconv runs ~1.8 ms at 768x384 on a v5e (~2 TFLOP/s); this form is a
    dense MXU conv (~25x faster), exact up to f32 summation order, and
    plain XLA so it differentiates (the deconv kernels stay trainable).

    Args:
        x: [N, H, W, C_in] input.
        kernel: [k, k, C_out, C_in] transposed-conv kernel (TF
            conv2d_transpose layout, the npz contract).
        stride: upsampling factor s; requires k % s == 0.
    Returns:
        [N, H*s, W*s, C_out].
    """
    k = int(kernel.shape[0])
    s = int(stride)
    assert k % s == 0, "fast path needs kernel size divisible by stride"
    n, h, w, cin = x.shape
    cout = int(kernel.shape[2])
    lo, hi, m = _dense_selection(k, s)
    n_off = lo + hi + 1

    # correlation semantics: the conv_transpose kernel is spatially flipped
    kern = kernel[::-1, ::-1, :, :].astype(jnp.float32)
    mj = jnp.asarray(m)
    # conv kernel CK[oy, ox, c_in, (p, q, c_out)]: tap (oy, ox) of the
    # window contributes kernel tap (i, j) to output phase (p, q)
    ck = jnp.einsum("pyi,qxj,ijoc->yxcpqo", mj, mj, kern)
    ck = ck.reshape(n_off, n_off, cin, s * s * cout).astype(x.dtype)

    xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    out = jax.lax.conv_general_dilated(
        xp, ck, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype)
    # depth-to-space: [N, H, W, s, s, C] -> [N, H*s, W*s, C]
    out = out.reshape(n, h, w, s, s, cout).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(n, h * s, w * s, cout).astype(x.dtype)
