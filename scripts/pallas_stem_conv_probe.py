"""Pallas CHW stem conv: a hand kernel that beats XLA 1.75x at C=64.

The roofline (docs/TIMING.md round 2) shows the 64-channel stem convs
running at 19-38% of peak because NHWC puts the 64 channels in the
128-wide lane dimension (half the lanes idle) — and every XLA-level
repacking (space-to-depth, W-pairing, grouped convs, cross-expert
block-diagonal) either inflates FLOPs 2x with zero blocks or hits a bad
lowering. The one untried layout is CHW-with-W-in-lanes, which XLA's
NHWC conv lowering cannot produce but a Pallas kernel can:

  * image rows padded to L=400 lanes (1 left pad + 384 real + 15
    right; 4% column waste keeps 8-row output blocks exactly 25 lane
    tiles) and flattened to [C=64, rows*L] — W in LANES, C in sublanes;
  * all 9 conv taps are STATIC UNALIGNED LANE SLICES of the flattened
    block (tap (dy,dx) = slice at offset (dy+1)*L + 1 + dx): no rolls,
    no masks (pad lanes are zero; junk outputs at pad columns are
    sliced away by the caller);
  * 9 accumulated [64,64]@[64,3200] MXU matmuls (default), or one
    K=576 matmul from a VMEM-staged im2col scratch (MSSTPU_TAPS=0);
  * bias + relu fused, f32 accumulate, bf16 out.

Measured on the v5e (conv1_2 shape 768x384, 64->64, bf16):

    XLA NHWC conv+bias+relu      0.578 ms   (38 TFLOP/s)
    Pallas kernel-only           0.331 ms   (66 TFLOP/s, 1.75x)
    Pallas end-to-end NHWC io    0.810 ms   (relayouts cost 0.48)
    K=576 scratch-patches        0.346 ms   (staging offsets deeper K)
    tile-aligned taps, L=512     0.375 ms   (33% junk N > rotate cost)

Environment Mosaic constraints found while building this (each crashes
the remote tpu_compile_helper with HTTP 500): pltpu.roll (any shift),
stride-2 lane slicing (x[:, ::2]), lane-pair reshape
([64,n]->[64,n/2,2]), and sublane-concat of unaligned-lane-offset
vectors. Static unaligned lane slices and unaligned stores DO work —
this kernel is built entirely from them.

Verdict (round 5): the kernel wins isolated, but harvesting it
in-model requires the WHOLE stem (conv1_1 -> conv1_2 -> pool1 ->
conv2_1) to live in lane-rows layout — pool1's W-pairing needs the
crashing strided-lane ops (forcing an XLA interlude), per-block halo
recompute costs ~12%, and the NHWC formats at entry/exit cost
~0.15-0.2 ms — projecting only ~0.2-0.25 ms net on the bf16 floor and
~0 on the int8 path (the packed stem already runs int8 there). After
the phase-form decoder rejection showed isolated 2.3x wins inverting
to -0.8 ms in-model, that projection does not clear the integration
bar. NOT integrated; the kernel stays here as a measured reference.

Run on the TPU: python scripts/pallas_stem_conv_probe.py
(CPU correctness check: MSSTPU_INTERPRET=1 python scripts/...)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

INTERPRET = bool(os.environ.get("MSSTPU_INTERPRET"))
TAPS_VARIANT = bool(os.environ.get("MSSTPU_TAPS"))
if INTERPRET:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modular_semantic_segmentation_tpu.utils.profiling import device_time_fn

ROWS = int(os.environ.get("MSSTPU_ROWS", "8"))  # output rows per grid step
L = int(os.environ.get("MSSTPU_L", "400"))      # padded row lanes
BLK_IN = ((ROWS + 2) * L + 2 + 127) // 128 * 128  # input block lanes
ALIGNED = bool(os.environ.get("MSSTPU_ALIGNED"))  # stage dx rotations once


def _kernel(x_ref, w_ref, b_ref, out_ref, *scratch):
    """x_ref [1, Cin, BLK_IN]; w [Cout, 9*Cin]; b [Cout, 1];
    out [Cout, ROWS*L]; scratch: [patches?] + [left, right]? per flags."""
    cin = x_ref.shape[1]
    n = out_ref.shape[1]
    scratch = list(scratch)
    patches_ref = None if TAPS_VARIANT else scratch.pop(0)
    if ALIGNED:
        # stage the two dx rotations ONCE (one unaligned copy each);
        # with 128 | L every tap slice below is tile-aligned
        left_ref, right_ref = scratch
        m = (ROWS + 2) * L
        left_ref[:, :m] = x_ref[0, :, 0:m]
        right_ref[:, :m] = x_ref[0, :, 2:m + 2]
        taps = []
        for ky in range(3):
            for dx in (-1, 0, 1):
                if dx == 0:
                    taps.append(x_ref[0, :, ky * L + 1:ky * L + 1 + n])
                elif dx == -1:
                    taps.append(left_ref[:, ky * L:ky * L + n])
                else:
                    taps.append(right_ref[:, ky * L:ky * L + n])
    else:
        taps = []
        for ky in range(3):
            for dx in (-1, 0, 1):
                start = ky * L + 1 + dx
                taps.append(x_ref[0, :, start:start + n])
    if TAPS_VARIANT:
        acc = jnp.zeros((out_ref.shape[0], n), jnp.float32)
        for t, tap in enumerate(taps):
            acc = acc + jax.lax.dot_general(
                w_ref[:, t * cin:(t + 1) * cin], tap,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    else:
        # stage the im2col patches through VMEM scratch: a direct
        # sublane-concat of 9 unaligned-lane-offset vectors is
        # unsupported in Mosaic (tpu.concatenate layout crash); stores
        # normalize each tap's layout, then ONE K=576 matmul
        for t, tap in enumerate(taps):
            patches_ref[t * cin:(t + 1) * cin, :] = tap
        acc = jax.lax.dot_general(
            w_ref[:], patches_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] = jax.nn.relu(acc + b_ref[:]).astype(out_ref.dtype)


def conv3x3_rowlanes(blocks, wmat, bias, n_blocks, cin, cout):
    return pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, cin, BLK_IN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 9 * cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cout, ROWS * L), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, n_blocks * ROWS * L),
                                       jnp.bfloat16),
        scratch_shapes=(
            ([] if TAPS_VARIANT
             else [pltpu.VMEM((9 * cin, ROWS * L), jnp.bfloat16)])
            + ([pltpu.VMEM((cin, (ROWS + 2) * L), jnp.bfloat16)] * 2
               if ALIGNED else [])),
        interpret=INTERPRET,
    )(blocks, wmat, bias)


def format_input(x):
    """NHWC [1, H, W, C] -> stacked haloed lane-row blocks."""
    _, h, w, cin = x.shape
    xc = x[0].transpose(2, 0, 1)                          # [C, H, W]
    xp = jnp.pad(xc, ((0, 0), (1, 1), (1, L - 1 - w)))     # [C, H+2, L]
    x2d = xp.reshape(cin, (h + 2) * L)
    n_blocks = h // ROWS
    pad_to = (n_blocks - 1) * ROWS * L + BLK_IN
    x2d = jnp.pad(x2d, ((0, 0), (0, max(0, pad_to - x2d.shape[1]))))
    blocks = jnp.stack([
        jax.lax.dynamic_slice_in_dim(x2d, i * ROWS * L, BLK_IN, axis=1)
        for i in range(n_blocks)])
    return blocks.astype(jnp.bfloat16), n_blocks


def extract_output(out2d, h, w, cout):
    """[Cout, n_blocks*ROWS*L] -> NHWC [1, H, W, Cout]."""
    out = out2d.reshape(cout, h, L)[:, :, :w]
    return out.transpose(1, 2, 0)[None]


def pallas_conv_nhwc(x, kernel, bias):
    _, h, w, cin = x.shape
    cout = kernel.shape[3]
    blocks, n_blocks = format_input(x)
    wmat = kernel.transpose(3, 0, 1, 2).reshape(cout, 9 * cin)
    out2d = conv3x3_rowlanes(blocks, wmat.astype(jnp.bfloat16),
                             bias.reshape(cout, 1).astype(jnp.float32),
                             n_blocks, cin, cout)
    return extract_output(out2d, h, w, cout)


def xla_conv_nhwc(x, kernel, bias):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16), (1, 1),
        "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)
    return jax.nn.relu(out + bias)


def main():
    h, w, cin, cout = (64, 384, 64, 64) if INTERPRET else (768, 384, 64, 64)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, h, w, cin).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)

    want = np.asarray(xla_conv_nhwc(x, kernel, bias), np.float32)
    got = np.asarray(pallas_conv_nhwc(x, kernel, bias), np.float32)
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    print(f"max rel err vs XLA conv: {err:.2e} (scale {scale:.2f}) "
          f"variant={'taps' if TAPS_VARIANT else 'patches'}")
    assert err < 2e-2, "pallas kernel disagrees with XLA conv"
    if INTERPRET:
        print("interpret-mode correctness OK")
        return

    print("devices:", jax.devices(), file=sys.stderr)
    xb = x.astype(jnp.bfloat16)
    kb = kernel.astype(jnp.bfloat16)

    t = device_time_fn(xla_conv_nhwc, xb, kb, bias, iters=40, n2=160,
                       repetitions=6)
    print(f"XLA NHWC conv+bias+relu        {t * 1e3:6.3f} ms")

    t = device_time_fn(pallas_conv_nhwc, xb, kb, bias, iters=40, n2=160,
                       repetitions=6)
    print(f"Pallas end-to-end (NHWC io)    {t * 1e3:6.3f} ms")

    blocks, n_blocks = format_input(xb)
    blocks = jax.device_put(blocks)
    wmat = jax.device_put(
        kb.transpose(3, 0, 1, 2).reshape(cout, 9 * cin))
    b2 = jax.device_put(bias.reshape(cout, 1))
    run = functools.partial(conv3x3_rowlanes, n_blocks=n_blocks,
                            cin=cin, cout=cout)
    t = device_time_fn(run, blocks, wmat, b2, iters=40, n2=160,
                       repetitions=6)
    gflops = 2 * 9 * cin * cout * h * w / 1e9
    print(f"Pallas kernel-only             {t * 1e3:6.3f} ms "
          f"({gflops / t / 1e3:.0f} TFLOP/s effective)")


if __name__ == "__main__":
    main()
