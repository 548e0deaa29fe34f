"""Probe: AdapNet stem under cross-expert packing — REJECTED.

After cross-expert packing won 1.17x on the SimpleFCN stems
(models/packed_experts.py), the natural follow-up is AdapNet's stem
(block_0_1 3x3 3->64 + block_0_2 7x7/s2 64->64 + pool — 1.04 ms/expert,
the 7x7 at 56 TFLOP/s, docs/TIMING.md AdapNet section). Measured on the
v5e (1x768x384, loop-difference device timer, bf16):

  adapnet stem two-experts separate 1.747 ms, packed 1.632 ms -> 1.07x
  7x7/s2 64->64 pair vs 128->128 block-diag: 1.214 vs 1.370 ms -> 0.89x
  strided im2col for the 7x7/s2 (3-in variant): 4.6 ms vs 0.35 -> 0.08x

Why it fails where the FCN stem wins: block-diagonal packing trades Ex
FLOP inflation for lane occupancy, which only pays while the conv is
lane-starved. The 7x7 kernel's K = 49*64 = 3136-deep contraction
already feeds the MXU well at 64 channels — doubling the width adds 2x
FLOPs at only ~1.8x the rate. The whole 1.07x stack gain comes from the
thin 3x3 (im2col concat) and the merged pool — ~0.1 ms/frame, under the
~1.3x in-model-survival bar this repo's probe history established, on a
model family where int8 is also neutral. AdapNet keeps per-expert
stems; SimpleFCN keeps the packed ones.

The strided-im2col idea (generalizing the conv1_1 fast path to 7x7/s2)
is also dead: stride-2 slices force relayouts that cost 13x the conv.

Run on the TPU:  python scripts/adapnet_stem_probe.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import modular_semantic_segmentation_tpu  # noqa: F401  platform setup
import jax
import jax.numpy as jnp
import numpy as np

from modular_semantic_segmentation_tpu.utils.profiling import device_time_fn

H, W = 768, 384


def _conv(x, k, s, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), window_strides=(s, s),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)


def _pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def _block_diag(ka, kb):
    kh, kw, ia, oa = ka.shape
    _, _, ib, ob = kb.shape
    z = jnp.zeros((kh, kw, ia + ib, oa + ob), jnp.float32)
    return z.at[:, :, :ia, :oa].set(ka).at[:, :, ia:, oa:].set(kb)


def _im2col3(x, k, dtype):
    cin = x.shape[-1]
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    patches = jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(3)
         for dx in range(3)], axis=-1)
    return jnp.einsum("nhwp,pf->nhwf", patches,
                      k.astype(dtype).reshape(9 * cin, k.shape[-1]),
                      preferred_element_type=dtype)


def sep_stem(xr, xd, p, dtype):
    """Two per-expert AdapNet stems (block_0_1 + block_0_2 + pool)."""
    outs = []
    for x, m in ((xr, "r"), (xd, "d")):
        c1 = jax.nn.relu(_im2col3(x, p[m + "k1"], dtype))
        c2 = jax.nn.relu(_conv(c1, p[m + "k2"], 2, dtype))
        outs.append(_pool(c2))
    return tuple(outs)


def pack_stem(xr, xd, p, dtype):
    """Block-diagonally packed stems (the packed_experts.py recipe)."""
    pr = jnp.pad(xr.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    pd = jnp.pad(xd.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.concatenate(
        [pr[:, dy:dy + H, dx:dx + W, :] for dy in range(3)
         for dx in range(3)] +
        [pd[:, dy:dy + H, dx:dx + W, :] for dy in range(3)
         for dx in range(3)], axis=-1)
    k1 = jnp.zeros((9 * 4, 128), jnp.float32)
    k1 = k1.at[:27, :64].set(p["rk1"].reshape(27, 64))
    k1 = k1.at[27:, 64:].set(p["dk1"].reshape(9, 64))
    c1 = jax.nn.relu(jnp.einsum("nhwp,pf->nhwf", patches,
                                k1.astype(dtype),
                                preferred_element_type=dtype))
    c2 = jax.nn.relu(_conv(c1, _block_diag(p["rk2"], p["dk2"]), 2, dtype))
    pl = _pool(c2)
    return pl[..., :64], pl[..., 64:]


def main():
    rng = np.random.RandomState(0)
    xr = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
    xd = jnp.asarray(rng.rand(1, H, W, 1).astype(np.float32))
    p = {"rk1": rng.randn(3, 3, 3, 64).astype(np.float32) * 0.05,
         "dk1": rng.randn(3, 3, 1, 64).astype(np.float32) * 0.05,
         "rk2": rng.randn(7, 7, 64, 64).astype(np.float32) * 0.02,
         "dk2": rng.randn(7, 7, 64, 64).astype(np.float32) * 0.02}
    p = {k: jnp.asarray(v) for k, v in p.items()}
    dtype = jnp.bfloat16

    t_sep = device_time_fn(
        jax.jit(functools.partial(sep_stem, dtype=dtype)), xr, xd, p,
        iters=30)
    t_pack = device_time_fn(
        jax.jit(functools.partial(pack_stem, dtype=dtype)), xr, xd, p,
        iters=30)
    print(f"adapnet stem two-experts separate {t_sep * 1e3:.3f} ms, "
          f"packed {t_pack * 1e3:.3f} ms, {t_sep / t_pack:.2f}x")

    # isolate the 7x7/s2: 2x 64->64 vs one 128->128 block-diagonal
    c1r = jnp.asarray(rng.rand(1, H, W, 64).astype(np.float32))
    c1d = jnp.asarray(rng.rand(1, H, W, 64).astype(np.float32))
    c1c = jnp.concatenate([c1r, c1d], axis=-1)

    def sep7(a, b, ka, kb):
        return _conv(a, ka, 2, dtype), _conv(b, kb, 2, dtype)

    def pack7(x, ka, kb):
        return _conv(x, _block_diag(ka, kb), 2, dtype)

    t7s = device_time_fn(jax.jit(sep7), c1r, c1d, p["rk2"], p["dk2"],
                         iters=30)
    t7p = device_time_fn(jax.jit(pack7), c1c, p["rk2"], p["dk2"], iters=30)
    print(f"7x7/s2 only: separate {t7s * 1e3:.3f} ms, block-diag "
          f"{t7p * 1e3:.3f} ms, {t7s / t7p:.2f}x")


if __name__ == "__main__":
    main()
