"""Probe: block-diagonal packing of the two experts' lane-starved head.

The TIMING.md roofline shows the fused-Bayes serving floor loses most of
its headroom in the 64-channel conv1 stack (conv1_2 runs at 38 TFLOP/s —
half the 128 vector lanes idle), and every *within-expert* repacking has
been measured and rejected (space-to-depth, W-pair packing, grouped
convs, Pallas). This probe tries the remaining cross-expert idea: the rgb
and depth experts run the SAME topology on the same spatial grid, so
their conv1_1..conv2_1 stacks can execute as ONE dense conv stack at
2x the channel width with BLOCK-DIAGONAL kernels:

    [ W_rgb   0    ]
    [ 0     W_depth]

Unlike `feature_group_count=2` (measured 9x slower — the grouped-conv
lowering) this is a plain dense conv XLA tiles normally; the zero blocks
cost 2x FLOPs, but at 64 channels the MXU runs at <20% peak from lane
starvation, so doubling the width should buy ~2.6x rate for 2x work.
The pack stops after conv2_1: its 256-wide output splits on a 128-lane
tile boundary (no relayout), and from conv2_2 on the per-expert stacks
already run at >=50% peak where 2x FLOP inflation loses.

Numerics: adding zero products is exact in any float format; only the
contraction tiling (reduction order over 2x-wide K) can perturb bf16/f32
partial sums, which the probe bounds.

Run on the TPU:  python scripts/expert_pack_probe.py
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


def _relu_bias(x, b):
    return jax.nn.relu(x + b)


def _conv(x, k, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), window_strides=(1, 1),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _im2col9(x, dtype):
    """3x3 SAME patches: [n,h,w,9*c] (ops/layers.py thin-input path)."""
    xd = x.astype(dtype)
    xp = jnp.pad(xd, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    return jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(3)
         for dx in range(3)], axis=-1)


def _pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def separate_head(xr, xd, p, dtype):
    """Current model path: two independent expert heads -> two 128-ch maps."""
    outs = []
    for x, pre in ((xr, "rgb"), (xd, "depth")):
        cin = x.shape[-1]
        patches = _im2col9(x, dtype)
        k11 = p[f"{pre}/k11"].astype(dtype).reshape(9 * cin, 64)
        c11 = _relu_bias(jnp.einsum("nhwp,pf->nhwf", patches, k11,
                                    preferred_element_type=jnp.float32)
                         .astype(dtype), p[f"{pre}/b11"].astype(dtype))
        c12 = _relu_bias(_conv(c11, p[f"{pre}/k12"], dtype).astype(dtype),
                         p[f"{pre}/b12"].astype(dtype))
        pl1 = _pool(c12)
        c21 = _relu_bias(_conv(pl1, p[f"{pre}/k21"], dtype).astype(dtype),
                         p[f"{pre}/b21"].astype(dtype))
        outs.append(c21)
    return tuple(outs)


def _block_diag(ka, kb):
    """[kh,kw,ia,oa] + [kh,kw,ib,ob] -> [kh,kw,ia+ib,oa+ob] block-diagonal."""
    kh, kw, ia, oa = ka.shape
    _, _, ib, ob = kb.shape
    out = jnp.zeros((kh, kw, ia + ib, oa + ob), ka.dtype)
    return out.at[:, :, :ia, :oa].set(ka).at[:, :, ia:, oa:].set(kb)


def packed_head(xr, xd, p, dtype):
    """Block-diagonal combined head -> the SAME two 128-ch maps."""
    # conv1_1: concat the two experts' im2col streams -> one matmul.
    # K = 27+9 = 36 rows, block-diagonal into 128 output channels.
    pr, pd = _im2col9(xr, dtype), _im2col9(xd, dtype)
    patches = jnp.concatenate([pr, pd], axis=-1)
    cr, cd = xr.shape[-1], xd.shape[-1]
    k11 = jnp.zeros((9 * (cr + cd), 128), dtype)
    k11 = k11.at[:9 * cr, :64].set(
        p["rgb/k11"].astype(dtype).reshape(9 * cr, 64))
    k11 = k11.at[9 * cr:, 64:].set(
        p["depth/k11"].astype(dtype).reshape(9 * cd, 64))
    b11 = jnp.concatenate([p["rgb/b11"], p["depth/b11"]]).astype(dtype)
    c11 = _relu_bias(jnp.einsum("nhwp,pf->nhwf", patches, k11,
                                preferred_element_type=jnp.float32)
                     .astype(dtype), b11)
    # conv1_2: dense 128x128 block-diagonal (the lane-fill win)
    k12 = _block_diag(p["rgb/k12"], p["depth/k12"]).astype(dtype)
    b12 = jnp.concatenate([p["rgb/b12"], p["depth/b12"]]).astype(dtype)
    c12 = _relu_bias(_conv(c11, k12, dtype).astype(dtype), b12)
    pl1 = _pool(c12)
    # conv2_1: dense 128x256 block-diagonal; 256 output splits lane-aligned
    k21 = _block_diag(p["rgb/k21"], p["depth/k21"]).astype(dtype)
    b21 = jnp.concatenate([p["rgb/b21"], p["depth/b21"]]).astype(dtype)
    c21 = _relu_bias(_conv(pl1, k21, dtype).astype(dtype), b21)
    return c21[..., :128], c21[..., 128:]


def make_params(rng):
    p = {}
    for pre, cin in (("rgb", 3), ("depth", 1)):
        p[f"{pre}/k11"] = rng.randn(3, 3, cin, 64).astype(np.float32) * 0.1
        p[f"{pre}/b11"] = rng.randn(64).astype(np.float32) * 0.01
        p[f"{pre}/k12"] = rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05
        p[f"{pre}/b12"] = rng.randn(64).astype(np.float32) * 0.01
        p[f"{pre}/k21"] = rng.randn(3, 3, 64, 128).astype(np.float32) * 0.05
        p[f"{pre}/b21"] = rng.randn(128).astype(np.float32) * 0.01
    return p


def main():
    rng = np.random.RandomState(0)
    xr = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
    xd = jnp.asarray(rng.rand(1, H, W, 1).astype(np.float32))
    p = {k: jnp.asarray(v) for k, v in make_params(rng).items()}

    # numerics at f32 (precision=highest: the default TPU f32 conv runs
    # bf16 MXU passes whose tiling differs between the two forms — that
    # noise would mask the exactness claim being tested)
    with jax.default_matmul_precision("highest"):
        sep = jax.jit(functools.partial(separate_head, dtype=jnp.float32))(
            xr, xd, p)
        pak = jax.jit(functools.partial(packed_head, dtype=jnp.float32))(
            xr, xd, p)
    for i, name in enumerate(("rgb", "depth")):
        a, b = np.asarray(sep[i]), np.asarray(pak[i])
        err = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-9)
        print(f"{name}: rel max err f32 = {err:.2e}")
        assert err < 1e-5, "block-diagonal packing is not numerically exact"

    for dtype in (jnp.bfloat16, jnp.float32):
        t_sep = device_time_fn(
            jax.jit(functools.partial(separate_head, dtype=dtype)),
            xr, xd, p, iters=30)
        t_pak = device_time_fn(
            jax.jit(functools.partial(packed_head, dtype=dtype)),
            xr, xd, p, iters=30)
        print(f"{np.dtype(dtype).name}: separate {t_sep * 1e3:.3f} ms, "
              f"packed {t_pak * 1e3:.3f} ms, "
              f"speedup {t_sep / t_pak:.2f}x")

    # per-layer attribution: conv1_2 alone (the predicted win)
    c11r = jnp.asarray(rng.rand(1, H, W, 64).astype(np.float32))
    c11d = jnp.asarray(rng.rand(1, H, W, 64).astype(np.float32))
    c11c = jnp.concatenate([c11r, c11d], axis=-1)

    def sep12(a, b, kr, kd):
        return (_conv(a, kr, jnp.bfloat16), _conv(b, kd, jnp.bfloat16))

    def pak12(x, kr, kd):
        return _conv(x, _block_diag(kr, kd), jnp.bfloat16)

    t_s = device_time_fn(jax.jit(sep12), c11r, c11d, p["rgb/k12"],
                         p["depth/k12"], iters=30)
    t_p = device_time_fn(jax.jit(pak12), c11c, p["rgb/k12"],
                         p["depth/k12"], iters=30)
    print(f"conv1_2 layer only (bf16): separate {t_s * 1e3:.3f} ms, "
          f"block-diag {t_p * 1e3:.3f} ms, {t_s / t_p:.2f}x")


if __name__ == "__main__":
    main()
