"""Probe: the kernel-gradient of stride-1 3x3 convs at batch 1.

scripts/fcn_train_probe.py shows SimpleFCN's backward running at 4-5x the
forward per stage; the input-gradient of a stride-1 SAME conv is just a
mirrored conv (same cost as forward), so the excess must be the KERNEL
gradient — XLA lowers it at batch 1 as a conv whose spatial dims become
the contraction (a [3,3,Cin,Cout] result contracted over all pixels).
This measures each VJP component in isolation and tests an im2col
reformulation: kernel_grad = patches[pixels, 9*Cin].T @ cotangent[pixels,
Cout] — one tall matmul on the MXU.

Run: python scripts/conv_kernel_grad_probe.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import modular_semantic_segmentation_tpu  # noqa: E402,F401  (platform cfg)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from modular_semantic_segmentation_tpu.utils.profiling import (  # noqa: E402
    device_time_fn)

DTYPE = jnp.bfloat16


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def kernel_grad_im2col(x, ct, kh=3, kw=3):
    """d(conv)/d(kernel) as one im2col matmul.

    patches[p, kh*kw*Cin].T @ ct[p, Cout] -> [kh*kw*Cin, Cout]; the
    patch extraction is shifted whole-array slices of the SAME-padded
    input (free reshapes + cheap copies), the contraction runs on the MXU
    with the full pixel count as the K dimension.
    """
    n, h, w, cin = x.shape
    cout = ct.shape[-1]
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    taps = [xp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(kh) for dx in range(kw)]
    patches = jnp.stack(taps, axis=3)            # [n, h, w, kh*kw, cin]
    patches = patches.reshape(n * h * w, kh * kw * cin)
    g = jnp.einsum("pk,pc->kc", patches, ct.reshape(n * h * w, cout),
                   preferred_element_type=jnp.float32)
    return g.reshape(kh, kw, cin, cout)


def main():
    rng = np.random.RandomState(0)
    for (h, w, cin, cout) in [(768, 384, 64, 64), (384, 192, 128, 128),
                              (192, 96, 256, 256), (96, 48, 512, 512)]:
        x = jnp.asarray(rng.rand(1, h, w, cin), DTYPE)
        k = jnp.asarray(rng.rand(3, 3, cin, cout) * 0.1, DTYPE)
        ct = jnp.asarray(rng.rand(1, h, w, cout), DTYPE)

        fwd = jax.jit(conv)
        t_fwd = device_time_fn(fwd, x, k, iters=8, repetitions=3)

        in_grad = jax.jit(lambda x, k, ct: jax.vjp(
            lambda x: conv(x, k), x)[1](ct)[0])
        t_in = device_time_fn(in_grad, x, k, ct, iters=8, repetitions=3)

        k_grad = jax.jit(lambda x, k, ct: jax.vjp(
            lambda k: conv(x, k), k)[1](ct)[0])
        t_k = device_time_fn(k_grad, x, k, ct, iters=8, repetitions=3)

        k_grad2 = jax.jit(kernel_grad_im2col)
        t_k2 = device_time_fn(k_grad2, x, ct, iters=8, repetitions=3)

        # numerics: im2col vs XLA VJP (f32 accumulation both sides)
        ref = np.asarray(k_grad(x, k, ct), np.float32)
        got = np.asarray(k_grad2(x, ct), np.float32)
        rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)

        flops = 2 * h * w * cin * cout * 9
        print(f"{h}x{w}x{cin}->{cout}: fwd {t_fwd*1e3:.3f} ms "
              f"({flops/t_fwd/1e12:.0f} TF/s) | in-grad {t_in*1e3:.3f} | "
              f"k-grad {t_k*1e3:.3f} ({flops/t_k/1e12:.0f} TF/s) | "
              f"k-grad im2col {t_k2*1e3:.3f} ({flops/t_k2/1e12:.0f} TF/s) "
              f"| rel err {rel:.2e}")


if __name__ == "__main__":
    main()
