"""Pallas TPU kernel for the fused Dirichlet posterior.

Computes, per pixel, the fused classification

    argmax_c [ sum_e ( log(eps + p_e) @ (sigma * alpha_e - 1) )[c]
               - log B(sigma * alpha_e)[c] + log prior[c] ]

in ONE pass over the pixels: the log / matmul / bias / argmax all happen in
VMEM, so the [pixels, C] per-class score tensor never round-trips through
HBM (the XLA path materializes it). The contraction
[tile, K] @ [K, C] runs on the MXU.

Expert probability tensors arrive stacked [E, P, K]; K and C are padded to
the 128-lane register width inside the kernel block specs.

Reference semantics: xview/models/dirichlet_mix.py:14-36 (see
ops/fusion_math.py for the XLA formulation this must match — equivalence is
tested in tests/test_pallas_kernels.py).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from scipy.special import gammaln  # host-side constant precomputation

LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(probs_ref, alpha_ref, bias_ref, out_ref, *, num_classes,
            num_experts):
    """probs_ref: [E, T, Kp]; alpha_ref: [E, Kp, Cp] (sigma*alpha - 1,
    zero-padded); bias_ref: [1, Cp] (log prior - sum_e log B, -inf padded);
    out_ref: [T, 1] int32 labels."""
    total = bias_ref[:]  # [1, Cp], broadcasts over the tile
    acc = jnp.zeros((probs_ref.shape[1], bias_ref.shape[1]), jnp.float32)
    for e in range(num_experts):
        log_p = jnp.log(1e-20 + probs_ref[e].astype(jnp.float32))
        acc = acc + jnp.dot(log_p, alpha_ref[e].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    scores = acc + total
    out_ref[:] = jnp.argmax(scores, axis=-1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _run(probs, alpha_pad, bias_pad, tile=2048, interpret=False):
    e, p, kp = probs.shape
    cp = bias_pad.shape[1]
    grid = (p // tile,)
    return pl.pallas_call(
        functools.partial(_kernel, num_classes=cp, num_experts=e),
        out_shape=jax.ShapeDtypeStruct((p, 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((e, tile, kp), lambda i: (0, i, 0)),
            pl.BlockSpec((e, kp, cp), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, cp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        interpret=interpret,
    )(probs, alpha_pad, bias_pad)


def dirichlet_fusion_label(probs, alphas, prior, sigma=1.0, tile=2048,
                           interpret=False):
    """Fused Dirichlet classification (argmax of the fused score).

    Args:
        probs: list (per expert) of [..., K] softmax probabilities.
        alphas: list (per expert) of [K, C] concentrations.
        prior: [C] class prior.
    Returns:
        int32 label array of shape probs[0].shape[:-1].
    """
    num_classes = probs[0].shape[-1]
    c = np.asarray(alphas[0]).shape[1]
    batch_shape = probs[0].shape[:-1]
    pixels = int(np.prod(batch_shape))

    kp = _round_up(num_classes, LANE)
    cp = _round_up(c, LANE)
    pp = _round_up(pixels, tile)

    stacked = jnp.stack([p.reshape(-1, num_classes) for p in probs])
    # pad: probability padding of 1.0 makes log zero; alpha padding of 0
    # zeroes the contribution anyway
    stacked = jnp.pad(stacked, ((0, 0), (0, pp - pixels),
                                (0, kp - num_classes)),
                      constant_values=1.0)

    alpha_pad = np.zeros((len(alphas), kp, cp), np.float32)
    bias = np.full((1, cp), -np.inf, np.float32)
    bias[0, :c] = np.log(1e-20 + np.asarray(prior, np.float64))
    for e, a in enumerate(alphas):
        a = np.asarray(a, np.float64) * sigma
        alpha_pad[e, :num_classes, :c] = a - 1.0
        log_beta = gammaln(a).sum(0) - gammaln(a.sum(0))
        bias[0, :c] -= np.asarray(log_beta, np.float32)

    labels = _run(stacked, jnp.asarray(alpha_pad), jnp.asarray(bias),
                  tile=tile, interpret=interpret)
    return labels[:pixels, 0].reshape(batch_shape)
