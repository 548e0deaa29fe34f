"""Statistical fusion math — the paper's core contribution, as fused
per-pixel device kernels.

Every fusion combines per-pixel expert outputs with statistics fitted on a
held-out measure set; none needs joint gradient training.

    * Bayes (reference xview/models/bayes_mix.py:12-58): fused log-score =
      sum_e log p(expert out | true class) + log prior, where the likelihood
      is the column-normalized confusion matrix. Plus the K^E decision-matrix
      lookup fast path (bayes_mix.py:61-112).
    * Dirichlet (reference xview/models/dirichlet_mix.py:14-36): per (expert,
      class) a Dirichlet over the expert's softmax simplex; the per-pixel
      log-likelihood is a [pixels, K] @ [K, C] contraction — it runs on the
      MXU (see also ops/pallas/dirichlet_kernel.py).
    * Variance (reference xview/models/variance_mix.py:7-15): inverse-variance
      weighting of MC-dropout expert probabilities.

All functions are jit-able jnp code operating on stacked expert axes.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


# The reference hardcodes a uniform prior of 1/14 (14 synthia classes)
# regardless of the actual class count — bayes_mix.py:42,95 and
# dirichlet_mix.py:116. We reproduce that for metric parity.
REFERENCE_UNIFORM_PRIOR = 1.0 / 14


def class_prior(spec, data_prior, uniform_value=REFERENCE_UNIFORM_PRIOR):
    """Resolve a prior spec into a prior vector/scalar.

    spec: 'data' | 'uniform' | float x -> x * uniform + (1-x) * data,
    renormalized (reference bayes_mix.py:41-54).
    """
    data_prior = np.asarray(data_prior, np.float64)
    if isinstance(spec, str):
        if spec == "uniform":
            return np.full_like(data_prior, uniform_value)
        if spec == "data":
            return data_prior
        raise ValueError(f"unknown class prior '{spec}'")
    weight = float(spec)
    prior = weight * uniform_value + (1 - weight) * data_prior
    return prior / prior.sum()


def confusion_to_conditional(confusion_matrix):
    """p(expert output | true class): column-normalize, NaNs -> 0.

    NOTE the caller feeds the TRANSPOSED confusion matrix, as the reference
    model does (bayes_mix.py:141: ``matrix.astype('float32').T``)."""
    cm = np.asarray(confusion_matrix, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        cond = np.nan_to_num(cm / cm.sum(0))
    return cond


def bayes_fusion(classifications, confusion_matrices, class_prior_spec="data"):
    """Bayes fusion of hard expert classifications.

    Args:
        classifications: list (per expert) of int arrays [...].
        confusion_matrices: list of [K, K] arrays (transposed convention, see
            :func:`confusion_to_conditional`).
        class_prior_spec: 'data' | 'uniform' | float.
    Returns:
        (fused_score [..., K], log_likelihoods list, conditionals list)
    """
    log_likelihoods = []
    conditionals = []
    for cls, cm in zip(classifications, confusion_matrices):
        cond = confusion_to_conditional(cm)
        # Row selection as a one-hot contraction instead of cond[cls]:
        # row gathers lower to a slow scatter/gather loop on TPU (~1.5
        # ms/frame at 768x384) while the [pixels, K] @ [K, K] form runs on
        # the MXU (~0.1 ms). Mathematically identical — one_hot rows are
        # exact 0/1 selectors. (The reference needed the same trick on GPU
        # for gather_nd, timing.py:86-128.)
        onehot = jax.nn.one_hot(cls, cond.shape[0], dtype=jnp.float32)
        log_cond = jnp.asarray(np.log(1e-20 + cond), jnp.float32)
        conditionals.append(onehot @ jnp.asarray(cond, jnp.float32))
        log_likelihoods.append(onehot @ log_cond)

    data_prior = _data_prior_from_cm(confusion_matrices[-1])
    prior = class_prior(class_prior_spec, data_prior)
    fused = (jnp.sum(jnp.stack(log_likelihoods, axis=0), axis=0)
             + jnp.log(jnp.asarray(prior, jnp.float32)))
    return fused, log_likelihoods, conditionals


def _data_prior_from_cm(confusion_matrix):
    cm = np.asarray(confusion_matrix, np.float64)
    return cm.sum(0) / cm.sum()


def bayes_decision_matrix(confusion_matrices, class_prior_spec="data"):
    """Precompute the fused decision for all K^E expert-output combinations.

    Host-side NumPy; result is a [K] * E int lookup table
    (reference bayes_mix.py:61-112).
    """
    num_classes = confusion_matrices[0].shape[0]
    num_experts = len(confusion_matrices)
    conds = [confusion_to_conditional(cm) for cm in confusion_matrices]

    # log-likelihood cube: [K^E combos, K classes], built by broadcasting
    # each expert's conditional along its own combo axis.
    total = np.zeros([num_classes] * num_experts + [num_classes], np.float64)
    for e, cond in enumerate(conds):
        shape = [1] * num_experts + [num_classes]
        shape[e] = num_classes
        total = total + np.log(1e-20 + cond).reshape(shape)

    prior = class_prior(class_prior_spec,
                        _data_prior_from_cm(confusion_matrices[-1]))
    total = total + np.log(prior)
    return np.argmax(total, axis=-1).astype(np.int32)


def apply_decision_matrix(decision_matrix, classifications):
    """Fused classification by lookup: table[c_1, ..., c_E] per pixel.

    The lookup is a one-hot contraction over the K^E flat table — exact
    (0/1 selectors of small integers) and MXU-resident, where the direct
    flat[idx] gather lowers to a slow scatter loop on TPU (the same trick
    the reference needed for gather_nd on GPU, timing.py:86-128)."""
    table = jnp.asarray(decision_matrix)
    num_classes = table.shape[0]
    flat = table.reshape(-1).astype(jnp.float32)
    idx = classifications[0]
    for cls in classifications[1:]:
        idx = idx * num_classes + cls
    onehot = jax.nn.one_hot(idx, flat.shape[0], dtype=jnp.float32)
    return (onehot @ flat).astype(jnp.int32)


def dirichlet_log_likelihoods(probs, alphas, sigma=1.0):
    """Per-pixel log Dir(p; sigma * alpha_c) for every conditioning class c.

    Args:
        probs: [..., K] expert softmax probabilities.
        alphas: [K, C] Dirichlet concentrations — column c is the Dirichlet
            over the K-simplex conditional on true class c (the reference's
            ``dirichlet_params[m][:, c]``, dirichlet_mix.py:109-113).
        sigma: temperature scaling of the concentrations.
    Returns:
        [..., C] log-likelihood per conditioning class.
    """
    alphas = jnp.asarray(alphas, jnp.float32) * sigma
    log_p = jnp.log(1e-20 + probs.astype(jnp.float32))
    # log B(a) = sum_k gammaln(a_k) - gammaln(sum_k a_k), per column.
    log_beta = jnp.sum(gammaln(alphas), axis=0) - gammaln(
        jnp.sum(alphas, axis=0))
    # The contraction [pixels, K] @ [K, C] is the hot op — MXU-friendly.
    return log_p @ (alphas - 1.0) - log_beta


def dirichlet_fusion(probs, alphas, prior, sigma=1.0):
    """Fused Dirichlet log-score (reference dirichlet_mix.py:14-36).

    Args:
        probs: list (per expert) of [..., K] probabilities.
        alphas: list (per expert) of [K, C] concentration matrices.
        prior: [C] class prior.
    Returns:
        fused score [..., C].
    """
    lls = [dirichlet_log_likelihoods(p, a, sigma)
           for p, a in zip(probs, alphas)]
    fused = jnp.sum(jnp.stack(lls, axis=0), axis=0)
    return fused + jnp.log(1e-20 + jnp.asarray(prior, jnp.float32))


def dirichlet_uncertainty_fusion(probs, alphas, uncertainties, prior,
                                 sigma=1.0):
    """Dirichlet fusion with per-pixel uncertainty blending toward an
    uninformative Dirichlet (reference uncertainty_dirichlet_mix.py:18-52).

    Args:
        uncertainties: list (per expert) of [...] in [0, 1]; 1 = fully
            uncertain -> parameters blended to the uninformative I + 1.
    """
    num_classes = probs[0].shape[-1]
    uninformative = jnp.eye(num_classes, dtype=jnp.float32) + 1.0
    lls = []
    for p, a, mix in zip(probs, alphas, uncertainties):
        a = jnp.asarray(a, jnp.float32) * sigma
        u = uninformative * sigma
        m = jnp.clip(mix.astype(jnp.float32), 0.0, 1.0)[..., None]  # [..., 1]
        log_p = jnp.log(1e-20 + p.astype(jnp.float32))
        # The per-pixel concentration is alpha_px = (1-m)*a + m*u, shape
        # [..., K, C] (reference uncertainty_dirichlet_mix.py:33-36), and the
        # log-pdf is sum_k (alpha_px_k - 1) log p_k - log B(alpha_px). The
        # linear term is linear in alpha_px, so it splits into two MXU
        # matmuls blended per pixel; only the nonlinear normalizer
        # log B(alpha_px) needs the materialized per-pixel gammaln.
        linear = ((1.0 - m) * (log_p @ a) + m * (log_p @ u)
                  - jnp.sum(log_p, axis=-1, keepdims=True))
        alpha_px = (1.0 - m[..., None]) * a + m[..., None] * u
        log_beta = (jnp.sum(gammaln(alpha_px), axis=-2)
                    - gammaln((1.0 - m) * jnp.sum(a, axis=0)
                              + m * jnp.sum(u, axis=0)))
        lls.append(linear - log_beta)
    fused = jnp.sum(jnp.stack(lls, axis=0), axis=0)
    return fused + jnp.log(1e-20 + jnp.asarray(prior, jnp.float32))


def variance_fusion(probs, variances):
    """Inverse-variance weighting (reference variance_mix.py:7-15).

    Args:
        probs: [E, ..., K] stacked expert probabilities.
        variances: [E, ..., 1] per-pixel MC-dropout variances.
    """
    certainties = 1.0 / (1e-20 + variances)
    return (jnp.sum(certainties * probs, axis=0) /
            jnp.sum(certainties, axis=0))


def dirichlet_sufficient_statistics(probs, labels, num_classes, eps=1e-10):
    """Per-true-class sums of log expert probabilities, on device.

    For class c: ss[c, k] = sum over pixels with label c of log(eps + p_k).
    Computed as a one-hot contraction [C, pixels] @ [pixels, K] (MXU) instead
    of the reference's C-way tf.where stack (dirichlet_mix.py:141-168).

    Returns:
        (ss [C, K], class_counts [C])
    """
    flat_p = probs.reshape(-1, probs.shape[-1]).astype(jnp.float32)
    flat_l = labels.reshape(-1).astype(jnp.int32)
    onehot = (flat_l[:, None] == jnp.arange(num_classes)[None, :]).astype(
        jnp.float32)
    ss = onehot.T @ jnp.log(eps + flat_p)
    class_counts = jnp.sum(onehot, axis=0)
    return ss, class_counts
