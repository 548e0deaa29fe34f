"""Host-side Dirichlet maximum-a-posteriori estimation.

Fits per-class Dirichlet concentration parameters from sufficient statistics
(mean log expert probabilities). This is the EM tail of the Dirichlet fusion
fit: a tiny K-dimensional problem solved on the host in float64 while the
device handles the statistic reduction.

The estimator replicates the algorithm the reference actually uses
(xview/models/dirichletDifferentiation.py:129-192, a penalized variant of
Max Sklar's / Minka's Newton solver): objective

    L(a) = (1-beta) * [gammaln(sum a) - sum gammaln(a)] + <a, ss>
           - delta * |a|^2 - beta * <a, neg_ss>

maximized by (1) a Newton step using the structured Hessian
(diag + rank-one, Minka eq. 18), (2) a log-space Newton step fallback, and
(3) gradient ascent with learning-rate backoff — in that order per
iteration, with the same tolerances, so fitted parameters match the
reference's. Vectorized NumPy throughout (the reference loops in pure
Python).

Also provides Minka fixed-point / mean-precision alternatives
(reference xview/models/dirichlet_fastfit.py) kept callable for the same
configs the reference exposes (dirichlet_mix.py:6-9).
"""

import numpy as np
from scipy import special

GRADIENT_TOL_SQ = 2.0 ** -20
LEARN_RATE_TOL = 2.0 ** -10


def _objective(alphas, ss, neg_ss, beta, delta):
    a_sum = alphas.sum()
    val = (1 - beta) * special.gammaln(a_sum)
    val -= (1 - beta) * special.gammaln(alphas).sum()
    val += float(np.dot(alphas, ss))
    val -= delta * float(np.square(alphas).sum())
    val -= beta * float(np.dot(alphas, neg_ss))
    return val


def _gradient(alphas, ss, neg_ss, beta, delta):
    return ((1 - beta) * special.psi(alphas.sum())
            + ss
            - (1 - beta) * special.psi(alphas)
            - 2 * delta * alphas
            - beta * neg_ss)


def _loss(alphas, ss, neg_ss, beta, delta):
    if np.any(alphas <= 0):
        return np.inf
    return -_objective(alphas, ss, neg_ss, beta, delta)


def _newton_step(alphas, gradient, beta):
    """Minka eq. 18 step for the diag + rank-one Hessian."""
    h_const = -(1 - beta) * special.polygamma(1, alphas.sum())
    h_diag = (1 - beta) * special.polygamma(1, alphas)
    b = (gradient / h_diag).sum() / (1.0 / h_const + (1.0 / h_diag).sum())
    return (b - gradient) / h_diag


def _log_space_step(alphas, gradient, beta):
    """Newton step on log-alpha (diagonal Hessian in log space)."""
    h_const = -(1 - beta) * special.polygamma(1, alphas.sum())
    h_diag = (1 - beta) * special.polygamma(1, alphas)
    denom = gradient - alphas * h_diag
    z = h_const * (alphas / denom).sum()
    s = ((1.0 / denom) / (1 + z)).sum()
    return gradient / denom * (1 - h_const * alphas * s)


def find_dirichlet_priors(ss, neg_ss, init_alphas, max_iter=1000, delta=1e-2,
                          beta=1e-2, verbose=False):
    """Penalized Dirichlet MAP from sufficient statistics.

    Args:
        ss: [K] mean log probabilities of the positive class examples.
        neg_ss: [K] mean log probabilities of the negative examples
            (contrastive regularizer, weighted by beta).
        init_alphas: [K] initial concentrations (the reference uses ones).
        delta: L2 penalty weight on the concentrations.
        beta: weight of the negative-statistic contrast.
    Returns:
        [K] float64 fitted concentrations.
    """
    ss = np.asarray(ss, np.float64)
    neg_ss = np.asarray(neg_ss, np.float64)
    priors = np.array(init_alphas, np.float64, copy=True)
    current_loss = _loss(priors, ss, neg_ss, beta, delta)

    for _ in range(max_iter):
        gradient = _gradient(priors, ss, neg_ss, beta, delta)
        if float(np.square(gradient).sum()) < GRADIENT_TOL_SQ:
            if verbose:
                print("Converged with small gradient")
            return priors

        # 1) full Newton step
        with np.errstate(over="raise", invalid="raise"):
            try:
                trial = priors + _newton_step(priors, gradient, beta)
                loss = _loss(trial, ss, neg_ss, beta, delta)
                if loss < current_loss:
                    current_loss, priors = loss, trial
                    continue
            except FloatingPointError:
                pass

            # 2) log-space Newton step
            try:
                trial = priors * np.exp(_log_space_step(priors, gradient,
                                                        beta))
                loss = _loss(trial, ss, neg_ss, beta, delta)
            except FloatingPointError:
                if verbose:
                    print("overflow in log-space step, returning")
                return priors

        # 3) gradient ascent with learn-rate backoff until improvement
        loss = np.inf
        learn_rate = 1.0
        while loss > current_loss:
            learn_rate *= 0.9
            trial = priors + gradient * learn_rate
            loss = _loss(trial, ss, neg_ss, beta, delta)
        if learn_rate < LEARN_RATE_TOL:
            if verbose:
                print("Converged with small learn rate")
            return priors
        current_loss, priors = loss, trial

    if verbose:
        print("Reached max iterations")
    return priors


# --------------------------------------------------------------------------
# Minka fastfit alternatives (reference xview/models/dirichlet_fastfit.py),
# kept callable for the alternate-estimator configs.
# --------------------------------------------------------------------------

def _ipsi(y, tol=1.48e-9, maxiter=10):
    """Inverse digamma via Newton (Minka appendix C)."""
    y = np.asarray(y, np.float64)
    x = np.where(y >= -2.22, np.exp(y) + 0.5, -1.0 / (y - special.psi(1)))
    for _ in range(maxiter):
        x = x - (special.psi(x) - y) / special.polygamma(1, x)
    return x


def fixedpoint_with_sufficient_statistic(ss, n_obs, num_classes, init_alphas,
                                         maxiter=10000, tol=1e-7, delta=0.0):
    """Minka fixed-point iteration a_k <- ipsi(psi(sum a) + ss_k), with an
    optional delta shrinkage on the statistic."""
    ss = np.asarray(ss, np.float64) - delta
    a = np.array(init_alphas, np.float64, copy=True)
    for _ in range(maxiter):
        a_new = _ipsi(special.psi(a.sum()) + ss)
        if np.abs(a_new - a).max() < tol:
            return a_new
        a = a_new
    return a


def meanprecision_with_sufficient_statistic(ss, n_obs, num_classes,
                                            init_alphas, maxiter=10000,
                                            tol=1e-7, delta=0.0):
    """Minka mean/precision alternating updates from sufficient statistics."""
    ss = np.asarray(ss, np.float64) - delta
    a = np.array(init_alphas, np.float64, copy=True)
    for _ in range(maxiter):
        s0 = a.sum()
        m = a / s0
        # update precision s with fixed mean (Minka eq. 28 area, one Newton
        # step on log s)
        g = special.psi(s0) - np.dot(m, special.psi(s0 * m)) + np.dot(m, ss)
        h = special.polygamma(1, s0) - np.dot(
            np.square(m), special.polygamma(1, s0 * m))
        step = g / (g / s0 + h * s0) if (g / s0 + h * s0) != 0 else 0.0
        s1 = s0 * np.exp(step) if np.isfinite(step) else s0
        # update mean with fixed precision via fixed point
        m_new = _ipsi(ss + np.dot(m, special.psi(s1 * m) - ss))
        m_new = m_new / m_new.sum()
        a_new = s1 * m_new
        if np.abs(a_new - a).max() < tol:
            return a_new
        a = a_new
    return a


def dirichlet_mle_from_samples(samples, maxiter=1000, tol=1e-9):
    """Plain Dirichlet MLE from probability samples (for tests/diagnostics)."""
    samples = np.asarray(samples, np.float64)
    ss = np.log(samples).mean(0)
    a = np.ones(samples.shape[1])
    for _ in range(maxiter):
        a_new = _ipsi(special.psi(a.sum()) + ss)
        if np.abs(a_new - a).max() < tol:
            return a_new
        a = a_new
    return a
