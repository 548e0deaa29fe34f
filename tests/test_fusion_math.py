"""Fusion math vs NumPy/scipy oracles (SURVEY.md §4 tier 1)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import dirichlet as sp_dirichlet

from modular_semantic_segmentation_tpu.ops import fusion_math as fm
from modular_semantic_segmentation_tpu.ops import dirichlet_estimation as de


def _random_cm(rng, k):
    return rng.randint(0, 50, (k, k)).astype(np.float64) + 1


def test_bayes_fusion_oracle():
    rng = np.random.RandomState(0)
    k, shape = 4, (2, 3, 3)
    cms = [_random_cm(rng, k), _random_cm(rng, k)]
    cls = [rng.randint(0, k, shape) for _ in range(2)]
    fused, _, _ = fm.bayes_fusion([jnp.asarray(c) for c in cls], cms, "data")
    fused = np.asarray(fused)

    conds = [np.nan_to_num(cm / cm.sum(0)) for cm in cms]
    prior = cms[-1].sum(0) / cms[-1].sum()
    expect = sum(np.log(1e-20 + cond[c]) for cond, c in zip(conds, cls)) \
        + np.log(prior)
    np.testing.assert_allclose(fused, expect, rtol=1e-4, atol=1e-5)


def test_bayes_decision_matrix_consistent_with_fusion():
    rng = np.random.RandomState(1)
    k = 5
    cms = [_random_cm(rng, k), _random_cm(rng, k)]
    table = fm.bayes_decision_matrix(cms, "data")
    assert table.shape == (k, k)
    cls = [rng.randint(0, k, (7, 6)) for _ in range(2)]
    fused, _, _ = fm.bayes_fusion([jnp.asarray(c) for c in cls], cms, "data")
    direct = np.argmax(np.asarray(fused), axis=-1)
    lookup = np.asarray(fm.apply_decision_matrix(
        table, [jnp.asarray(c) for c in cls]))
    np.testing.assert_array_equal(direct, lookup)


@pytest.mark.parametrize("spec", ["data", "uniform", 0.3])
def test_class_prior_specs(spec):
    data_prior = np.array([0.1, 0.2, 0.7])
    prior = fm.class_prior(spec, data_prior)
    if spec == "data":
        np.testing.assert_allclose(prior, data_prior)
    elif spec == "uniform":
        np.testing.assert_allclose(prior, fm.REFERENCE_UNIFORM_PRIOR)
    else:
        raw = 0.3 * fm.REFERENCE_UNIFORM_PRIOR + 0.7 * data_prior
        np.testing.assert_allclose(prior, raw / raw.sum())


def test_dirichlet_log_likelihood_matches_scipy():
    rng = np.random.RandomState(2)
    k, c = 4, 4
    alphas = rng.rand(k, c) * 5 + 0.5
    probs = rng.dirichlet(np.ones(k), size=(2, 3))
    got = np.asarray(fm.dirichlet_log_likelihoods(
        jnp.asarray(probs, jnp.float32), alphas, sigma=1.0))
    for i in range(2):
        for j in range(3):
            for cc in range(c):
                # scipy needs exact simplex; our kernel evaluates the same
                # density formula at (1e-20 + p)
                expect = sp_dirichlet.logpdf(
                    probs[i, j] / probs[i, j].sum(), alphas[:, cc])
                np.testing.assert_allclose(got[i, j, cc], expect, rtol=1e-4,
                                           atol=1e-3)


def test_dirichlet_fusion_shape_and_prior():
    rng = np.random.RandomState(3)
    k = 3
    probs = [jnp.asarray(rng.dirichlet(np.ones(k), size=(2, 4)),
                         jnp.float32) for _ in range(2)]
    alphas = [rng.rand(k, k) * 3 + 0.5 for _ in range(2)]
    prior = np.array([0.2, 0.3, 0.5])
    fused = np.asarray(fm.dirichlet_fusion(probs, alphas, prior, sigma=2.0))
    assert fused.shape == (2, 4, k)
    single = [np.asarray(fm.dirichlet_log_likelihoods(p, a, 2.0))
              for p, a in zip(probs, alphas)]
    np.testing.assert_allclose(fused, sum(single) + np.log(1e-20 + prior),
                               rtol=1e-4, atol=1e-5)


def test_variance_fusion_oracle():
    rng = np.random.RandomState(4)
    probs = rng.rand(2, 3, 5, 5, 4).astype(np.float32)
    variances = rng.rand(2, 3, 5, 5, 1).astype(np.float32) + 0.01
    got = np.asarray(fm.variance_fusion(jnp.asarray(probs),
                                        jnp.asarray(variances)))
    cert = 1.0 / (1e-20 + variances)
    expect = (cert * probs).sum(0) / cert.sum(0)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_dirichlet_sufficient_statistics():
    rng = np.random.RandomState(5)
    k = 3
    probs = rng.dirichlet(np.ones(k), size=(2, 4, 4)).astype(np.float32)
    labels = rng.randint(0, k, (2, 4, 4))
    ss, counts = fm.dirichlet_sufficient_statistics(
        jnp.asarray(probs), jnp.asarray(labels), k)
    ss, counts = np.asarray(ss), np.asarray(counts)
    for c in range(k):
        mask = labels == c
        assert counts[c] == mask.sum()
        np.testing.assert_allclose(
            ss[c], np.log(1e-10 + probs[mask]).sum(0), rtol=1e-4)


def test_uncertainty_fusion_limits():
    """mix=0 -> plain dirichlet fusion; mix=1 -> uninformative params."""
    rng = np.random.RandomState(6)
    k = 3
    probs = [jnp.asarray(rng.dirichlet(np.ones(k), size=(2, 2)), jnp.float32)
             for _ in range(2)]
    alphas = [rng.rand(k, k) * 4 + 0.5 for _ in range(2)]
    prior = np.full(k, 1 / k)
    zero_mix = [jnp.zeros((2, 2)) for _ in range(2)]
    got = np.asarray(fm.dirichlet_uncertainty_fusion(
        probs, alphas, zero_mix, prior))
    expect = np.asarray(fm.dirichlet_fusion(probs, alphas, prior))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)
    one_mix = [jnp.ones((2, 2)) for _ in range(2)]
    got1 = np.asarray(fm.dirichlet_uncertainty_fusion(
        probs, alphas, one_mix, prior))
    uninf = [np.eye(k) + 1.0] * 2
    expect1 = np.asarray(fm.dirichlet_fusion(probs, uninf, prior))
    np.testing.assert_allclose(got1, expect1, rtol=1e-4, atol=1e-5)


def test_uncertainty_fusion_intermediate_mix_oracle():
    """Intermediate mix must blend the CONCENTRATIONS per pixel (reference
    uncertainty_dirichlet_mix.py:33-36), i.e. evaluate one Dirichlet at
    alpha_px = (1-m)*alpha + m*(I+1) — NOT blend the two log-likelihoods
    (log B is nonlinear in alpha). Oracle: per-pixel scipy Dirichlet."""
    rng = np.random.RandomState(8)
    k, shape = 4, (3, 5)
    probs = [rng.dirichlet(np.ones(k), size=shape).astype(np.float32)
             for _ in range(2)]
    alphas = [rng.rand(k, k) * 4 + 0.5 for _ in range(2)]
    mixes = [rng.rand(*shape).astype(np.float32) for _ in range(2)]
    prior = np.full(k, 1 / k)
    sigma = 1.7
    got = np.asarray(fm.dirichlet_uncertainty_fusion(
        [jnp.asarray(p) for p in probs], alphas,
        [jnp.asarray(m) for m in mixes], prior, sigma=sigma))

    uninf = np.eye(k) + 1.0
    expect = np.log(prior)[None, None]
    for p, a, m in zip(probs, alphas, mixes):
        ll = np.zeros(shape + (k,))
        for i in np.ndindex(*shape):
            alpha_px = sigma * ((1 - m[i]) * a + m[i] * uninf)  # [k, k]
            for c in range(k):
                px = p[i].astype(np.float64)
                ll[i + (c,)] = sp_dirichlet.logpdf(px / px.sum(),
                                                   alpha_px[:, c])
        expect = expect + ll
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-3)


def test_likelihood_ratio_test():
    """Same-distribution samples -> high p; different -> tiny p
    (reference dirichlet_fastfit.py:50-92)."""
    rng = np.random.RandomState(9)
    a = np.array([2.0, 5.0, 3.0])
    s1 = rng.dirichlet(a, size=400)
    s2 = rng.dirichlet(a, size=400)
    s3 = rng.dirichlet(np.array([8.0, 1.0, 1.0]), size=400)
    stat_same, p_same, a0, a1, a2 = de.likelihood_ratio_test(s1, s2)
    stat_diff, p_diff, *_ = de.likelihood_ratio_test(s1, s3)
    assert p_same > 0.05
    assert p_diff < 1e-6
    assert stat_diff > stat_same
    # the unpenalized fit recovers the true parameters (the reference always
    # applies its delta=1e-2 shrinkage; delta=0 gives Minka's plain MLE)
    *_, a0u, a1u, a2u = de.likelihood_ratio_test(s1, s2, delta=0.0)
    for fitted in (a0u, a1u, a2u):
        np.testing.assert_allclose(fitted, a, rtol=0.25)
    # the penalized fit preserves the mean direction
    for fitted in (a0, a1, a2):
        np.testing.assert_allclose(fitted / fitted.sum(), a / a.sum(),
                                   atol=0.05)
    # loglikelihood oracle vs scipy
    from scipy.stats import dirichlet as sp_dir
    expect = sum(sp_dir.logpdf(s / s.sum(), a) for s in s1)
    np.testing.assert_allclose(de.dirichlet_loglikelihood(s1, a), expect,
                               rtol=1e-6)


def test_em_recovers_dirichlet_parameters():
    """findDirichletPriors-equivalent recovers parameters of synthetic draws
    (unpenalized limit)."""
    rng = np.random.RandomState(7)
    true_alpha = np.array([2.0, 5.0, 1.0])
    samples = rng.dirichlet(true_alpha, size=20000)
    ss = np.log(samples).mean(0)
    fitted = de.find_dirichlet_priors(ss, np.zeros(3), np.ones(3),
                                      max_iter=10000, delta=0.0, beta=0.0)
    np.testing.assert_allclose(fitted, true_alpha, rtol=0.1)
    # fastfit agrees
    fitted_fp = de.fixedpoint_with_sufficient_statistic(
        ss, len(samples), 3, np.ones(3))
    np.testing.assert_allclose(fitted_fp, true_alpha, rtol=0.1)
    mle = de.dirichlet_mle_from_samples(samples[:5000])
    np.testing.assert_allclose(mle, true_alpha, rtol=0.15)


def test_alternate_estimator_matches_main_at_optimum():
    """find_dirichlet_priors_alt (reference dirichletEstimation.py) solves
    the same objective as the beta=0 main path — different Newton
    trajectory (the +2*delta Hessian-const term), same optimum."""
    rng = np.random.RandomState(11)
    true_alpha = np.array([2.0, 5.0, 1.0])
    samples = rng.dirichlet(true_alpha, size=20000)
    ss = np.log(samples).mean(0)
    alt = de.find_dirichlet_priors_alt(ss, np.ones(3), max_iter=10000,
                                       delta=0.0)
    np.testing.assert_allclose(alt, true_alpha, rtol=0.1)
    main = de.find_dirichlet_priors(ss, np.zeros(3), np.ones(3),
                                    max_iter=10000, delta=1e-2, beta=0.0)
    alt_pen = de.find_dirichlet_priors_alt(ss, np.ones(3), max_iter=10000,
                                           delta=1e-2)
    np.testing.assert_allclose(alt_pen, main, rtol=1e-3)
    # the penalized objective agrees at both solutions
    obj_main = de._objective(main, ss, np.zeros(3), 0.0, 1e-2)
    obj_alt = de._objective(alt_pen, ss, np.zeros(3), 0.0, 1e-2)
    np.testing.assert_allclose(obj_alt, obj_main, rtol=1e-8)


def test_em_regularizers_shrink():
    rng = np.random.RandomState(8)
    true_alpha = np.array([3.0, 3.0, 3.0])
    samples = rng.dirichlet(true_alpha, size=5000)
    ss = np.log(samples).mean(0)
    plain = de.find_dirichlet_priors(ss, np.zeros(3), np.ones(3), delta=0.0,
                                     beta=0.0)
    shrunk = de.find_dirichlet_priors(ss, np.zeros(3), np.ones(3), delta=0.1,
                                      beta=0.0)
    assert shrunk.sum() < plain.sum()
