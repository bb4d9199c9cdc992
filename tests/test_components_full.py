"""Analytic checks for the full-covariance (NIW) component model.

The reference ships no dedicated full-covariance test file; its correctness
backbone for this model is the runnable demo in gaussian_components.py:370-465.
We verify against independently written numpy implementations of the
multivariate Student's t predictive and the NIW log marginal.
"""

import math

import numpy as np
import numpy.testing as npt
import jax
import jax.numpy as jnp
from scipy.special import gammaln

from segmentalist_tpu.models import components_full as fc
from segmentalist_tpu.ops.stats import suff_stats_from_assignments
from segmentalist_tpu.priors import NIW


def mvt_logpdf(x, mu, covar, v):
    """Multivariate Student's t log-pdf, numpy reference."""
    D = len(x)
    delta = x - mu
    maha = delta @ np.linalg.inv(covar) @ delta
    return (
        gammaln((v + D) / 2.0)
        - gammaln(v / 2.0)
        - D / 2.0 * math.log(v)
        - D / 2.0 * math.log(np.pi)
        - 0.5 * np.linalg.slogdet(covar)[1]
        - (v + D) / 2.0 * math.log(1 + maha / v)
    )


def _setup(seed=1, N=9, D=4, K_max=5):
    rng = np.random.RandomState(seed)
    X = 2 * rng.rand(N, D) - 1
    m_0 = rng.rand(D)
    k_0 = 0.4
    v_0 = float(D) + 3
    A = rng.rand(D, D)
    S_0 = 0.5 * np.eye(D) + 0.05 * (A @ A.T)
    prior = NIW.create(m_0, k_0, v_0, S_0)
    return X, prior, m_0, k_0, v_0, S_0


def test_log_post_pred_against_hand_derivation():
    X, prior, m_0, k_0, v_0, S_0 = _setup()
    N, D = X.shape
    stats = suff_stats_from_assignments(
        jnp.asarray(X), jnp.zeros(N, jnp.int32), K_max=5, full_cov=True
    )
    params = fc.predictive_params(prior, stats)

    k_N = k_0 + N
    v_N = v_0 + N
    m_N = (k_0 * m_0 + X.sum(axis=0)) / k_N
    S_N_partial = S_0 + k_0 * np.outer(m_0, m_0) + X.T @ X
    v = v_N - D + 1
    covar = (k_N + 1.0) / (k_N * v) * (S_N_partial - k_N * np.outer(m_N, m_N))

    x = X[0]
    expected = mvt_logpdf(x, m_N, covar, v)
    npt.assert_almost_equal(float(fc.log_post_pred(params, jnp.asarray(x))[0]), expected)


def test_log_prior():
    X, prior, m_0, k_0, v_0, S_0 = _setup()
    D = X.shape[1]
    v = v_0 - D + 1
    covar = (k_0 + 1.0) / (k_0 * v) * S_0
    x = X[3]
    npt.assert_almost_equal(
        float(fc.log_prior(prior, jnp.asarray(x))), mvt_logpdf(x, m_0, covar, v)
    )


def test_log_post_pred_batch_matches_single():
    X, prior, *_ = _setup(seed=2, N=11)
    assignments = np.array([0, 0, 0, 1, 0, 1, 3, 4, 3, 2, -1])
    stats = suff_stats_from_assignments(
        jnp.asarray(X), jnp.asarray(assignments), K_max=6, full_cov=True
    )
    params = fc.predictive_params(prior, stats)
    batch = np.asarray(fc.log_post_pred_batch(params, jnp.asarray(X)))
    for i in range(X.shape[0]):
        npt.assert_allclose(
            batch[i], np.asarray(fc.log_post_pred(params, jnp.asarray(X[i]))), rtol=1e-9
        )


def test_log_marg_k():
    X, prior, m_0, k_0, v_0, S_0 = _setup()
    N, D = X.shape
    stats = suff_stats_from_assignments(
        jnp.asarray(X), jnp.zeros(N, jnp.int32), K_max=3, full_cov=True
    )
    k_N = k_0 + N
    v_N = v_0 + N
    m_N = (k_0 * m_0 + X.sum(axis=0)) / k_N
    S_N = S_0 + k_0 * np.outer(m_0, m_0) + X.T @ X - k_N * np.outer(m_N, m_N)
    i = np.arange(1, D + 1)
    expected = (
        -N * D / 2.0 * math.log(np.pi)
        + D / 2.0 * math.log(k_0)
        - D / 2.0 * math.log(k_N)
        + v_0 / 2.0 * np.linalg.slogdet(S_0)[1]
        - v_N / 2.0 * np.linalg.slogdet(S_N)[1]
        + np.sum(gammaln((v_N + 1 - i) / 2.0) - gammaln((v_0 + 1 - i) / 2.0))
    )
    lm = np.asarray(fc.log_marg_k_vec(prior, stats))
    npt.assert_almost_equal(lm[0], expected)
    npt.assert_array_equal(lm[1:], 0.0)


def test_map_k():
    X, prior, m_0, k_0, v_0, S_0 = _setup()
    N, D = X.shape
    stats = suff_stats_from_assignments(
        jnp.asarray(X), jnp.zeros(N, jnp.int32), K_max=3, full_cov=True
    )
    mu, sigma = fc.map_k(prior, stats, 0)
    k_N = k_0 + N
    v_N = v_0 + N
    m_N = (k_0 * m_0 + X.sum(axis=0)) / k_N
    S_N = S_0 + k_0 * np.outer(m_0, m_0) + X.T @ X - k_N * np.outer(m_N, m_N)
    npt.assert_allclose(np.asarray(mu), m_N, rtol=1e-10)
    npt.assert_allclose(np.asarray(sigma), S_N / (v_N + D + 2), rtol=1e-10)


def test_rand_k_moments():
    """Posterior draws should concentrate around the MAP for a big component."""
    rng = np.random.RandomState(0)
    N, D = 400, 3
    X = rng.randn(N, D) * 0.5 + np.array([1.0, -2.0, 0.5])
    prior = NIW.create(np.zeros(D), 1.0, float(D) + 3, np.eye(D))
    stats = suff_stats_from_assignments(
        jnp.asarray(X), jnp.zeros(N, jnp.int32), K_max=2, full_cov=True
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    draws = [fc.rand_k(k, prior, stats, 0) for k in keys]
    mus = np.stack([np.asarray(m) for m, _ in draws])
    npt.assert_allclose(mus.mean(axis=0), X.mean(axis=0), atol=0.05)


def test_unrolled_chol_inv_logdet_matches_linalg():
    """The small-D unrolled Cholesky/inverse agrees with jnp.linalg."""
    import jax.numpy as jnp
    from segmentalist_tpu.models.components_full import (
        _chol_inv_logdet_unrolled)

    rng = np.random.RandomState(0)
    for D in (1, 2, 5, 13):
        A = rng.randn(7, D, D)
        spd = A @ np.swapaxes(A, -1, -2) + D * np.eye(D)
        inv, logdet = _chol_inv_logdet_unrolled(jnp.asarray(spd))
        npt.assert_allclose(np.asarray(inv), np.linalg.inv(spd),
                            rtol=1e-8, atol=1e-9)
        npt.assert_allclose(np.asarray(logdet),
                            np.linalg.slogdet(spd)[1], rtol=1e-9)
