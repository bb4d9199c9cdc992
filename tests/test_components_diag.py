"""Analytic checks for the diagonal-covariance component model.

Ports the reference test strategy (tests/test_gaussian_components_diag.py):
posterior predictive vs a sum of univariate Student's t densities; closed-form
log marginal; vectorised-vs-unvectorised consistency.
"""

import math

import numpy as np
import numpy.testing as npt
import jax.numpy as jnp
from scipy.special import gammaln

from segmentalist_tpu.models import components_diag as dg
from segmentalist_tpu.ops.stats import suff_stats_from_assignments
from segmentalist_tpu.priors import NIW


def students_t(x, mu, var, v):
    """Univariate Student's t log-pdf (reference gaussian_components_diag.py:372-381)."""
    c = (
        gammaln((v + 1) / 2.0)
        - gammaln(v / 2.0)
        - 0.5 * (math.log(v) + math.log(np.pi) + math.log(var))
    )
    return c - (v + 1) / 2.0 * math.log(1 + 1.0 / v * (x - mu) ** 2 / var)


def test_log_post_pred_k_against_hand_derivation():
    """Posterior predictive = product of univariate Student's t with
    hand-computed (m_N, S_N, v_N) (reference test:40-72)."""
    D = 3
    m_0 = np.array([0.5, -0.1, 0.1])
    k_0, v_0 = 2.0, 5.0
    S_0 = 5.0 * np.ones(D)
    prior = NIW.create(m_0, k_0, v_0, S_0)

    X = np.array([
        [0.5, 0.4, 0.3],
        [1.2, 0.9, 0.2],
        [-0.1, 0.8, -0.2],
        [0.0, 0.5, -1.0],
    ])
    N = X.shape[0]
    x = X[0]

    stats = suff_stats_from_assignments(jnp.asarray(X), jnp.zeros(N, jnp.int32), K_max=4)
    params = dg.predictive_params(prior, stats)

    k_N = k_0 + N
    v_N = v_0 + N
    m_N = (k_0 * m_0 + N * X.mean(axis=0)) / k_N
    S_N = S_0 + np.square(X).sum(axis=0) + k_0 * np.square(m_0) - k_N * np.square(m_N)
    var = S_N * (k_N + 1) / (k_N * v_N)
    expected = np.sum([students_t(x[i], m_N[i], var[i], v_N) for i in range(D)])
    npt.assert_almost_equal(float(dg.log_post_pred(params, jnp.asarray(x))[0]), expected)


def test_log_post_pred_after_deletion():
    """Same check after removing items (reference test:75-115): derive stats
    directly from the reduced assignment vector."""
    rng = np.random.RandomState(1)
    D, N_1, N_2 = 5, 8, 4
    X = 5 * rng.rand(N_1 + N_2, D) - 1
    m_0 = rng.rand(D)
    k_0, v_0 = 0.4, float(D) + 2
    S_0 = 0.5 * rng.rand(D) + 0.1
    prior = NIW.create(m_0, k_0, v_0, S_0)

    # Only the first N_1 items assigned (the rest "deleted").
    assignments = np.concatenate([np.zeros(N_1), -np.ones(N_2)]).astype(np.int64)
    stats = suff_stats_from_assignments(jnp.asarray(X), jnp.asarray(assignments), K_max=3)
    params = dg.predictive_params(prior, stats)

    X_1 = X[:N_1]
    x = X[N_1]  # query: a deleted vector
    k_N = k_0 + N_1
    v_N = v_0 + N_1
    m_N = (k_0 * m_0 + N_1 * X_1.mean(axis=0)) / k_N
    S_N = S_0 + np.square(X_1).sum(axis=0) + k_0 * np.square(m_0) - k_N * np.square(m_N)
    var = S_N * (k_N + 1) / (k_N * v_N)
    expected = np.sum([students_t(x[i], m_N[i], var[i], v_N) for i in range(D)])
    npt.assert_almost_equal(float(dg.log_post_pred(params, jnp.asarray(x))[0]), expected)


def test_log_prior():
    rng = np.random.RandomState(3)
    D = 4
    m_0 = rng.rand(D)
    k_0, v_0 = 1.5, float(D) + 1
    S_0 = rng.rand(D) + 0.5
    prior = NIW.create(m_0, k_0, v_0, S_0)
    x = rng.rand(D)
    var = (k_0 + 1.0) / (k_0 * v_0) * S_0
    expected = np.sum([students_t(x[i], m_0[i], var[i], v_0) for i in range(D)])
    npt.assert_almost_equal(float(dg.log_prior(prior, jnp.asarray(x))), expected)


def test_log_post_pred_batch_matches_single():
    rng = np.random.RandomState(2)
    X = rng.rand(11, 4)
    D = X.shape[1]
    m_0 = X.mean(axis=0)
    prior = NIW.create(m_0, 0.05, D + 10, 0.5 * np.ones(D))
    assignments = np.array([0, 0, 0, 1, 0, 1, 3, 4, 3, 2, -1])
    stats = suff_stats_from_assignments(jnp.asarray(X), jnp.asarray(assignments), K_max=6)
    params = dg.predictive_params(prior, stats)
    batch = np.asarray(dg.log_post_pred_batch(params, jnp.asarray(X)))
    for i in range(X.shape[0]):
        npt.assert_allclose(
            batch[i], np.asarray(dg.log_post_pred(params, jnp.asarray(X[i]))), rtol=1e-10
        )


def test_log_marg_k():
    """Closed-form log marginal (reference test:259-292)."""
    rng = np.random.RandomState(1)
    D, N = 6, 9
    X = 2 * rng.rand(N, D) - 1
    m_0 = rng.rand(D)
    k_0, v_0 = 0.3, float(D) + 3
    S_0 = rng.rand(D) + 0.2
    prior = NIW.create(m_0, k_0, v_0, S_0)
    stats = suff_stats_from_assignments(jnp.asarray(X), jnp.zeros(N, jnp.int32), K_max=3)

    k_N = k_0 + N
    v_N = v_0 + N
    m_N = (k_0 * m_0 + X.sum(axis=0)) / k_N
    S_N = S_0 + np.square(X).sum(axis=0) + k_0 * np.square(m_0) - k_N * np.square(m_N)
    expected = (
        -N * D / 2.0 * math.log(np.pi)
        + D / 2.0 * math.log(k_0)
        - D / 2.0 * math.log(k_N)
        + v_0 / 2.0 * np.log(S_0).sum()
        - v_N / 2.0 * np.log(S_N).sum()
        + D * (gammaln(v_N / 2.0) - gammaln(v_0 / 2.0))
    )
    lm = np.asarray(dg.log_marg_k_vec(prior, stats))
    # jax's gammaln differs from scipy's at ~1e-9 relative precision.
    npt.assert_allclose(lm[0], expected, rtol=1e-7)
    npt.assert_array_equal(lm[1:], 0.0)
