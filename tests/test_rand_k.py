"""Statistical checks of the posterior parameter draws.

The reference never tests ``rand_k`` / ``wishart.py`` (SURVEY.md section 4,
'Untested'); here the Bartlett inverse-Wishart construction and the
inverse-chi-squared draw are verified against their analytic posterior
moments."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from segmentalist_tpu.models import components_diag, components_full
from segmentalist_tpu.ops.stats import suff_stats_from_assignments
from segmentalist_tpu.priors import NIW


def _posterior_terms_full(prior, stats, k):
    n = float(stats.counts[k])
    k_n = float(prior.k_0) + n
    v_n = float(prior.v_0) + n
    m_n = (float(prior.k_0) * np.asarray(prior.m_0) + np.asarray(stats.sum_x[k])) / k_n
    S_n = (np.asarray(prior.S_0)
           + float(prior.k_0) * np.outer(prior.m_0, prior.m_0)
           + np.asarray(stats.sum_sq[k])
           - k_n * np.outer(m_n, m_n))
    return m_n, S_n, k_n, v_n


def test_rand_k_full_matches_posterior_moments():
    rng = np.random.RandomState(0)
    D, N = 3, 40
    X = rng.randn(N, D).astype(np.float64)
    prior = NIW.create(np.zeros(D), 2.0, D + 6.0, np.eye(D))
    assignments = jnp.zeros((N,), jnp.int32)
    stats = suff_stats_from_assignments(jnp.asarray(X), assignments, 2,
                                        full_cov=True)
    m_n, S_n, k_n, v_n = _posterior_terms_full(prior, stats, 0)

    n_draws = 4000
    keys = jax.random.split(jax.random.PRNGKey(1), n_draws)
    mus, sigmas = jax.vmap(
        lambda kk: components_full.rand_k(kk, prior, stats, 0)
    )(keys)
    mus, sigmas = np.asarray(mus), np.asarray(sigmas)

    # E[Sigma] = S_n / (v_n - D - 1) for inverse-Wishart(S_n, v_n).
    exp_sigma = S_n / (v_n - D - 1)
    npt.assert_allclose(sigmas.mean(axis=0), exp_sigma, rtol=0.12)
    # E[mu] = m_n; Cov[mu] = E[Sigma] / k_n.
    npt.assert_allclose(mus.mean(axis=0), m_n, atol=4 * np.sqrt(
        np.diag(exp_sigma) / k_n / n_draws).max() + 1e-3)
    emp_cov = np.cov(mus.T)
    npt.assert_allclose(emp_cov, exp_sigma / k_n, rtol=0.25, atol=0.02)


def test_rand_k_diag_matches_posterior_moments():
    rng = np.random.RandomState(3)
    D, N = 4, 50
    X = rng.randn(N, D).astype(np.float64) * 1.5
    prior = NIW.create(np.zeros(D), 1.5, 5.0, np.ones(D))
    assignments = jnp.zeros((N,), jnp.int32)
    stats = suff_stats_from_assignments(jnp.asarray(X), assignments, 2,
                                        full_cov=False)
    n = float(stats.counts[0])
    k_n = float(prior.k_0) + n
    v_n = float(prior.v_0) + n
    m_n = (float(prior.k_0) * np.asarray(prior.m_0)
           + np.asarray(stats.sum_x[0])) / k_n
    s_n = (np.asarray(prior.S_0)
           + float(prior.k_0) * np.square(np.asarray(prior.m_0))
           + np.asarray(stats.sum_sq[0]) - k_n * np.square(m_n))

    n_draws = 6000
    keys = jax.random.split(jax.random.PRNGKey(4), n_draws)
    means, variances = jax.vmap(
        lambda kk: components_diag.rand_k(kk, prior, stats, 0)
    )(keys)
    means, variances = np.asarray(means), np.asarray(variances)

    # var ~ Scaled-Inv-chi2(v_n, s_n/v_n): E[var] = s_n / (v_n - 2).
    npt.assert_allclose(variances.mean(axis=0), s_n / (v_n - 2), rtol=0.1)
    npt.assert_allclose(means.mean(axis=0), m_n, atol=0.05)
    # Var[mean] = E[var] / k_n.
    npt.assert_allclose(means.var(axis=0), (s_n / (v_n - 2)) / k_n, rtol=0.2)


def test_wishrnd_iwishrnd_moments():
    """Public wishart surface (reference wishart.py:16-32): Wishart mean
    v*Sigma; iwishrnd inverts the draw, so it is IW(Sigma^{-1}, v) with
    mean Sigma^{-1} / (v - D - 1)."""
    from segmentalist_tpu import wishart

    D, v = 3, 12.0
    A = np.array([[2.0, 0.3, 0.0], [0.3, 1.5, 0.2], [0.0, 0.2, 1.0]])
    sigma = (A @ A.T).astype(np.float64)
    n_draws = 8000
    keys = jax.random.split(jax.random.PRNGKey(7), n_draws)

    # Per-element atol from the Wishart element variance
    # v*(sigma_ij^2 + sigma_ii*sigma_jj): 4 std errors of the MC mean.
    elem_var = v * (sigma ** 2 + np.outer(np.diag(sigma), np.diag(sigma)))
    ws = np.asarray(jax.vmap(lambda k: wishart.wishrnd(k, sigma, v))(keys))
    npt.assert_allclose(ws.mean(axis=0), v * sigma,
                        atol=4 * np.sqrt(elem_var / n_draws).max())

    iws = np.asarray(jax.vmap(lambda k: wishart.iwishrnd(k, sigma, v))(keys))
    exp_iw = np.linalg.inv(sigma) / (v - D - 1)
    npt.assert_allclose(iws.mean(axis=0), exp_iw, rtol=0.12, atol=0.01)

    # Precomputed-Cholesky arg matches the reference's C= reuse path.
    C = np.linalg.cholesky(sigma)
    w1 = np.asarray(wishart.wishrnd(keys[0], sigma, v))
    w2 = np.asarray(wishart.wishrnd(keys[0], sigma, v, C=jnp.asarray(C)))
    npt.assert_allclose(w1, w2, rtol=1e-10)
