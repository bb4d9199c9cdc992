"""Analytic checks for the fixed-variance component model.

Ports the reference test strategy (tests/test_gaussian_components_fixedvar.py):
posterior quantities recomputed from first principles with conjugate update
formulas written out inline in numpy.
"""

import numpy as np
import numpy.testing as npt
import jax.numpy as jnp

from segmentalist_tpu.models import components_fixedvar as fv
from segmentalist_tpu.ops.stats import suff_stats_from_assignments
from segmentalist_tpu.priors import FixedVarPrior


def log_norm_pdf(x, mean, var):
    return -0.5 * (np.log(2 * np.pi) + np.log(var)) - 1.0 / (2 * var) * (x - mean) ** 2


def _rand_prior(D, rng):
    var = 1 * rng.rand(D)
    mu_0 = 5 * rng.rand(D) - 2
    var_0 = 2 * rng.rand(D)
    return FixedVarPrior.create(var, mu_0, var_0), var, mu_0, var_0


def test_log_prior():
    rng = np.random.RandomState(1)
    D = 10
    prior, var, mu_0, var_0 = _rand_prior(D, rng)
    x = 3 * rng.rand(D) + 4
    expected = np.sum([log_norm_pdf(x[i], mu_0[i], var_0[i]) for i in range(D)])
    npt.assert_almost_equal(float(fv.log_prior(prior, jnp.asarray(x))), expected)


def test_log_post_pred_k():
    rng = np.random.RandomState(1)
    D, N_1, N_2, N_3 = 10, 10, 5, 5
    X = 5 * rng.rand(N_1 + N_2 + N_3, D) - 1
    X_1, X_3 = X[:N_1], X[N_1 + N_2:]
    prior, var, mu_0, var_0 = _rand_prior(D, rng)
    precision, precision_0 = 1.0 / var, 1.0 / var_0

    # Assign: comp0 <- X_1, comp1 <- X_3 (comp of X_2 removed, as in reference).
    assignments = np.concatenate(
        [np.zeros(N_1), -np.ones(N_2), np.ones(N_3)]
    ).astype(np.int64)
    stats = suff_stats_from_assignments(jnp.asarray(X), jnp.asarray(assignments), K_max=8)
    params = fv.predictive_params(prior, stats)

    # Hand-derived posterior predictive for component 0 at X_1[0].
    x_1 = X_1[0]
    precision_N = precision_0 + N_1 * precision
    mu_N = (mu_0 * precision_0 + precision * N_1 * X_1.mean(axis=0)) / precision_N
    precision_pred = 1.0 / (1.0 / precision_N + 1.0 / precision)
    expected = np.sum(
        [log_norm_pdf(x_1[i], mu_N[i], 1.0 / precision_pred[i]) for i in range(D)]
    )
    npt.assert_almost_equal(float(fv.log_post_pred(params, jnp.asarray(x_1))[0]), expected)

    # Component 1 at X_3[0].
    x_3 = X_3[0]
    precision_N3 = precision_0 + N_3 * precision
    mu_N3 = (mu_0 * precision_0 + precision * N_3 * X_3.mean(axis=0)) / precision_N3
    precision_pred3 = 1.0 / (1.0 / precision_N3 + 1.0 / precision)
    expected3 = np.sum(
        [log_norm_pdf(x_3[i], mu_N3[i], 1.0 / precision_pred3[i]) for i in range(D)]
    )
    npt.assert_almost_equal(float(fv.log_post_pred(params, jnp.asarray(x_3))[1]), expected3)


def test_log_post_pred_batch_matches_single():
    """Vectorised-vs-unvectorised consistency (reference test technique #2)."""
    rng = np.random.RandomState(1)
    X = rng.rand(11, 10)
    D = X.shape[1]
    prior, *_ = _rand_prior(D, rng)
    assignments = np.array([0, 0, 0, 1, 0, 1, 3, 4, 3, 2, -1])
    stats = suff_stats_from_assignments(jnp.asarray(X), jnp.asarray(assignments), K_max=6)
    params = fv.predictive_params(prior, stats)

    batch = np.asarray(fv.log_post_pred_batch(params, jnp.asarray(X)))
    for i in range(X.shape[0]):
        single = np.asarray(fv.log_post_pred(params, jnp.asarray(X[i])))
        npt.assert_allclose(batch[i], single, rtol=1e-10)


def test_log_marg_k():
    """log marginal of one component's members vs the fully expanded product
    form (reference tests/test_gaussian_components_fixedvar.py:111-143)."""
    rng = np.random.RandomState(1)
    D, N = 10, 10
    X = 5 * rng.rand(N, D) - 1
    prior, var, mu_0, var_0 = _rand_prior(D, rng)
    precision, precision_0 = 1.0 / var, 1.0 / var_0

    stats = suff_stats_from_assignments(
        jnp.asarray(X), jnp.zeros(N, dtype=jnp.int32), K_max=4
    )

    # Expanded form: (N-1)/2 log tau - N/2 log 2pi - 1/2 log(N/tau_0 + 1/tau)
    # ... exactly the reference's closed form, computed per dimension.
    expected = np.sum(
        (N - 1) / 2.0 * np.log(precision)
        - 0.5 * N * np.log(2 * np.pi)
        - 0.5 * np.log(N / precision_0 + 1.0 / precision)
        - 0.5 * precision * np.square(X).sum(axis=0)
        - 0.5 * precision_0 * np.square(mu_0)
        + 0.5
        * (
            np.square(X.sum(axis=0)) * precision / precision_0
            + np.square(mu_0) * precision_0 / precision
            + 2 * X.sum(axis=0) * mu_0
        )
        / (N / precision_0 + 1.0 / precision)
    )
    lm = np.asarray(fv.log_marg_k_vec(prior, stats))
    npt.assert_almost_equal(lm[0], expected)
    npt.assert_array_equal(lm[1:], 0.0)  # empty slots contribute nothing


def test_update_predictive_row_matches_full_recompute():
    rng = np.random.RandomState(2)
    X = rng.rand(12, 4)
    prior, *_ = _rand_prior(4, rng)
    assignments = np.array([0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2])
    stats = suff_stats_from_assignments(jnp.asarray(X), jnp.asarray(assignments), K_max=5)
    params = fv.predictive_params(prior, stats)

    from segmentalist_tpu.ops.stats import add_item

    stats2 = add_item(stats, jnp.asarray(X[0]), 3)
    params2_full = fv.predictive_params(prior, stats2)
    params2_row = fv.update_predictive_row(prior, stats2, params, 3)
    for a, b in zip(params2_full, params2_row):
        npt.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
