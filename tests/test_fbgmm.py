"""FBGMM clustering tests.

Reference technique #3 (seeded golden values, tests/test_fbgmm.py) is
RNG-order-coupled; the equivalent here is distributional: on well-separated
2-D Gaussian data the sampler must recover the true clustering and improve
log_marg, for every covariance type and both sweep modes (SURVEY.md section 4).
"""

import numpy as np
import numpy.testing as npt
import pytest

from segmentalist_tpu import FBGMM, NIW, FixedVarPrior


def _gen_data(seed=1, N=60, D=2, K_true=3, mu_scale=6.0, covar_scale=0.5):
    rng = np.random.RandomState(seed)
    z_true = rng.randint(0, K_true, N)
    mu = rng.randn(D, K_true) * mu_scale
    X = (mu[:, z_true] + rng.randn(D, N) * covar_scale).T
    return X, z_true


def _priors(X, covariance_type):
    N, D = X.shape
    covar_scale = 0.5
    mu_scale = 6.0
    if covariance_type == "full":
        return NIW.create(np.zeros(D), covar_scale**2 / mu_scale**2, D + 3,
                          covar_scale**2 * (D + 3) * np.eye(D))
    if covariance_type == "diag":
        return NIW.create(np.zeros(D), covar_scale**2 / mu_scale**2, D + 3,
                          covar_scale**2 * (D + 3) * np.ones(D))
    return FixedVarPrior.create(covar_scale**2 * np.ones(D), np.zeros(D),
                                mu_scale**2 * np.ones(D))


def _purity(assignments, z_true):
    """Fraction of points whose cluster's majority true label matches."""
    assignments = np.asarray(assignments)
    correct = 0
    for k in np.unique(assignments):
        members = z_true[assignments == k]
        correct += np.bincount(members).max()
    return correct / len(z_true)


@pytest.mark.parametrize("covariance_type", ["fixed", "diag", "full"])
@pytest.mark.parametrize("mode", ["sequential", "blocked"])
def test_clustering_recovers_mixture(covariance_type, mode):
    X, z_true = _gen_data()
    np.random.seed(42)
    prior = _priors(X, covariance_type)
    model = FBGMM(X, prior, alpha=1.0, K=6, assignments="rand",
                  covariance_type=covariance_type)
    record = model.gibbs_sample(25, mode=mode)
    # log_marg must improve substantially and the clustering must be pure.
    assert record["log_marg"][-1] > record["log_marg"][0]
    assert _purity(model.assignments, z_true) >= 0.95, (
        covariance_type, mode, _purity(model.assignments, z_true))
    # record bookkeeping parity
    npt.assert_allclose(
        np.array(record["log_marg"]),
        np.array(record["log_prob_z"]) + np.array(record["log_prob_X_given_z"]),
        rtol=1e-9,
    )
    assert record["components"][-1] == model.K


def test_annealing_schedules_run():
    X, _ = _gen_data(N=30)
    np.random.seed(0)
    model = FBGMM(X, _priors(X, "fixed"), alpha=1.0, K=4,
                  covariance_type="fixed")
    r1 = model.gibbs_sample(6, anneal_schedule="linear",
                            anneal_start_temp_inv=0.1)
    assert r1["anneal_temp"][0] == pytest.approx(10.0)
    assert r1["anneal_temp"][-1] == pytest.approx(1.0)
    np.random.seed(0)
    model = FBGMM(X, _priors(X, "fixed"), alpha=1.0, K=4,
                  covariance_type="fixed")
    r2 = model.gibbs_sample(6, anneal_schedule="step", n_anneal_steps=3)
    assert len(r2["anneal_temp"]) == 6


def test_set_K_shrinks_and_reassigns():
    X, _ = _gen_data(N=40)
    np.random.seed(3)
    model = FBGMM(X, _priors(X, "fixed"), alpha=1.0, K=40,
                  covariance_type="fixed", assignments="each-in-own")
    assert model.K_max == 40
    model.set_K(3)
    assert model.K_max == 3
    assert model.K <= 3
    assert model.get_n_assigned() == X.shape[0]  # everyone reassigned


def test_log_marg_i_matches_manual_logsumexp():
    """log_marg_i is the collapsed single-item marginal (fbgmm.py:256-286)."""
    X, _ = _gen_data(N=12)
    np.random.seed(5)
    model = FBGMM(X, _priors(X, "diag"), alpha=2.0, K=4,
                  assignments=np.array([0, 0, 1, 1, 2, 2, 0, 1, 2, 0, 1, -1]),
                  covariance_type="diag")
    import scipy.special as sps

    counts = np.asarray(model.stats.counts, dtype=float)
    w = np.log(2.0 / 4 + counts) - np.log(counts.sum() + 2.0)
    post = np.asarray(model.components.log_post_pred(11))
    lp = np.asarray(model.log_prior_vec[11])
    logits = w + np.where(counts > 0, post, lp)
    npt.assert_allclose(model.log_marg_i(11), sps.logsumexp(logits), rtol=1e-9)


def test_consider_unassigned_false_keeps_unassigned():
    X, _ = _gen_data(N=20)
    np.random.seed(7)
    assignments = np.array([0] * 10 + [-1] * 10)
    model = FBGMM(X, _priors(X, "fixed"), alpha=1.0, K=4,
                  assignments=assignments, covariance_type="fixed")
    model.gibbs_sample(3, consider_unassigned=False)
    assert np.all(np.asarray(model.assignments)[10:] == -1)
    model.gibbs_sample(1, consider_unassigned=True)
    assert np.all(np.asarray(model.assignments) >= 0)


def test_components_view_rand_k_and_map():
    """Reference component-store surface: rand_k / map through the view
    (gaussian_components.py:291-316)."""
    rng = np.random.RandomState(0)
    X = rng.randn(30, 3).astype(np.float64)
    prior = _priors(X, "full")
    model = FBGMM(X, prior, alpha=1.0, K=4, assignments="rand",
                  covariance_type="full")
    mu, sigma = model.components.rand_k(0)
    assert np.asarray(mu).shape == (3,)
    assert np.asarray(sigma).shape == (3, 3)
    # MAP covariance is symmetric PSD.
    m_mu, m_sigma = model.components.map(0)
    s = np.asarray(m_sigma)
    npt.assert_allclose(s, s.T, atol=1e-9)
    assert np.linalg.eigvalsh(s).min() > 0

    model_f = FBGMM(X.astype(np.float32), _priors(X, "fixed"), alpha=1.0,
                    K=4, assignments="rand", covariance_type="fixed")
    mu_f = model_f.components.map(0)
    assert np.asarray(mu_f).shape == (3,)
