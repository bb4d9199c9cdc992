"""Exact one-sweep distribution oracle for FBGMM's blocked mode.

The sequential mode has a stationary-distribution test
(test_exact_posterior.py); the blocked mode's semantics -- every item
scored against the sweep-start FROZEN statistics with its own contribution
left out of its current column (reference fbgmm.py:367 removes the item
before scoring), independent Gumbel-max draws, empty-slot draws
canonicalized to the first frozen-empty slot -- make the joint distribution
of one sweep an exact per-item product, enumerated here from first
principles in numpy.
"""
import itertools

import jax
import numpy as np
from scipy.special import logsumexp as lse

from segmentalist_tpu import FBGMM, FixedVarPrior

VAR, MU0, VAR0 = 0.5, 0.1, 2.0
ALPHA = 1.5
N, K = 3, 3


def _pred_logpdf(x, n, sum_x):
    prec, prec0 = 1.0 / VAR, 1.0 / VAR0
    prec_n = prec0 + n * prec
    mu_pred = (prec0 * MU0 + prec * sum_x) / prec_n
    prec_pred = prec_n * prec / (prec_n + prec)
    return (-0.5 * np.log(2 * np.pi) + 0.5 * np.log(prec_pred)
            - 0.5 * prec_pred * (x - mu_pred) ** 2)


def test_blocked_sweep_matches_exact_product():
    X = np.array([[0.8], [-0.5], [0.6]], np.float32)
    prior = FixedVarPrior.create(VAR * np.ones(1, np.float32),
                                 MU0 * np.ones(1, np.float32),
                                 VAR0 * np.ones(1, np.float32))
    init = np.array([0, 1, 0])  # slot 2 empty at sweep start
    fb = FBGMM(X, prior, ALPHA, K, init, covariance_type="fixed")

    counts = np.asarray(fb.stats.counts).astype(float)
    sum_x = np.asarray(fb.stats.sum_x)[:, 0].astype(float)
    first_empty = int(np.flatnonzero(counts == 0)[0])

    # Per-item outcome distributions from first principles.
    per_item = np.zeros((N, K))
    for i in range(N):
        logits = []
        for k in range(K):
            c, sx = counts[k], sum_x[k]
            if init[i] == k:  # own contribution left out of own column
                c, sx = c - 1, sx - X[i, 0]
            w = np.log(ALPHA / K + c)
            pred = (_pred_logpdf(X[i, 0], c, sx) if c > 0
                    else _pred_logpdf(X[i, 0], 0.0, 0.0))
            logits.append(w + pred)
        p = np.exp(logits - lse(logits))
        # Empty-slot draws (w.r.t. FROZEN counts) map to the first empty.
        q = np.zeros(K)
        for k in range(K):
            q[first_empty if counts[k] == 0 else k] += p[k]
        per_item[i] = q

    exact = {ks: np.prod([per_item[i, k] for i, k in enumerate(ks)])
             for ks in itertools.product(range(K), repeat=N)}
    assert abs(sum(exact.values()) - 1.0) < 1e-12

    stats0, assign0 = fb.stats, fb.assignments
    n_trials = 4000
    freq = {ks: 0 for ks in exact}
    for t in range(n_trials):
        fb.stats, fb.assignments = stats0, assign0
        fb.key = jax.random.PRNGKey(123_000 + t)
        fb.gibbs_sample(1, mode="blocked")
        freq[tuple(np.asarray(fb.assignments).tolist())] += 1

    emp = {ks: v / n_trials for ks, v in freq.items()}
    tv = 0.5 * sum(abs(emp[ks] - exact[ks]) for ks in exact)
    assert tv < 0.05, (
        tv,
        sorted(((ks, round(exact[ks], 4), round(emp[ks], 4))
                for ks in exact), key=lambda r: -r[1])[:8],
    )
    for ks, p in exact.items():
        if p > 0.005:
            sigma = np.sqrt(p * (1 - p) / n_trials)
            assert abs(emp[ks] - p) < 5 * sigma + 1e-9, (ks, p, emp[ks])
