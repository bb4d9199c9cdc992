"""Cross-utterance new-component decollision (``common.decollide_new_
components``).

Blocked sweeps let every utterance's chain pick "a new component" from the
SAME pool of empty slot labels; the independent choices collide at merge
time and unrelated segments get fused.  The reference never faces this (it
is strictly sequential, ``unigram_acoustic_wordseg.py:449-455``); the
blocked mode must relabel the collisions onto fresh empty slots —
exchangeable, hence distribution-preserving — or non-adaptive covariances
fall into a merge trap (measured at scale by
``benchmarks/blocked_equivalence.py``: B=125 on a 200-utterance corpus
plateaued at log_marg -210k vs the exact chain's -20k before the fix).
"""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from segmentalist_tpu.segmenters.common import decollide_new_components


def test_decollide_crafted_cases():
    K = 10
    counts0 = jnp.array([3, 2, 0, 0, 0, 0, 0, 0, 0, 0])
    lo = jnp.broadcast_to(counts0[None], (3, K))
    # row0 creates slot 2 (two segments); row1 collides on 2 and creates 5;
    # row2 collides on 5 and joins occupied slot 0.
    new_ks = jnp.array([[2, 2], [2, 5], [5, 0]])
    out = decollide_new_components(new_ks, jnp.ones((3, 2), bool), lo,
                                   counts0)
    # First creator keeps; later creators move to fresh slots (3, 4 — index
    # order); the deliberate join of occupied slot 0 is untouched.
    npt.assert_array_equal(np.asarray(out), [[2, 2], [3, 5], [4, 0]])


def test_decollide_creator_yields_to_joiner():
    # Row 0 emptied slot 1 via its own leave-out (lo=0) and re-creates it;
    # row 1 deliberately joins the OLD slot 1 (lo=2>0).  The creator must
    # move (its "new" is a different component from the joiner's "old").
    K = 10
    counts0 = jnp.array([3, 2, 0, 0, 0, 0, 0, 0, 0, 0])
    lo = jnp.array([[3, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                    [3, 2, 0, 0, 0, 0, 0, 0, 0, 0]])
    new_ks = jnp.array([[1, 1], [1, 2]])
    out = decollide_new_components(new_ks, jnp.ones((2, 2), bool), lo,
                                   counts0)
    npt.assert_array_equal(np.asarray(out), [[3, 3], [1, 2]])


def test_decollide_fresh_exhaustion_and_masks():
    # Only K=3 slots, all empty, three rows create slot 0: first keeps 0,
    # the others take the remaining fresh slots 1, 2; a fourth creator
    # would stay merged (graceful saturation).
    c0 = jnp.zeros(3, jnp.int32)
    nk = jnp.zeros((4, 1), jnp.int32)
    out = decollide_new_components(nk, jnp.ones((4, 1), bool),
                                   jnp.zeros((4, 3), jnp.int32), c0)
    npt.assert_array_equal(np.asarray(out), [[0], [1], [2], [0]])
    # Masked (dead/padded) rows neither claim slots nor get remapped.
    mask = jnp.array([[True], [False], [True], [True]])
    out = decollide_new_components(nk, mask, jnp.zeros((4, 3), jnp.int32),
                                   c0)
    npt.assert_array_equal(np.asarray(out), [[0], [0], [1], [2]])


def test_decollide_single_row_identity():
    # B=1 is the reference chain: the remap must be the identity.
    rng = np.random.RandomState(0)
    K = 17
    counts0 = jnp.asarray(rng.randint(0, 3, K), jnp.int32)
    lo = counts0[None]
    nk = jnp.asarray(rng.randint(-1, K, (1, 6)), jnp.int32)
    out = decollide_new_components(nk, nk >= 0, lo, counts0)
    npt.assert_array_equal(np.asarray(out), np.asarray(nk))


def test_decollide_shard_map_matches_single_device():
    # The all-gathered cross-shard remap must equal the single-device one.
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    rng = np.random.RandomState(1)
    B, S, K = 8, 5, 31
    counts0 = jnp.asarray((rng.rand(K) < 0.4) * rng.randint(1, 4, K),
                          jnp.int32)
    lo = jnp.broadcast_to(counts0[None], (B, K))
    nk = jnp.asarray(rng.randint(0, K, (B, S)), jnp.int32)
    mask = jnp.asarray(rng.rand(B, S) < 0.9)
    ref = decollide_new_components(nk, mask, lo, counts0)
    mesh = Mesh(np.array(jax.devices()[:4]), ("d",))
    fn = shard_map(
        lambda a, m, l, c: decollide_new_components(a, m, l, c,
                                                    axis_name="d"),
        mesh=mesh, in_specs=(P("d"), P("d"), P("d"), P(None)),
        out_specs=P("d"))
    got = fn(nk, mask, lo, counts0)
    npt.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_blocked_fixed_matches_exact_with_decollision():
    """End-to-end: on a corpus where the collision merge trap is measurable
    (fixed covariance, blocked B=U/2), the decollided blocked sampler must
    land in the exact (batch_size=1) chain's regime; without decollision it
    demonstrably does not (this is the at-scale divergence of
    benchmarks/blocked_equivalence.py reproduced small)."""
    from segmentalist_tpu import FBGMM, FixedVarPrior
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
    from segmentalist_tpu.utils.synth import synthetic_corpus

    U, D, W, K = 40, 13, 6, 200
    em, vi, du, lm, _ = synthetic_corpus(
        n_utterances=U, n_landmarks_max=10, D=D, K_true=20, n_slices_max=W,
        seed=0)
    em = {k: v.astype(np.float32) for k, v in em.items()}
    prior = FixedVarPrior.create(0.05 * np.ones(D, np.float32),
                                 np.zeros(D, np.float32),
                                 np.ones(D, np.float32))

    def run(batch, dc):
        np.random.seed(0)
        seg = UnigramAcousticWordseg(
            FBGMM, am_alpha=1.0, am_K=K, am_param_prior=prior,
            embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
            landmarks_dict=lm, covariance_type="fixed",
            p_boundary_init=0.5, beta_sent_boundary=-1, n_slices_max=W,
            batch_size=batch, seed=0, decollide_new=dc)
        rec = seg.gibbs_sample(15)
        return float(rec["log_marg"][-1])

    exact = run(1, True)
    blocked = run(20, True)
    trapped = run(20, False)
    # Measured: exact -2689, decollided blocked -2665, trapped -13808.
    assert abs(blocked - exact) < 0.15 * abs(exact), (blocked, exact)
    assert trapped < exact - abs(exact), (trapped, exact)
    # batch_size=1 is unaffected by the flag (identity remap).
    assert run(1, False) == exact


def test_fbgmm_blocked_decollided_oracle():
    """Exact one-sweep oracle for FBGMM's blocked mode WITH decollision and
    more than one empty slot: per-item outcome distributions over ALL K
    slots (each empty slot carries its own alpha/K mass), joint = product
    (independent Gumbel-max draws), then the deterministic decollision
    remap (j-th creator by item order -> j-th empty slot; overflow keeps
    its drawn slot).  Complements tests/test_blocked_sweep_oracle.py, whose
    single-empty configuration is remap-invariant."""
    import itertools

    from scipy.special import logsumexp as lse

    from segmentalist_tpu import FBGMM, FixedVarPrior

    VAR, MU0, VAR0, ALPHA = 0.5, 0.1, 2.0, 1.5
    N, K = 3, 4

    def pred_logpdf(x, n, sum_x):
        prec, prec0 = 1.0 / VAR, 1.0 / VAR0
        prec_n = prec0 + n * prec
        mu_pred = (prec0 * MU0 + prec * sum_x) / prec_n
        prec_pred = prec_n * prec / (prec_n + prec)
        return (-0.5 * np.log(2 * np.pi) + 0.5 * np.log(prec_pred)
                - 0.5 * prec_pred * (x - mu_pred) ** 2)

    X = np.array([[0.8], [-0.5], [0.6]], np.float32)
    prior = FixedVarPrior.create(VAR * np.ones(1, np.float32),
                                 MU0 * np.ones(1, np.float32),
                                 VAR0 * np.ones(1, np.float32))
    init = np.array([0, 1, 0])  # slots 2 AND 3 empty at sweep start
    fb = FBGMM(X, prior, ALPHA, K, init, covariance_type="fixed")
    counts = np.asarray(fb.stats.counts).astype(float)
    sum_x = np.asarray(fb.stats.sum_x)[:, 0].astype(float)
    empties = np.flatnonzero(counts == 0)

    per_item = np.zeros((N, K))
    for i in range(N):
        logits = []
        for k in range(K):
            c, sx = counts[k], sum_x[k]
            if init[i] == k:
                c, sx = c - 1, sx - X[i, 0]
            w = np.log(ALPHA / K + c)
            pred = (pred_logpdf(X[i, 0], c, sx) if c > 0
                    else pred_logpdf(X[i, 0], 0.0, 0.0))
            logits.append(w + pred)
        per_item[i] = np.exp(logits - lse(logits))

    def remap(ks):
        is_new = [counts[k] == 0 for k in ks]
        out, rank = list(ks), 0
        for i in range(N):
            if is_new[i]:
                if rank < len(empties):
                    out[i] = int(empties[rank])
                rank += 1
        return tuple(out)

    exact = {}
    for ks in itertools.product(range(K), repeat=N):
        p = np.prod([per_item[i, k] for i, k in enumerate(ks)])
        out = remap(ks)
        exact[out] = exact.get(out, 0.0) + p
    assert abs(sum(exact.values()) - 1.0) < 1e-12

    stats0, assign0 = fb.stats, fb.assignments
    n_trials = 4000
    freq = {}
    for t in range(n_trials):
        fb.stats, fb.assignments = stats0, assign0
        fb.key = jax.random.PRNGKey(777_000 + t)
        fb.gibbs_sample(1, mode="blocked")
        ks = tuple(np.asarray(fb.assignments).tolist())
        freq[ks] = freq.get(ks, 0) + 1

    emp = {ks: freq.get(ks, 0) / n_trials for ks in exact}
    assert all(ks in exact for ks in freq), set(freq) - set(exact)
    tv = 0.5 * sum(abs(emp[ks] - exact[ks]) for ks in exact)
    assert tv < 0.05, (
        tv,
        sorted(((ks, round(exact[ks], 4), round(emp[ks], 4))
                for ks in exact), key=lambda r: -r[1])[:8],
    )
