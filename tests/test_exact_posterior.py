"""Distributional correctness against exactly enumerated posteriors
(VERDICT round 1, item 6).

Two levels, both with first-principles numpy oracles (no library math):

1. ``FBGMM`` sequential mode is exact collapsed Gibbs (every conditional is
   the true one), so its STATIONARY distribution must equal the enumerated
   labeled posterior P(z | X).  N=4, K=2, D=1 fixed-variance: 16 states,
   compared by total-variation distance over a long deterministic chain.

2. The unigram segmenter's per-utterance move (``gibbs_sample_i`` with
   batch_size=1) is a compound kernel: FFBS over segmentations, then a
   sequential assignment chain.  Its one-step TRANSITION distribution from a
   fixed state is enumerable (4 segmentations x <= 2^3 assignments); the
   empirical frequencies over thousands of independent single moves (state
   restored, fresh key) must match.  This catches conditional-distribution
   bugs that mode-reaching tests miss.

Reference anchor: tests/test_unigram_acoustic_wordseg.py:145-231 (the
reference pins golden trajectories; a batched Gumbel-max sampler cannot
match them bitwise, so the equivalent is this distributional check --
SURVEY.md section 4)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import gammaln, logsumexp as lse

from segmentalist_tpu import FBGMM, FixedVarPrior
from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg

VAR, MU0, VAR0 = 0.5, 0.0, 2.0  # fixed-var prior (D=1)


def _pred_logpdf(x, n, sum_x):
    """Posterior predictive N(x | mu_pred, 1/prec_pred) for one dimension,
    replicating gaussian_components_fixedvar.py:163-168, :242-253."""
    prec, prec0 = 1.0 / VAR, 1.0 / VAR0
    prec_n = prec0 + n * prec
    mu_pred = (prec0 * MU0 + prec * sum_x) / prec_n
    prec_pred = prec_n * prec / (prec_n + prec)
    return (-0.5 * np.log(2 * np.pi) + 0.5 * np.log(prec_pred)
            - 0.5 * prec_pred * (x - mu_pred) ** 2)


def _prior_logpdf(x):
    """The reference's prior-density quirk: predictive precision taken to be
    precision_0 itself (gaussian_components_fixedvar.py:224-231)."""
    prec0 = 1.0 / VAR0
    return (-0.5 * np.log(2 * np.pi) + 0.5 * np.log(prec0)
            - 0.5 * prec0 * (x - MU0) ** 2)


def _log_marg_component(xs):
    """log p(x_1..x_n) of one component's members by predictive chaining."""
    lp, n, sx = 0.0, 0.0, 0.0
    for x in xs:
        lp += _pred_logpdf(x, n, sx)
        n += 1.0
        sx += x
    return lp


def test_fbgmm_sequential_stationary_distribution():
    X = np.array([-1.3, -0.9, 1.1, 1.6])[:, None]
    N, K, alpha = 4, 2, 1.0
    prior = FixedVarPrior.create(VAR * np.ones(1), MU0 * np.ones(1),
                                 VAR0 * np.ones(1))

    # Exact labeled posterior over the 16 assignment vectors.
    states = list(itertools.product(range(K), repeat=N))
    logp = np.empty(len(states))
    for s_i, z in enumerate(states):
        counts = np.bincount(z, minlength=K)
        lpz = (gammaln(alpha) - gammaln(alpha + N)
               + sum(gammaln(c + alpha / K) - gammaln(alpha / K)
                     for c in counts))
        lpx = sum(_log_marg_component(X[np.array(z) == k, 0])
                  for k in range(K) if (np.array(z) == k).any())
        logp[s_i] = lpz + lpx
    exact = np.exp(logp - lse(logp))

    np.random.seed(0)
    model = FBGMM(X, prior, alpha=alpha, K=K, assignments=[0, 0, 1, 1],
                  covariance_type="fixed", key=jax.random.PRNGKey(42))
    sweep = model._get_sweep_fn("sequential", True)

    n_sweeps, burn = 6000, 200
    freq = np.zeros(len(states))
    index = {z: i for i, z in enumerate(states)}
    temp = np.asarray(1.0, dtype=model.X.dtype)
    for t in range(n_sweeps):
        model.stats, model.assignments, model.key = sweep(
            model.stats, model.assignments, model.key, temp
        )
        if t >= burn:
            freq[index[tuple(np.asarray(model.assignments).tolist())]] += 1
    freq /= freq.sum()

    tv = 0.5 * np.abs(freq - exact).sum()
    assert tv < 0.05, (tv, list(zip(states, exact.round(4), freq.round(4))))


# --------------------------------------------------------------------------
# Unigram segmenter: exact one-move transition kernel.

def _tri(t_excl, start):
    return t_excl * (t_excl - 1) // 2 + start


def _build_two_utterance_segmenter():
    """Utterance 0: 3 landmarks, all 6 spans embedded; utterance 1: one
    landmark pinned to component 0 (the held-out context)."""
    rng = np.random.RandomState(5)
    emb0 = rng.randn(6, 1) * 1.2
    emb1 = np.array([[0.4]])
    embedding_mats = {"u0": emb0, "u1": emb1}
    vec_ids_dict = {"u0": np.arange(6), "u1": np.array([0])}
    durations_dict = {"u0": [1, 2, 1, 3, 2, 1], "u1": [1]}
    landmarks_dict = {"u0": [1, 2, 3], "u1": [1]}
    prior = FixedVarPrior.create(VAR * np.ones(1), MU0 * np.ones(1),
                                 VAR0 * np.ones(1))
    np.random.seed(7)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=2, am_param_prior=prior,
        embedding_mats=embedding_mats, vec_ids_dict=vec_ids_dict,
        durations_dict=durations_dict, landmarks_dict=landmarks_dict,
        p_boundary_init=0.5, beta_sent_boundary=-1, n_slices_max=3,
        time_power_term=0.0, wip=0.0, batch_size=1, seed=7,
    )
    return seg, emb0


_PATTERNS = {  # boundary triple -> list of (start, end_excl) segments
    (0, 0, 1): [(0, 3)],
    (1, 0, 1): [(0, 1), (1, 3)],
    (0, 1, 1): [(0, 2), (2, 3)],
    (1, 1, 1): [(0, 1), (1, 2), (2, 3)],
}


def _pattern_embeds(pattern):
    return [_tri(e, s) for s, e in _PATTERNS[pattern]]


def _exact_move_kernel(seg, emb0):
    """Enumerate P(new boundaries, new assignments) of one gibbs_sample_i(0)
    move from the segmenter's CURRENT state, from first principles."""
    alpha, K = 1.0, 2
    counts = np.asarray(seg.acoustic_model.stats.counts).astype(float)
    sum_x = np.asarray(seg.acoustic_model.stats.sum_x)[:, 0].astype(float)
    assignments = np.asarray(seg.acoustic_model.assignments)
    # Leave out utterance 0's current segments.
    old_embeds = [e for e in seg.utterances.get_segmented_embeds_i(0)
                  if e != -1]
    lo_counts, lo_sum_x = counts.copy(), sum_x.copy()
    for e in old_embeds:
        k = assignments[e]
        lo_counts[k] -= 1
        lo_sum_x[k] -= emb0[e, 0]

    def cand_score(e):
        x = emb0[e, 0]
        terms = []
        for k in range(K):
            w = (np.log(alpha / K + lo_counts[k])
                 - np.log(lo_counts.sum() + alpha))
            pred = (_pred_logpdf(x, lo_counts[k], lo_sum_x[k])
                    if lo_counts[k] > 0 else _prior_logpdf(x))
            terms.append(w + pred)
        return lse(terms)

    # FFBS target over the four segmentations.
    seg_logp = {
        p: sum(cand_score(e) for e in _pattern_embeds(p)) for p in _PATTERNS
    }
    z = lse(list(seg_logp.values()))

    probs = {}
    for p in _PATTERNS:
        embeds = _pattern_embeds(p)
        for ks in itertools.product(range(K), repeat=len(embeds)):
            c, sx = lo_counts.copy(), lo_sum_x.copy()
            lp_chain = 0.0
            for e, k in zip(embeds, ks):
                x = emb0[e, 0]
                logits = []
                for kk in range(K):
                    w = np.log(alpha / K + c[kk])
                    pred = (_pred_logpdf(x, c[kk], sx[kk]) if c[kk] > 0
                            else _prior_logpdf(x))
                    logits.append(w + pred)
                lp_chain += logits[k] - lse(logits)
                c[k] += 1
                sx[k] += x
            probs[(p, ks)] = np.exp(seg_logp[p] - z + lp_chain)
    return probs


def test_unigram_single_move_transition_kernel():
    seg, emb0 = _build_two_utterance_segmenter()
    am = seg.acoustic_model
    exact = _exact_move_kernel(seg, emb0)
    assert abs(sum(exact.values()) - 1.0) < 1e-9

    stats0, assign0 = am.stats, am.assignments
    bounds0 = seg._boundaries_dev

    n_trials = 4000
    freq = {key: 0 for key in exact}
    for t in range(n_trials):
        am.stats, am.assignments = stats0, assign0
        seg._boundaries_dev = bounds0
        am.key = jax.random.PRNGKey(10_000 + t)
        seg.gibbs_sample_i(0)
        bounds = tuple(
            np.asarray(seg._boundaries_dev)[0, :3].astype(int).tolist()
        )
        embeds = _pattern_embeds(bounds)
        ks = tuple(int(np.asarray(am.assignments)[e]) for e in embeds)
        freq[(bounds, ks)] += 1

    emp = {key: v / n_trials for key, v in freq.items()}
    tv = 0.5 * sum(abs(emp[key] - exact[key]) for key in exact)
    assert tv < 0.04, (
        tv,
        sorted(((key, round(exact[key], 4), round(emp[key], 4))
                for key in exact), key=lambda r: -r[1])[:8],
    )
    # Every non-negligible outcome is within 5 sigma of its expectation.
    for key, p in exact.items():
        if p > 0.005:
            sigma = np.sqrt(p * (1 - p) / n_trials)
            assert abs(emp[key] - p) < 5 * sigma + 1e-9, (key, p, emp[key])


def test_shard_map_single_move_matches_exact_kernel():
    """The explicit-collective (shard_map) sweep must sample utterance 0's
    move from the SAME exact kernel as the single-device sweep: each shard
    conditions on the identical frozen snapshot, so the per-utterance move
    distribution is unchanged (VERDICT round 1, weak #7)."""
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from segmentalist_tpu.parallel import make_mesh, shard_segmenter
    from segmentalist_tpu.parallel.shard_sweep import use_shard_map_sweep

    seg, emb0 = _build_two_utterance_segmenter()
    seg.batch_size = 2  # one utterance per shard per block
    mesh = make_mesh(2)
    shard_segmenter(seg, mesh)
    use_shard_map_sweep(seg, mesh)
    am = seg.acoustic_model

    exact = _exact_move_kernel(seg, emb0)
    stats0, assign0 = am.stats, am.assignments
    bounds0 = seg._boundaries_dev

    n_trials = 2500
    freq = {key: 0 for key in exact}
    for t in range(n_trials):
        am.stats, am.assignments = stats0, assign0
        seg._boundaries_dev = bounds0
        am.key = jax.random.PRNGKey(50_000 + t)
        seg.gibbs_sample_i(0)
        bounds = tuple(
            np.asarray(seg._boundaries_dev)[0, :3].astype(int).tolist()
        )
        embeds = _pattern_embeds(bounds)
        ks = tuple(int(np.asarray(am.assignments)[e]) for e in embeds)
        freq[(bounds, ks)] += 1

    emp = {key: v / n_trials for key, v in freq.items()}
    tv = 0.5 * sum(abs(emp[key] - exact[key]) for key in exact)
    assert tv < 0.05, (
        tv,
        sorted(((key, round(exact[key], 4), round(emp[key], 4))
                for key in exact), key=lambda r: -r[1])[:8],
    )


# --------------------------------------------------------------------------
# Annealed move: the backward segmentation draw and (with anneal_gibbs_am)
# the assignment chain draws are tempered per step.

def _build_two_landmark_segmenter():
    """Utterance 0: 2 landmarks (one backward DP draw, so the annealed
    pattern distribution is exactly softmax(pattern_logp / T)); utterance 1:
    one landmark of held-out context."""
    rng = np.random.RandomState(8)
    emb0 = rng.randn(3, 1) * 1.2
    emb1 = np.array([[0.4]])
    embedding_mats = {"u0": emb0, "u1": emb1}
    vec_ids_dict = {"u0": np.arange(3), "u1": np.array([0])}
    durations_dict = {"u0": [1, 2, 1], "u1": [1]}
    landmarks_dict = {"u0": [1, 2], "u1": [1]}
    prior = FixedVarPrior.create(VAR * np.ones(1), MU0 * np.ones(1),
                                 VAR0 * np.ones(1))
    np.random.seed(9)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=2, am_param_prior=prior,
        embedding_mats=embedding_mats, vec_ids_dict=vec_ids_dict,
        durations_dict=durations_dict, landmarks_dict=landmarks_dict,
        p_boundary_init=0.5, beta_sent_boundary=-1, n_slices_max=2,
        time_power_term=0.0, wip=0.0, batch_size=1, seed=9,
    )
    return seg, emb0


_PATTERNS2LM = {  # boundary pair -> list of (start, end_excl) segments
    (0, 1): [(0, 2)],
    (1, 1): [(0, 1), (1, 2)],
}


def _exact_annealed_move_kernel(seg, emb0, temp):
    """One gibbs_sample_i(0, anneal_temp=temp, anneal_gibbs_am=True) move
    from first principles.  Reference semantics: the backward draw tempers
    the per-step window distribution (unigram_acoustic_wordseg.py:733-741)
    and anneal_gibbs_am tempers each assignment draw (fbgmm.py:436-455);
    the forward filter itself is NOT annealed.  With one backward step the
    pattern distribution is exactly softmax(pattern_logp / temp)."""
    alpha, K = 1.0, 2
    counts = np.asarray(seg.acoustic_model.stats.counts).astype(float)
    sum_x = np.asarray(seg.acoustic_model.stats.sum_x)[:, 0].astype(float)
    assignments = np.asarray(seg.acoustic_model.assignments)
    old_embeds = [e for e in seg.utterances.get_segmented_embeds_i(0)
                  if e != -1]
    lo_counts, lo_sum_x = counts.copy(), sum_x.copy()
    for e in old_embeds:
        k = assignments[e]
        lo_counts[k] -= 1
        lo_sum_x[k] -= emb0[e, 0]

    def cand_score(e):
        x = emb0[e, 0]
        terms = []
        for k in range(K):
            w = (np.log(alpha / K + lo_counts[k])
                 - np.log(lo_counts.sum() + alpha))
            pred = (_pred_logpdf(x, lo_counts[k], lo_sum_x[k])
                    if lo_counts[k] > 0 else _prior_logpdf(x))
            terms.append(w + pred)
        return lse(terms)

    def embeds_of(p):
        return [_tri(e, s) for s, e in _PATTERNS2LM[p]]

    seg_logp = {p: sum(cand_score(e) for e in embeds_of(p))
                for p in _PATTERNS2LM}
    za = lse([v / temp for v in seg_logp.values()])

    probs = {}
    for p in _PATTERNS2LM:
        embeds = embeds_of(p)
        lp_pattern = seg_logp[p] / temp - za
        for ks in itertools.product(range(K), repeat=len(embeds)):
            c, sx = lo_counts.copy(), lo_sum_x.copy()
            lp_chain = 0.0
            for e, k in zip(embeds, ks):
                x = emb0[e, 0]
                logits = []
                for kk in range(K):
                    w = np.log(alpha / K + c[kk])
                    pred = (_pred_logpdf(x, c[kk], sx[kk]) if c[kk] > 0
                            else _prior_logpdf(x))
                    logits.append(w + pred)
                logits = np.asarray(logits) / temp
                lp_chain += logits[k] - lse(logits)
                c[k] += 1
                sx[k] += x
            probs[(p, ks)] = np.exp(lp_pattern + lp_chain)
    return probs


def test_annealed_single_move_transition_kernel():
    temp = 3.0
    seg, emb0 = _build_two_landmark_segmenter()
    am = seg.acoustic_model
    exact = _exact_annealed_move_kernel(seg, emb0, temp)
    assert abs(sum(exact.values()) - 1.0) < 1e-9
    # The annealed kernel must differ measurably from the unannealed one,
    # so this test cannot pass with temperature plumbing broken.
    exact_t1 = _exact_annealed_move_kernel(seg, emb0, 1.0)
    assert 0.5 * sum(abs(exact[k] - exact_t1[k]) for k in exact) > 0.05

    stats0, assign0 = am.stats, am.assignments
    bounds0 = seg._boundaries_dev

    n_trials = 4000
    freq = {key: 0 for key in exact}
    for t in range(n_trials):
        am.stats, am.assignments = stats0, assign0
        seg._boundaries_dev = bounds0
        am.key = jax.random.PRNGKey(70_000 + t)
        seg.gibbs_sample_i(0, anneal_temp=temp, anneal_gibbs_am=True)
        bounds = tuple(
            np.asarray(seg._boundaries_dev)[0, :2].astype(int).tolist()
        )
        embeds = [_tri(e, s) for s, e in _PATTERNS2LM[bounds]]
        ks = tuple(int(np.asarray(am.assignments)[e]) for e in embeds)
        freq[(bounds, ks)] += 1

    emp = {key: v / n_trials for key, v in freq.items()}
    tv = 0.5 * sum(abs(emp[key] - exact[key]) for key in exact)
    assert tv < 0.04, (
        tv,
        sorted(((key, round(exact[key], 4), round(emp[key], 4))
                for key in exact), key=lambda r: -r[1])[:8],
    )
    for key, p in exact.items():
        if p > 0.005:
            sigma = np.sqrt(p * (1 - p) / n_trials)
            assert abs(emp[key] - p) < 5 * sigma + 1e-9, (key, p, emp[key])


def test_viterbi_move_matches_argmax_oracle():
    """fb_type="viterbi" is fully deterministic: the move must pick the
    argmax-score segmentation (max-product DP over the enumerated patterns)
    and then MAP assignments with chained statistics (reference
    forward_backward_viterbi, unigram_acoustic_wordseg.py:759-864, and
    map_assign_i, fbgmm.py:465-494, which omits the lms scaling)."""
    alpha, K = 1.0, 2
    seg, emb0 = _build_two_utterance_segmenter()
    seg.set_fb_type("viterbi")
    am = seg.acoustic_model

    counts = np.asarray(am.stats.counts).astype(float)
    sum_x = np.asarray(am.stats.sum_x)[:, 0].astype(float)
    assignments = np.asarray(am.assignments)
    old_embeds = [e for e in seg.utterances.get_segmented_embeds_i(0)
                  if e != -1]
    lo_counts, lo_sum_x = counts.copy(), sum_x.copy()
    for e in old_embeds:
        k = assignments[e]
        lo_counts[k] -= 1
        lo_sum_x[k] -= emb0[e, 0]

    def cand_score(e):
        x = emb0[e, 0]
        terms = []
        for k in range(K):
            w = (np.log(alpha / K + lo_counts[k])
                 - np.log(lo_counts.sum() + alpha))
            pred = (_pred_logpdf(x, lo_counts[k], lo_sum_x[k])
                    if lo_counts[k] > 0 else _prior_logpdf(x))
            terms.append(w + pred)
        return lse(terms)

    best_p = max(_PATTERNS, key=lambda p: sum(cand_score(e)
                                              for e in _pattern_embeds(p)))
    c, sx = lo_counts.copy(), lo_sum_x.copy()
    best_ks = []
    for e in _pattern_embeds(best_p):
        x = emb0[e, 0]
        logits = []
        for kk in range(K):
            w = np.log(alpha / K + c[kk])
            pred = (_pred_logpdf(x, c[kk], sx[kk]) if c[kk] > 0
                    else _prior_logpdf(x))
            logits.append(w + pred)
        k = int(np.argmax(logits))
        best_ks.append(k)
        c[k] += 1
        sx[k] += x

    stats0, assign0 = am.stats, am.assignments
    bounds0 = seg._boundaries_dev
    for t in range(4):  # deterministic under any PRNG key
        am.stats, am.assignments = stats0, assign0
        seg._boundaries_dev = bounds0
        am.key = jax.random.PRNGKey(90_000 + t)
        seg.gibbs_sample_i(0)
        bounds = tuple(
            np.asarray(seg._boundaries_dev)[0, :3].astype(int).tolist()
        )
        assert bounds == best_p, (bounds, best_p)
        ks = [int(np.asarray(am.assignments)[e])
              for e in _pattern_embeds(bounds)]
        assert ks == best_ks, (ks, best_ks)
