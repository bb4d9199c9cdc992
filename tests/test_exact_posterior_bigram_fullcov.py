"""First-principles transition-kernel oracles for the two subtlest moves
(VERDICT round 2, item 3): the bigram-conditioned move with LM leave-out /
own-pair corrections, and the full-NIW touched-slot move.

Both clone the ``tests/test_exact_posterior.py`` pattern: a tiny corpus
where one ``gibbs_sample_i`` move's outcome distribution (segmentation x
assignments) is enumerable, with the oracle computing EVERYTHING -- the
LM count corrections (reference ``bigram_acoustic_wordseg.py:332-384``,
count removal :410/:496) and the NIW posterior-predictive algebra
(reference ``gaussian_components.py:228-251``) -- from scratch in numpy.
A bug shared by a Pallas kernel and its XLA fallback (e.g. in the
leave-out semantics itself) fails here even though kernel-vs-fallback
parity tests pass."""

import itertools

import jax
import numpy as np
from scipy.special import gammaln, logsumexp as lse

from segmentalist_tpu import FBGMM, FixedVarPrior, NIW
from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg
from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg

VAR, MU0, VAR0 = 0.5, 0.0, 2.0  # fixed-var prior (D=1), as the unigram test


def _tri(t_excl, start):
    return t_excl * (t_excl - 1) // 2 + start


def _pred_logpdf(x, n, sum_x):
    prec, prec0 = 1.0 / VAR, 1.0 / VAR0
    prec_n = prec0 + n * prec
    mu_pred = (prec0 * MU0 + prec * sum_x) / prec_n
    prec_pred = prec_n * prec / (prec_n + prec)
    return (-0.5 * np.log(2 * np.pi) + 0.5 * np.log(prec_pred)
            - 0.5 * prec_pred * (x - mu_pred) ** 2)


def _prior_logpdf(x):
    prec0 = 1.0 / VAR0
    return (-0.5 * np.log(2 * np.pi) + 0.5 * np.log(prec0)
            - 0.5 * prec0 * (x - MU0) ** 2)


# --------------------------------------------------------------------------
# Bigram move: LM leave-out + own-pair corrections, from first principles.

_PATTERNS3 = {  # boundary triple -> list of (start, end_excl) segments
    (0, 0, 1): [(0, 3)],
    (1, 0, 1): [(0, 1), (1, 3)],
    (0, 1, 1): [(0, 2), (2, 3)],
    (1, 1, 1): [(0, 1), (1, 2), (2, 3)],
}

LAM, A_S, B_S = 0.3, 1.5, 2.0  # intrp_lambda, a, b


def _pattern_embeds3(pattern):
    return [_tri(e, s) for s, e in _PATTERNS3[pattern]]


def _build_bigram_segmenter():
    rng = np.random.RandomState(5)
    emb0 = rng.randn(6, 1) * 1.2
    emb1 = np.array([[0.4], [-0.8], [1.0]])
    # Utterance 1: 2 landmarks -> 3 candidate spans, so its current
    # segmentation contributes real unigram AND bigram context counts.
    embedding_mats = {"u0": emb0, "u1": emb1}
    vec_ids_dict = {"u0": np.arange(6), "u1": np.arange(3)}
    durations_dict = {"u0": [1, 2, 1, 3, 2, 1], "u1": [1, 2, 1]}
    landmarks_dict = {"u0": [1, 2, 3], "u1": [1, 2]}
    prior = FixedVarPrior.create(VAR * np.ones(1), MU0 * np.ones(1),
                                 VAR0 * np.ones(1))
    np.random.seed(11)
    seg = BigramAcousticWordseg(
        am_K=2, am_param_prior=prior,
        lm_params={"type": "smooth", "intrp_lambda": LAM, "a": A_S,
                   "b": B_S},
        embedding_mats=embedding_mats, vec_ids_dict=vec_ids_dict,
        durations_dict=durations_dict, landmarks_dict=landmarks_dict,
        p_boundary_init=0.5, beta_sent_boundary=-1, n_slices_max=3,
        time_power_term=0.0, wip=0.0, batch_size=1, seed=11,
        fb_type="unigram",
    )
    return seg, emb0


def _transcripts(seg):
    """[utt][token] component transcript of the CURRENT segmentation."""
    seg._sync_boundaries_to_host()
    assigns = np.asarray(seg.acoustic_model.assignments)
    out = []
    for i in range(seg.utterances.D):
        ks = [assigns[e] for e in seg.utterances.get_segmented_embeds_i(i)
              if e != -1]
        out.append([int(k) for k in ks])
    return out


def _exact_bigram_move_kernel(seg, emb0):
    """Enumerate P(new boundaries, new assignments) of one
    gibbs_sample_i(0) move from the current state, from first principles:
    the LM counts (unigram + bigram tables) are recomputed from the
    transcripts, utterance 0's unigram counts are removed before scoring
    (reference :410) and its own OLD bigram pairs are removed on the fly
    inside the chain conditional (reference :361-368)."""
    K = 2
    counts = np.asarray(seg.acoustic_model.stats.counts).astype(float)
    sum_x = np.asarray(seg.acoustic_model.stats.sum_x)[:, 0].astype(float)
    assignments = np.asarray(seg.acoustic_model.assignments)
    trans = _transcripts(seg)

    # LM tables from scratch.
    uni = np.zeros(K)
    big = np.zeros((K, K))
    for t in trans:
        for k in t:
            uni[k] += 1
        for j, i in zip(t[:-1], t[1:]):
            big[j, i] += 1

    # Leave out utterance 0: AM stats + unigram counts; own OLD pairs kept
    # in `big` but listed for the on-the-fly correction.
    old_embeds = [e for e in seg.utterances.get_segmented_embeds_i(0)
                  if e != -1]
    lo_counts, lo_sum_x, lo_uni = counts.copy(), sum_x.copy(), uni.copy()
    for e in old_embeds:
        k = assignments[e]
        lo_counts[k] -= 1
        lo_sum_x[k] -= emb0[e, 0]
        lo_uni[k] -= 1
    own_pairs = list(zip(trans[0][:-1], trans[0][1:]))

    def uni_w(k):
        return np.log(lo_uni[k] + A_S / K) - np.log(lo_uni.sum() + A_S)

    def cand_score(e):
        """Unigram-marginal candidate score with leave-out LM weights
        (reference get_vec_embed_log_probs_unigram, :673-692)."""
        x = emb0[e, 0]
        terms = []
        for k in range(K):
            pred = (_pred_logpdf(x, lo_counts[k], lo_sum_x[k])
                    if lo_counts[k] > 0 else _prior_logpdf(x))
            terms.append(uni_w(k) + pred)
        return lse(terms)

    seg_logp = {p: sum(cand_score(e) for e in _pattern_embeds3(p))
                for p in _PATTERNS3}
    z = lse(list(seg_logp.values()))

    uni_prob = (lo_uni + A_S / K) / (lo_uni.sum() + A_S)

    def chain_weight(k, j_prev):
        if j_prev < 0:
            return uni_w(k)
        row = big[j_prev, k] - sum(
            1.0 for (j, i) in own_pairs if j == j_prev and i == k)
        p_cond = (LAM * uni_prob[k]
                  + (1.0 - LAM) * (row + B_S / K) / (lo_uni[j_prev] + B_S))
        return np.log(p_cond)

    probs = {}
    for p in _PATTERNS3:
        embeds = _pattern_embeds3(p)
        for ks in itertools.product(range(K), repeat=len(embeds)):
            c, sx = lo_counts.copy(), lo_sum_x.copy()
            j_prev = -1
            lp_chain = 0.0
            for e, k in zip(embeds, ks):
                x = emb0[e, 0]
                logits = []
                for kk in range(K):
                    pred = (_pred_logpdf(x, c[kk], sx[kk]) if c[kk] > 0
                            else _prior_logpdf(x))
                    logits.append(chain_weight(kk, j_prev) + pred)
                lp_chain += logits[k] - lse(logits)
                c[k] += 1
                sx[k] += x
                j_prev = k
            probs[(p, ks)] = np.exp(seg_logp[p] - z + lp_chain)
    return probs


def test_bigram_single_move_transition_kernel():
    seg, emb0 = _build_bigram_segmenter()
    am = seg.acoustic_model
    exact = _exact_bigram_move_kernel(seg, emb0)
    assert abs(sum(exact.values()) - 1.0) < 1e-9

    stats0, assign0 = am.stats, am.assignments
    bounds0 = seg._boundaries_dev
    lm0 = seg.lm.state

    n_trials = 4000
    freq = {key: 0 for key in exact}
    for t in range(n_trials):
        am.stats, am.assignments = stats0, assign0
        seg._boundaries_dev = bounds0
        seg.lm.state = lm0
        am.key = jax.random.PRNGKey(20_000 + t)
        seg.gibbs_sample_i(0)
        bounds = tuple(
            np.asarray(seg._boundaries_dev)[0, :3].astype(int).tolist()
        )
        embeds = _pattern_embeds3(bounds)
        ks = tuple(int(np.asarray(am.assignments)[e]) for e in embeds)
        freq[(bounds, ks)] += 1

    emp = {key: v / n_trials for key, v in freq.items()}
    tv = 0.5 * sum(abs(emp[key] - exact[key]) for key in exact)
    assert tv < 0.05, (
        tv,
        sorted(((key, round(exact[key], 4), round(emp[key], 4))
                for key in exact), key=lambda r: -r[1])[:8],
    )
    for key, p in exact.items():
        if p > 0.005:
            sigma = np.sqrt(p * (1 - p) / n_trials)
            assert abs(emp[key] - p) < 5 * sigma + 1e-9, (key, p, emp[key])


# --------------------------------------------------------------------------
# Full-NIW move: touched-slot machinery vs a from-scratch NIW oracle.

D_F = 2
K0_F, V0_F = 1.0, float(D_F) + 2.0
ALPHA_F = 1.0

_PATTERNS2 = {
    (0, 1): [(0, 2)],
    (1, 1): [(0, 1), (1, 2)],
}


def _pattern_embeds2(pattern):
    return [_tri(e, s) for s, e in _PATTERNS2[pattern]]


def _niw_params():
    m_0 = np.array([0.1, -0.2])
    S_0 = np.eye(D_F) + 0.15 * np.ones((D_F, D_F))
    return m_0, S_0


def _mvt_logpdf(x, mu, covar, v):
    dev = x - mu
    inv = np.linalg.inv(covar)
    _, logdet = np.linalg.slogdet(covar)
    maha = dev @ inv @ dev
    return (gammaln((v + D_F) / 2.0) - gammaln(v / 2.0)
            - D_F / 2.0 * np.log(v) - D_F / 2.0 * np.log(np.pi)
            - 0.5 * logdet - (v + D_F) / 2.0 * np.log1p(maha / v))


def _niw_pred_logpdf(x, n, sum_x, sum_sq):
    """NIW posterior predictive from raw statistics (reference
    gaussian_components.py:161-167, :216-251)."""
    m_0, S_0 = _niw_params()
    k_n = K0_F + n
    v_n = V0_F + n
    m_n = (K0_F * m_0 + sum_x) / k_n
    S_n = (S_0 + K0_F * np.outer(m_0, m_0) + sum_sq
           - k_n * np.outer(m_n, m_n))
    v = v_n - D_F + 1.0
    covar = (k_n + 1.0) / (k_n * v) * S_n
    return _mvt_logpdf(x, m_n, covar, v)


def _build_fullcov_segmenter():
    rng = np.random.RandomState(9)
    emb0 = rng.randn(3, D_F) * 1.1
    emb1 = rng.randn(3, D_F) * 0.9
    embedding_mats = {"u0": emb0, "u1": emb1}
    vec_ids_dict = {"u0": np.arange(3), "u1": np.arange(3)}
    durations_dict = {"u0": [1, 2, 1], "u1": [1, 2, 1]}
    landmarks_dict = {"u0": [1, 2], "u1": [1, 2]}
    m_0, S_0 = _niw_params()
    prior = NIW.create(m_0, K0_F, V0_F, S_0)
    np.random.seed(13)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=ALPHA_F, am_K=2, am_param_prior=prior,
        embedding_mats=embedding_mats, vec_ids_dict=vec_ids_dict,
        durations_dict=durations_dict, landmarks_dict=landmarks_dict,
        covariance_type="full", p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=2, time_power_term=0.0, wip=0.0, batch_size=1,
        seed=13,
    )
    return seg, emb0


def _exact_fullcov_move_kernel(seg, emb0):
    """Enumerate the gibbs_sample_i(0) outcome distribution with all NIW
    algebra (leave-out statistics, predictive chaining) done directly on
    raw moment statistics -- independent of the touched-component
    machinery under test (segmenters/fullcov.py)."""
    K = 2
    X_all = np.asarray(seg.acoustic_model.X)
    counts = np.asarray(seg.acoustic_model.stats.counts).astype(float)
    assignments = np.asarray(seg.acoustic_model.assignments)
    # Raw moment statistics from the assignment vector itself.
    sum_x = np.zeros((K, D_F))
    sum_sq = np.zeros((K, D_F, D_F))
    for i, k in enumerate(assignments):
        if k >= 0:
            sum_x[k] += X_all[i]
            sum_sq[k] += np.outer(X_all[i], X_all[i])

    old_embeds = [e for e in seg.utterances.get_segmented_embeds_i(0)
                  if e != -1]
    lo_c, lo_sx, lo_sq = counts.copy(), sum_x.copy(), sum_sq.copy()
    for e in old_embeds:
        k = assignments[e]
        lo_c[k] -= 1
        lo_sx[k] -= emb0[e]
        lo_sq[k] -= np.outer(emb0[e], emb0[e])

    def pred(x, k, c, sx, sq):
        if c[k] > 0:
            return _niw_pred_logpdf(x, c[k], sx[k], sq[k])
        return _niw_pred_logpdf(x, 0.0, np.zeros(D_F),
                                np.zeros((D_F, D_F)))

    def cand_score(e):
        x = emb0[e]
        terms = []
        for k in range(K):
            w = (np.log(ALPHA_F / K + lo_c[k])
                 - np.log(lo_c.sum() + ALPHA_F))
            terms.append(w + pred(x, k, lo_c, lo_sx, lo_sq))
        return lse(terms)

    seg_logp = {p: sum(cand_score(e) for e in _pattern_embeds2(p))
                for p in _PATTERNS2}
    z = lse(list(seg_logp.values()))

    probs = {}
    for p in _PATTERNS2:
        embeds = _pattern_embeds2(p)
        for ks in itertools.product(range(K), repeat=len(embeds)):
            c, sx, sq = lo_c.copy(), lo_sx.copy(), lo_sq.copy()
            lp_chain = 0.0
            for e, k in zip(embeds, ks):
                x = emb0[e]
                logits = []
                for kk in range(K):
                    w = np.log(ALPHA_F / K + c[kk])
                    logits.append(w + pred(x, kk, c, sx, sq))
                lp_chain += logits[k] - lse(logits)
                c[k] += 1
                sx[k] += x
                sq[k] += np.outer(x, x)
            probs[(p, ks)] = np.exp(seg_logp[p] - z + lp_chain)
    return probs


def test_fullcov_single_move_transition_kernel():
    seg, emb0 = _build_fullcov_segmenter()
    am = seg.acoustic_model
    exact = _exact_fullcov_move_kernel(seg, emb0)
    assert abs(sum(exact.values()) - 1.0) < 1e-9

    stats0, assign0 = am.stats, am.assignments
    bounds0 = seg._boundaries_dev

    n_trials = 4000
    freq = {key: 0 for key in exact}
    for t in range(n_trials):
        am.stats, am.assignments = stats0, assign0
        seg._boundaries_dev = bounds0
        am.key = jax.random.PRNGKey(30_000 + t)
        seg.gibbs_sample_i(0)
        bounds = tuple(
            np.asarray(seg._boundaries_dev)[0, :2].astype(int).tolist()
        )
        embeds = _pattern_embeds2(bounds)
        ks = tuple(int(np.asarray(am.assignments)[e]) for e in embeds)
        freq[(bounds, ks)] += 1

    emp = {key: v / n_trials for key, v in freq.items()}
    tv = 0.5 * sum(abs(emp[key] - exact[key]) for key in exact)
    assert tv < 0.05, (
        tv,
        sorted(((key, round(exact[key], 4), round(emp[key], 4))
                for key in exact), key=lambda r: -r[1])[:8],
    )
    for key, p in exact.items():
        if p > 0.005:
            sigma = np.sqrt(p * (1 - p) / n_trials)
            assert abs(emp[key] - p) < 5 * sigma + 1e-9, (key, p, emp[key])


def test_fullcov_viterbi_move_matches_argmax_oracle():
    """fb_type="viterbi" with the full-NIW backend is fully deterministic:
    argmax-score segmentation then MAP chained assignments (map_assign_i
    omits the lms scaling and the weight denominator, reference
    fbgmm.py:465-494).  Completes the per-backend Viterbi oracle row
    (fixed-var: test_exact_posterior.py; diag: test_exact_posterior_diag)
    and pins the full-cov corrected-scoring + use_argmax chain path."""
    K = 2
    seg, emb0 = _build_fullcov_segmenter()
    seg.set_fb_type("viterbi")
    am = seg.acoustic_model

    X_all = np.asarray(am.X)
    counts = np.asarray(am.stats.counts).astype(float)
    assignments = np.asarray(am.assignments)
    sum_x = np.zeros((K, D_F))
    sum_sq = np.zeros((K, D_F, D_F))
    for i, k in enumerate(assignments):
        if k >= 0:
            sum_x[k] += X_all[i]
            sum_sq[k] += np.outer(X_all[i], X_all[i])
    old_embeds = [e for e in seg.utterances.get_segmented_embeds_i(0)
                  if e != -1]
    lo_c, lo_sx, lo_sq = counts.copy(), sum_x.copy(), sum_sq.copy()
    for e in old_embeds:
        k = assignments[e]
        lo_c[k] -= 1
        lo_sx[k] -= emb0[e]
        lo_sq[k] -= np.outer(emb0[e], emb0[e])

    def pred(x, k, c, sx, sq):
        if c[k] > 0:
            return _niw_pred_logpdf(x, c[k], sx[k], sq[k])
        return _niw_pred_logpdf(x, 0.0, np.zeros(D_F),
                                np.zeros((D_F, D_F)))

    def cand_score(e):
        x = emb0[e]
        return lse([
            np.log(ALPHA_F / K + lo_c[k]) - np.log(lo_c.sum() + ALPHA_F)
            + pred(x, k, lo_c, lo_sx, lo_sq) for k in range(K)
        ])

    best_p = max(_PATTERNS2,
                 key=lambda p: sum(cand_score(e)
                                   for e in _pattern_embeds2(p)))
    c, sx, sq = lo_c.copy(), lo_sx.copy(), lo_sq.copy()
    best_ks = []
    for e in _pattern_embeds2(best_p):
        x = emb0[e]
        logits = [np.log(ALPHA_F / K + c[kk]) + pred(x, kk, c, sx, sq)
                  for kk in range(K)]
        k = int(np.argmax(logits))
        best_ks.append(k)
        c[k] += 1
        sx[k] += x
        sq[k] += np.outer(x, x)

    stats0, assign0 = am.stats, am.assignments
    bounds0 = seg._boundaries_dev
    for t in range(4):  # deterministic under any PRNG key
        am.stats, am.assignments = stats0, assign0
        seg._boundaries_dev = bounds0
        am.key = jax.random.PRNGKey(91_000 + t)
        seg.gibbs_sample_i(0)
        bounds = tuple(
            np.asarray(seg._boundaries_dev)[0, :2].astype(int).tolist()
        )
        assert bounds == best_p, (bounds, best_p)
        ks = [int(np.asarray(am.assignments)[e])
              for e in _pattern_embeds2(bounds)]
        assert ks == best_ks, (ks, best_ks)
