"""First-principles transition-kernel oracle for the diag-covariance move.

Completes the per-family oracle matrix (fixed-var: test_exact_posterior.py;
bigram + full-NIW: test_exact_posterior_bigram_fullcov.py): a tiny corpus
where one ``gibbs_sample_i`` move's outcome distribution (segmentation x
assignments) is enumerable, with the oracle computing the
normal-inverse-chi-squared posterior-predictive algebra -- products of
univariate Student-t densities from raw moment statistics (reference
``gaussian_components_diag.py:237-259, :347-360``) -- from scratch in
numpy.  A bug shared by the diag Pallas chain kernel and its
Stirling-twin XLA fallback (e.g. in the leave-out semantics) fails here
even though kernel-vs-fallback parity tests pass.
"""
import itertools

import jax
import numpy as np
from scipy.special import gammaln, logsumexp as lse

from segmentalist_tpu import FBGMM, NIW
from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg

D_D = 2
K0_D, V0_D = 1.2, 4.0
ALPHA_D = 1.0

_PATTERNS2 = {  # boundary pair -> list of (start, end_excl) segments
    (0, 1): [(0, 2)],
    (1, 1): [(0, 1), (1, 2)],
}


def _tri(t_excl, start):
    return t_excl * (t_excl - 1) // 2 + start


def _pattern_embeds2(pattern):
    return [_tri(e, s) for s, e in _PATTERNS2[pattern]]


def _diag_params():
    m_0 = np.array([0.15, -0.3])
    S_0 = np.array([0.8, 1.3])
    return m_0, S_0


def _t_logpdf(x, mu, var, v):
    """Univariate Student-t with dof v, location mu, scale^2 var."""
    dev2 = (x - mu) ** 2 / var
    return (gammaln((v + 1.0) / 2.0) - gammaln(v / 2.0)
            - 0.5 * np.log(v) - 0.5 * np.log(np.pi) - 0.5 * np.log(var)
            - (v + 1.0) / 2.0 * np.log1p(dev2 / v))


def _diag_pred_logpdf(x, n, sum_x, sum_sq):
    """Normal-inverse-chi-squared posterior predictive from raw per-dim
    statistics: a product of univariate Student-t's (reference
    gaussian_components_diag.py:237-259)."""
    m_0, S_0 = _diag_params()
    k_n = K0_D + n
    v_n = V0_D + n
    m_n = (K0_D * m_0 + sum_x) / k_n
    s_n = S_0 + K0_D * m_0 ** 2 + sum_sq - k_n * m_n ** 2
    var = (k_n + 1.0) / (k_n * v_n) * s_n
    return sum(_t_logpdf(x[d], m_n[d], var[d], v_n) for d in range(D_D))


def _build_diag_segmenter():
    rng = np.random.RandomState(17)
    emb0 = rng.randn(3, D_D) * 1.1
    emb1 = rng.randn(3, D_D) * 0.9
    embedding_mats = {"u0": emb0, "u1": emb1}
    vec_ids_dict = {"u0": np.arange(3), "u1": np.arange(3)}
    durations_dict = {"u0": [1, 2, 1], "u1": [1, 2, 1]}
    landmarks_dict = {"u0": [1, 2], "u1": [1, 2]}
    m_0, S_0 = _diag_params()
    prior = NIW.create(m_0, K0_D, V0_D, S_0)
    np.random.seed(23)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=ALPHA_D, am_K=2, am_param_prior=prior,
        embedding_mats=embedding_mats, vec_ids_dict=vec_ids_dict,
        durations_dict=durations_dict, landmarks_dict=landmarks_dict,
        covariance_type="diag", p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=2, time_power_term=0.0, wip=0.0, batch_size=1,
        seed=23,
    )
    return seg, emb0


def _exact_diag_move_kernel(seg, emb0):
    """Enumerate the gibbs_sample_i(0) outcome distribution with all the
    inverse-chi-squared algebra (leave-out statistics, predictive chaining)
    done directly on raw per-dim moment statistics."""
    K = 2
    X_all = np.asarray(seg.acoustic_model.X)
    counts = np.asarray(seg.acoustic_model.stats.counts).astype(float)
    assignments = np.asarray(seg.acoustic_model.assignments)
    sum_x = np.zeros((K, D_D))
    sum_sq = np.zeros((K, D_D))
    for i, k in enumerate(assignments):
        if k >= 0:
            sum_x[k] += X_all[i]
            sum_sq[k] += X_all[i] ** 2

    old_embeds = [e for e in seg.utterances.get_segmented_embeds_i(0)
                  if e != -1]
    lo_c, lo_sx, lo_sq = counts.copy(), sum_x.copy(), sum_sq.copy()
    for e in old_embeds:
        k = assignments[e]
        lo_c[k] -= 1
        lo_sx[k] -= emb0[e]
        lo_sq[k] -= emb0[e] ** 2

    def pred(x, k, c, sx, sq):
        if c[k] > 0:
            return _diag_pred_logpdf(x, c[k], sx[k], sq[k])
        return _diag_pred_logpdf(x, 0.0, np.zeros(D_D), np.zeros(D_D))

    def cand_score(e):
        x = emb0[e]
        terms = []
        for k in range(K):
            w = (np.log(ALPHA_D / K + lo_c[k])
                 - np.log(lo_c.sum() + ALPHA_D))
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
                    w = np.log(ALPHA_D / K + c[kk])
                    logits.append(w + pred(x, kk, c, sx, sq))
                lp_chain += logits[k] - lse(logits)
                c[k] += 1
                sx[k] += x
                sq[k] += x ** 2
            probs[(p, ks)] = np.exp(seg_logp[p] - z + lp_chain)
    return probs


def test_diag_single_move_transition_kernel():
    seg, emb0 = _build_diag_segmenter()
    am = seg.acoustic_model
    exact = _exact_diag_move_kernel(seg, emb0)
    assert abs(sum(exact.values()) - 1.0) < 1e-9

    stats0, assign0 = am.stats, am.assignments
    bounds0 = seg._boundaries_dev

    n_trials = 4000
    freq = {key: 0 for key in exact}
    for t in range(n_trials):
        am.stats, am.assignments = stats0, assign0
        seg._boundaries_dev = bounds0
        am.key = jax.random.PRNGKey(50_000 + t)
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


def test_diag_viterbi_move_matches_argmax_oracle():
    """fb_type="viterbi" with the diag backend is fully deterministic: the
    move must pick the argmax-score segmentation (max-product DP over the
    enumerated patterns) then MAP assignments with chained statistics
    (map_assign_i omits the lms scaling and the weight denominator,
    reference fbgmm.py:465-494).  Covers the Viterbi diag scoring path,
    which is gated to the EXACT per-dim Student-t composition on every
    backend (the grouped-product kernel's ~3.3e-3 hardware deviation must
    not feed a deterministic argmax; ``fused_ok`` in
    segmenters/unigram.py)."""
    K = 2
    seg, emb0 = _build_diag_segmenter()
    seg.set_fb_type("viterbi")
    am = seg.acoustic_model

    X_all = np.asarray(am.X)
    counts = np.asarray(am.stats.counts).astype(float)
    assignments = np.asarray(am.assignments)
    sum_x = np.zeros((K, D_D))
    sum_sq = np.zeros((K, D_D))
    for i, k in enumerate(assignments):
        if k >= 0:
            sum_x[k] += X_all[i]
            sum_sq[k] += X_all[i] ** 2
    old_embeds = [e for e in seg.utterances.get_segmented_embeds_i(0)
                  if e != -1]
    lo_c, lo_sx, lo_sq = counts.copy(), sum_x.copy(), sum_sq.copy()
    for e in old_embeds:
        k = assignments[e]
        lo_c[k] -= 1
        lo_sx[k] -= emb0[e]
        lo_sq[k] -= emb0[e] ** 2

    def pred(x, k, c, sx, sq):
        if c[k] > 0:
            return _diag_pred_logpdf(x, c[k], sx[k], sq[k])
        return _diag_pred_logpdf(x, 0.0, np.zeros(D_D), np.zeros(D_D))

    def cand_score(e):
        x = emb0[e]
        return lse([
            np.log(ALPHA_D / K + lo_c[k]) - np.log(lo_c.sum() + ALPHA_D)
            + pred(x, k, lo_c, lo_sx, lo_sq) for k in range(K)
        ])

    best_p = max(_PATTERNS2,
                 key=lambda p: sum(cand_score(e)
                                   for e in _pattern_embeds2(p)))
    c, sx, sq = lo_c.copy(), lo_sx.copy(), lo_sq.copy()
    best_ks = []
    for e in _pattern_embeds2(best_p):
        x = emb0[e]
        logits = [np.log(ALPHA_D / K + c[kk]) + pred(x, kk, c, sx, sq)
                  for kk in range(K)]
        k = int(np.argmax(logits))
        best_ks.append(k)
        c[k] += 1
        sx[k] += x
        sq[k] += x ** 2

    stats0, assign0 = am.stats, am.assignments
    bounds0 = seg._boundaries_dev
    for t in range(4):  # deterministic under any PRNG key
        am.stats, am.assignments = stats0, assign0
        seg._boundaries_dev = bounds0
        am.key = jax.random.PRNGKey(90_000 + t)
        seg.gibbs_sample_i(0)
        bounds = tuple(
            np.asarray(seg._boundaries_dev)[0, :2].astype(int).tolist()
        )
        assert bounds == best_p, (bounds, best_p)
        ks = [int(np.asarray(am.assignments)[e])
              for e in _pattern_embeds2(bounds)]
        assert ks == best_ks, (ks, best_ks)
