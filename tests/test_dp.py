"""DP kernel checks against an independent numpy oracle.

The oracle re-implements the documented recursion of the reference DP
(forward filtering over prefix lengths with a [n_slices_min, n_slices_max]
segment-length window; backward max-decoding) directly from the dense
[N, W] score layout, so agreement checks both the math and the layout
conversion.
"""

import numpy as np
import numpy.testing as npt
import jax
import jax.numpy as jnp

from segmentalist_tpu.ops.dp import segment_dp

NEG_INF = -np.inf


def oracle_viterbi(scores, length, n_min, n_max):
    """Max-product segmentation on dense scores[t, w]; returns (score, bounds)."""
    n_min = max(n_min, 1)
    alpha = np.full(length + 1, NEG_INF)
    alpha[0] = 0.0
    back = np.zeros(length + 1, dtype=int)
    for t in range(1, length + 1):
        best, best_k = NEG_INF, 0
        for k in range(n_min, n_max + 1):
            if k > t:
                break
            v = scores[t - 1, k - 1] + alpha[t - k]
            # Tie-break toward shorter segments, like the reference argmax
            # over the ascending-length window.
            if v > best:
                best, best_k = v, k
        alpha[t] = best
        back[t] = best_k
    bounds = np.zeros(scores.shape[0], dtype=bool)
    bounds[length - 1] = True
    t = length
    total = 0.0
    while t > 0:
        k = back[t]
        total += scores[t - 1, k - 1]
        if t - k - 1 >= 0:
            bounds[t - k - 1] = True
        t -= k
    return total, bounds


def _random_scores(rng, B, N_max, W, lengths):
    scores = rng.randn(B, N_max, W) * 3.0
    for b in range(B):
        for t in range(N_max):
            for w in range(W):
                if w > t or t >= lengths[b]:
                    scores[b, t, w] = NEG_INF
    return scores


def test_viterbi_matches_oracle():
    rng = np.random.RandomState(0)
    B, N_max, W = 5, 9, 4
    lengths = np.array([9, 7, 4, 1, 6])
    scores = _random_scores(rng, B, N_max, W, lengths)
    log_probs, bounds = segment_dp(
        jnp.asarray(scores), jnp.asarray(lengths), jax.random.PRNGKey(0),
        n_slices_min=0, n_slices_max=W, mode="viterbi",
    )
    for b in range(B):
        exp_score, exp_bounds = oracle_viterbi(scores[b], lengths[b], 0, W)
        npt.assert_allclose(float(log_probs[b]), exp_score, rtol=1e-6)
        npt.assert_array_equal(np.asarray(bounds[b]), exp_bounds)


def test_viterbi_with_min_slices():
    rng = np.random.RandomState(1)
    B, N_max, W = 4, 8, 5
    lengths = np.array([8, 8, 5, 3])
    scores = _random_scores(rng, B, N_max, W, lengths)
    log_probs, bounds = segment_dp(
        jnp.asarray(scores), jnp.asarray(lengths), jax.random.PRNGKey(0),
        n_slices_min=2, n_slices_max=W, mode="viterbi",
    )
    for b in range(B):
        exp_score, exp_bounds = oracle_viterbi(scores[b], lengths[b], 2, W)
        npt.assert_allclose(float(log_probs[b]), exp_score, rtol=1e-6)
        npt.assert_array_equal(np.asarray(bounds[b]), exp_bounds)
        # All resulting segments within [min, max] length, except possibly a
        # leading remainder, as in the reference.
        idx = np.where(np.asarray(bounds[b])[: lengths[b]])[0]
        spans = np.diff(np.concatenate([[-1], idx]))
        assert np.all(spans[1:] >= 2)


def test_ffbs_boundary_distribution():
    """FFBS must sample segmentations proportionally to their total score.

    Two landmarks, W = 2: segmentations are {[0,1],[1,2]} (boundary at 0) and
    {[0,2]} (no boundary at 0).  With hand-set scores the odds are computable
    in closed form.
    """
    s01 = 1.0   # segment [0:1]
    s12 = 0.3   # segment [1:2]
    s02 = 1.5   # segment [0:2]
    scores = np.full((1, 2, 2), NEG_INF)
    scores[0, 0, 0] = s01
    scores[0, 1, 0] = s12
    scores[0, 1, 1] = s02
    p_split = np.exp(s01 + s12) / (np.exp(s01 + s12) + np.exp(s02))

    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    batch_scores = jnp.asarray(np.repeat(scores, n, axis=0))
    lengths = jnp.full((n,), 2, dtype=jnp.int32)

    log_probs, bounds = segment_dp(
        batch_scores, lengths, jax.random.PRNGKey(7),
        n_slices_min=0, n_slices_max=2, mode="sample",
    )
    frac_split = float(jnp.mean(bounds[:, 0].astype(jnp.float32)))
    assert abs(frac_split - p_split) < 0.03, (frac_split, p_split)
    # log_prob bookkeeping: equals the sum of chosen segment scores.
    expected = np.where(np.asarray(bounds[:, 0]), s01 + s12, s02)
    npt.assert_allclose(np.asarray(log_probs), expected, rtol=1e-6)


def test_backtracking_fallback():
    """When continuations are impossible, a boundary is force-inserted
    (reference unigram_acoustic_wordseg.py:718-730)."""
    # length 3; only segment [2:3] (t=3,len=1) and [0:1] are scorable, and
    # nothing covers landmark 1 -> position t=2 is a dead end: backward must
    # backtrack from t=2 and insert a boundary.
    scores = np.full((1, 3, 2), NEG_INF)
    scores[0, 2, 0] = 0.5   # segment [2:3]
    scores[0, 0, 0] = 0.2   # segment [0:1]
    log_probs, bounds = segment_dp(
        jnp.asarray(scores), jnp.asarray([3]), jax.random.PRNGKey(0),
        n_slices_min=0, n_slices_max=2, mode="sample",
    )
    b = np.asarray(bounds[0])
    assert b[2]  # final boundary always set
    # After consuming [2:3], t=2 has no valid continuation; fallback walks to
    # t=1 (samplable via segment [0:1]) and inserts boundary at t-1 = 0.
    assert b[1] or b[0]


def test_pallas_forward_matches_xla():
    """The Pallas forward kernel (interpret mode on CPU) must agree with the
    portable XLA forward filter."""
    from segmentalist_tpu.ops.dp import _forward_xla, _rev_mask_scores
    from segmentalist_tpu.ops.pallas_dp import forward_alphas

    rng = np.random.RandomState(3)
    B, N_max, W = 7, 11, 4
    lengths = np.array([11, 8, 4, 1, 6, 11, 2])
    scores = _random_scores(rng, B, N_max, W, lengths).astype(np.float32)
    rev = _rev_mask_scores(jnp.asarray(scores), 0)
    lens = jnp.asarray(lengths, dtype=jnp.int32)
    for use_max in (False, True):
        ref = _forward_xla(rev, lens, jnp.float32(-0.1), use_max)
        pal = forward_alphas(rev, lens, jnp.float32(-0.1), use_max=use_max,
                             interpret=True)
        npt.assert_allclose(np.asarray(pal), np.asarray(ref), rtol=1e-5,
                            atol=1e-5)


def test_sample_mode_pallas_path_matches_xla_path():
    """segment_dp with the Pallas forward must produce identical samples to
    the XLA forward under the same key (the backward draws are a pure
    function of the alpha table)."""
    rng = np.random.RandomState(4)
    B, N_max, W = 6, 10, 5
    lengths = np.array([10, 7, 3, 10, 5, 9])
    scores = _random_scores(rng, B, N_max, W, lengths).astype(np.float32)
    key = jax.random.PRNGKey(11)
    lp_a, b_a = segment_dp(jnp.asarray(scores), jnp.asarray(lengths), key,
                           -0.05, 1.0, n_slices_min=0, n_slices_max=W,
                           mode="sample", use_pallas=False)
    lp_b, b_b = segment_dp(jnp.asarray(scores), jnp.asarray(lengths), key,
                           -0.05, 1.0, n_slices_min=0, n_slices_max=W,
                           mode="sample", use_pallas=True)
    npt.assert_allclose(np.asarray(lp_a), np.asarray(lp_b), rtol=1e-5)
    npt.assert_array_equal(np.asarray(b_a), np.asarray(b_b))


def test_ffbs_full_distribution_three_landmarks():
    """Exhaustive check: sampled segmentation frequencies match the exact
    posterior over all 4 segmentations of a 3-landmark utterance."""
    rng = np.random.RandomState(5)
    N, W = 3, 3
    scores = rng.randn(N, W).astype(np.float64)
    for t in range(N):
        for w in range(W):
            if w > t:
                scores[t, w] = NEG_INF
    # Enumerate segmentations as boundary patterns over positions 0,1
    # (position 2 always a boundary).
    segs = {}
    for b0 in (False, True):
        for b1 in (False, True):
            bounds = [b0, b1, True]
            total, start = 0.0, 0
            ok = True
            for t, is_b in enumerate(bounds):
                if is_b:
                    w = t - start
                    if w >= W or not np.isfinite(scores[t, w]):
                        ok = False
                        break
                    total += scores[t, w]
                    start = t + 1
            if ok:
                segs[(b0, b1)] = total
    Z = sum(np.exp(v) for v in segs.values())
    expected = {kk: np.exp(v) / Z for kk, v in segs.items()}

    n = 8000
    batch = jnp.asarray(np.repeat(scores[None], n, axis=0))
    lengths = jnp.full((n,), N, dtype=jnp.int32)
    _, bounds = segment_dp(batch, lengths, jax.random.PRNGKey(3),
                           0.0, 1.0, n_slices_min=0, n_slices_max=W,
                           mode="sample")
    bounds = np.asarray(bounds)
    for (b0, b1), pexp in expected.items():
        frac = np.mean((bounds[:, 0] == b0) & (bounds[:, 1] == b1))
        assert abs(frac - pexp) < 0.025, ((b0, b1), frac, pexp)


def test_module_level_forward_backward_triangular_api():
    """The reference-layout module functions (packed triangular input,
    unigram_acoustic_wordseg.py:653-864, kmeans_acoustic_wordseg.py:449-555)
    agree with brute-force enumeration over all segmentations."""
    import itertools

    from segmentalist_tpu.segmenters.kmeans_seg import (
        forward_backward_kmeans_viterbi,
    )
    from segmentalist_tpu.segmenters.unigram import (
        forward_backward,
        forward_backward_viterbi,
    )

    rng = np.random.RandomState(0)
    N, W = 4, 3
    T = N * (N + 1) // 2
    vec = rng.randn(T) * 2.0

    def tri(t_excl, start):
        return t_excl * (t_excl - 1) // 2 + start

    def seg_score(pattern):  # pattern: boundary bools, last True
        total, j_prev, n_seg = 0.0, 0, 0
        for j, b in enumerate(pattern):
            if b:
                if j - j_prev + 1 > W:
                    return -np.inf, 0
                total += vec[tri(j + 1, j_prev)]
                j_prev = j + 1
                n_seg += 1
        return total, n_seg

    patterns = [p + (True,) for p in
                itertools.product([False, True], repeat=N - 1)]
    scored = {p: seg_score(p) for p in patterns}
    best = max(patterns, key=lambda p: scored[p][0])

    # Viterbi matches the brute-force argmax (and its score).
    lp, bounds = forward_backward_viterbi(vec, 0.0, N, n_slices_max=W)
    assert tuple(bounds[:N].tolist()) == best
    npt.assert_allclose(lp, scored[best][0], rtol=1e-6)

    # K-means variant: same max-product semantics.
    obj, bounds_km = forward_backward_kmeans_viterbi(vec, N, n_slices_max=W)
    assert tuple(bounds_km[:N].tolist()) == best
    npt.assert_allclose(obj, scored[best][0], rtol=1e-6)

    # FFBS sampling distribution matches the enumerated target, including
    # the per-segment log_p_continue term.
    lpc = np.log(0.7)
    logp = np.array([
        scored[p][0] + scored[p][1] * lpc if np.isfinite(scored[p][0])
        else -np.inf
        for p in patterns
    ])
    target = np.exp(logp - logp.max())
    target /= target.sum()
    n_draws = 3000
    freq = {p: 0 for p in patterns}
    for t in range(n_draws):
        _, b = forward_backward(vec, lpc, N, n_slices_max=W,
                                key=jax.random.PRNGKey(t))
        freq[tuple(b[:N].tolist())] += 1
    emp = np.array([freq[p] / n_draws for p in patterns])
    assert 0.5 * np.abs(emp - target).sum() < 0.05, (emp, target)
