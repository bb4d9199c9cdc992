"""Bigram LM + bigram segmenter tests.

The LM checks are exact algebraic identities ported from the reference
(tests/test_bigram_lms.py:13-74); the segmenter checks are end-to-end runs of
the reference demo corpus (bigram_acoustic_wordseg.py:765-857).
"""

import numpy as np
import numpy.testing as npt
import pytest

from segmentalist_tpu.models.bigram_lm import BigramSmoothLM
from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg
from segmentalist_tpu.priors import FixedVarPrior


def test_lm_identities():
    intrp_lambda, a, b, K = 0.1, 1, 2, 5
    lm = BigramSmoothLM(intrp_lambda, a, b, K)
    data = [
        [1, 1, 3, 4, 0],
        [4, 4],
        [1, 0, 2, 2, 2, 2, 3, 1],
        [3, 3, 1],
    ]
    lm.counts_from_data(data)

    npt.assert_allclose(
        lm.prob_i_given_j(1, 3),
        intrp_lambda * lm.prob_i(1) + (1 - intrp_lambda) * (2.0 + b / K) / (4 + b),
        rtol=1e-12,
    )
    npt.assert_allclose(lm.prob_i(1), (5.0 + a / K) / (18 + a), rtol=1e-12)
    pv = lm.prob_vec_i()
    for i in range(K):
        npt.assert_allclose(pv[i], lm.prob_i(i), rtol=1e-12)
    pj = lm.prob_vec_given_j(3)
    for i in range(K):
        npt.assert_allclose(pj[i], lm.prob_i_given_j(i, 3), rtol=1e-12)
    npt.assert_allclose(lm.log_prob_vec_i(), np.log(pv), rtol=1e-12)


def test_lm_add_remove_roundtrip():
    lm = BigramSmoothLM(0.2, 1.0, 2.0, 4)
    lm.counts_from_utterance([0, 1, 1, 3])
    lm.counts_from_utterance([2, 0])
    uni0 = lm.unigram_counts.copy()
    big0 = lm.bigram_counts.copy()
    lm.counts_from_utterance([3, 3, 1])
    lm.remove_counts_from_utterance([3, 3, 1])
    npt.assert_array_equal(lm.unigram_counts, uni0)
    npt.assert_array_equal(lm.bigram_counts, big0)
    # -1 pads carry context over, like the reference's `continue`.
    lm2 = BigramSmoothLM(0.2, 1.0, 2.0, 4)
    lm2.counts_from_utterance([0, 1, 3])
    lm3 = BigramSmoothLM(0.2, 1.0, 2.0, 4)
    lm3.counts_from_utterance([0, -1, 1, -1, 3, -1])
    npt.assert_array_equal(lm2.bigram_counts, lm3.bigram_counts)


def _demo_corpus():
    """Reference demo (bigram_acoustic_wordseg.py:771-817)."""
    embedding_mat1 = np.array(
        [[1.55329044, 0.82568932, 0.56011276],
         [1.10640768, -0.41715366, 0.30323529],
         [1.24183824, -2.39021548, 0.02369367],
         [1.26094544, -0.27567053, 1.35731148],
         [1.59711416, -0.54917262, -0.56074459],
         [-0.4298405, 1.39010761, -1.2608597]], dtype=np.float64)
    embedding_mat2 = np.array(
        [[1.63075195, 0.25297823, -1.75406467],
         [-0.59324473, 0.96613426, -0.20922202],
         [0.97066059, -1.22315308, -0.37979187],
         [-0.31613254, -0.07262261, -1.04392799],
         [-1.11535652, 0.33905751, 1.85588856],
         [-1.08211738, 0.88559445, 0.2924617]], dtype=np.float64)
    n_slices = 3
    vec_ids = -1 * np.ones((n_slices ** 2 + n_slices) // 2, dtype=int)
    i_embed = 0
    for cur_start in range(n_slices):
        for cur_end in range(cur_start, n_slices):
            t = cur_end + 1
            i = t * (t - 1) // 2
            vec_ids[i + cur_start] = i_embed
            i_embed += 1
    mats = {"test1": embedding_mat1, "test2": embedding_mat2}
    vids = {"test1": vec_ids.copy(), "test2": vec_ids.copy()}
    lms_d = {"test1": [1, 2, 3], "test2": [1, 2, 3]}
    durs = {"test1": [1, 2, 1, 3, 2, 1], "test2": [1, 2, 1, 3, 2, 1]}
    return mats, vids, durs, lms_d


def _make_bigram_seg(**kwargs):
    mats, vids, durs, lms_d = _demo_corpus()
    D = 3
    m_0 = np.zeros(D)
    k_0 = 0.05
    S_0 = 0.002 * np.ones(D)
    prior = FixedVarPrior.create(S_0, m_0, S_0 / k_0)
    lm_params = {"type": "smooth", "intrp_lambda": 0, "a": 0.5, "b": 0.5}
    defaults = dict(
        am_K=3, am_param_prior=prior, lm_params=lm_params,
        embedding_mats=mats, vec_ids_dict=vids, durations_dict=durs,
        landmarks_dict=lms_d, p_boundary_init=0.9, beta_sent_boundary=-1,
        n_slices_max=2, fb_type="unigram", lms=1.0, batch_size=1, seed=1,
    )
    defaults.update(kwargs)
    return BigramAcousticWordseg(**defaults)


@pytest.mark.parametrize("batch_size", [1, 2])
def test_bigram_sampling_runs(batch_size):
    np.random.seed(1)
    seg = _make_bigram_seg(batch_size=batch_size)
    record = seg.gibbs_sample(5)
    assert np.isfinite(record["log_marg"]).all()
    assert np.isfinite(record["log_prob_z"]).all()
    # LM counts stay consistent with the acoustic model counts
    # (the reference checks this with commented-out asserts, :285, :508).
    am_counts = np.asarray(seg.acoustic_model.stats.counts)
    npt.assert_array_equal(seg.lm.unigram_counts, am_counts)
    # log_marg bookkeeping
    for lm_v, lz, lx in zip(record["log_marg"], record["log_prob_z"],
                            record["log_prob_X_given_z"]):
        npt.assert_allclose(lm_v, lz + lx, rtol=1e-9)
    for i in range(2):
        tr = seg.get_unsup_transcript_i(i)
        assert all(k >= 0 for k in tr)


def test_bigram_assignments_only():
    np.random.seed(1)
    seg = _make_bigram_seg()
    bounds_before = seg.utterances.boundaries.copy()
    record = seg.gibbs_sample(3, assignments_only=True)
    seg._sync_boundaries_to_host()
    npt.assert_array_equal(seg.utterances.boundaries, bounds_before)
    assert record["log_marg*length"] == [0.0, 0.0, 0.0]


def test_bigram_fb_type_stub_raises():
    np.random.seed(1)
    seg = _make_bigram_seg(fb_type="bigram")
    with pytest.raises(NotImplementedError):
        seg.gibbs_sample(1)


def test_log_prob_z_matches_manual_replay():
    np.random.seed(1)
    seg = _make_bigram_seg()
    seg.gibbs_sample(2)
    # Manual replay with the parity LM class (reference log_prob_z, :287-305).
    lm_tmp = BigramSmoothLM(seg.lm.intrp_lambda, seg.lm.a, seg.lm.b, seg.lm.K)
    total = 0.0
    for i_utt in range(seg.utterances.D):
        j_prev = None
        for i_cur in seg.get_unsup_transcript_i(i_utt):
            if j_prev is not None:
                total += np.log(lm_tmp.prob_i_given_j(i_cur, j_prev))
                lm_tmp.state = lm_tmp.state._replace(
                    bigram_counts=lm_tmp.state.bigram_counts.at[j_prev, i_cur].add(1)
                )
            else:
                total += np.log(lm_tmp.prob_i(i_cur))
            lm_tmp.state = lm_tmp.state._replace(
                unigram_counts=lm_tmp.state.unigram_counts.at[i_cur].add(1)
            )
            j_prev = i_cur
    npt.assert_allclose(seg.log_prob_z(), total, rtol=1e-9)


def test_add_block_counts_matches_sequential():
    """Batched block count update == per-utterance sequential updates."""
    import jax.numpy as jnp
    from segmentalist_tpu.models.bigram_lm import (
        add_block_counts, add_transcript_counts, empty_lm_state)

    rng = np.random.RandomState(0)
    K, B, S = 7, 9, 6
    ts = rng.randint(-1, K, (B, S)).astype(np.int32)
    valid = rng.rand(B) < 0.8

    seq = empty_lm_state(K)
    for b in range(B):
        if valid[b]:
            seq = add_transcript_counts(seq, jnp.asarray(ts[b]), sign=1)
    bat = add_block_counts(empty_lm_state(K), jnp.asarray(ts),
                           jnp.asarray(valid), sign=1)
    npt.assert_array_equal(np.asarray(bat.unigram_counts),
                           np.asarray(seq.unigram_counts))
    npt.assert_array_equal(np.asarray(bat.bigram_counts),
                           np.asarray(seq.bigram_counts))


def test_block_count_delta_matches_scatter_path():
    """The signed one-hot MXU count delta (block_count_delta) must equal the
    scatter-based remove-old/add-new composition exactly (one-hot and sign
    values are bf16-exact, so the default-precision matmul is integer-exact)."""
    import jax.numpy as jnp
    from segmentalist_tpu.models.bigram_lm import (
        add_block_counts, block_count_delta, empty_lm_state,
        transcript_pairs_batch)

    rng = np.random.RandomState(7)
    K, B, S = 11, 8, 7
    for trial in range(3):
        old = rng.randint(-1, K, (B, S)).astype(np.int32)
        new = rng.randint(-1, K, (B, S)).astype(np.int32)
        valid = rng.rand(B) < 0.75
        ref = add_block_counts(
            add_block_counts(empty_lm_state(K), jnp.asarray(old),
                             jnp.asarray(valid), sign=-1),
            jnp.asarray(new), jnp.asarray(valid), sign=1)
        for pairs_old in (None, transcript_pairs_batch(jnp.asarray(old))):
            got = block_count_delta(jnp.asarray(old), jnp.asarray(new),
                                    jnp.asarray(valid), K,
                                    pairs_old=pairs_old)
            npt.assert_array_equal(np.asarray(got.unigram_counts),
                                   np.asarray(ref.unigram_counts))
            npt.assert_array_equal(np.asarray(got.bigram_counts),
                                   np.asarray(ref.bigram_counts))


def test_log_prob_z_parallel_matches_python_replay():
    """The sort-based parallel log_prob_z must equal a direct python replay
    of the reference recursion (bigram_acoustic_wordseg.py:287-305)."""
    import jax.numpy as jnp
    from segmentalist_tpu import FixedVarPrior
    from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg
    from segmentalist_tpu.utils.synth import synthetic_corpus

    em, vi, du, lmk, _ = synthetic_corpus(
        n_utterances=5, n_landmarks_max=5, D=3, K_true=2, n_slices_max=3,
        seed=3)
    prior = FixedVarPrior.create(0.05 * np.ones(3), np.zeros(3), np.ones(3))
    np.random.seed(3)
    lam, a, b = 0.15, 1.2, 2.0
    seg = BigramAcousticWordseg(
        am_K=4, am_param_prior=prior,
        lm_params={"type": "smooth", "intrp_lambda": lam, "a": a, "b": b},
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lmk, p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=3, fb_type="unigram", batch_size=2, seed=3)

    rng = np.random.RandomState(0)
    for trial in range(3):
        K = 4
        ts = rng.randint(-1, K, (5, 6)).astype(np.int32)
        fn = seg._log_prob_z_fn or seg._build_log_prob_z_fn()
        got = float(fn(jnp.asarray(ts)))

        # Direct python replay.
        uni = np.zeros(K)
        big = np.zeros((K, K))
        n = 0
        total = 0.0
        for row in ts:
            j_prev = -1
            for cur in row:
                if cur < 0:
                    continue
                p_uni = (uni[cur] + a / K) / (n + a)
                if j_prev >= 0:
                    p_big = (big[j_prev, cur] + b / K) / (uni[j_prev] + b)
                    p = lam * p_uni + (1 - lam) * p_big
                else:
                    p = p_uni
                total += np.log(p)
                if j_prev >= 0:
                    big[j_prev, cur] += 1
                uni[cur] += 1
                n += 1
                j_prev = cur
        npt.assert_allclose(got, total, rtol=1e-5), trial


def test_log_prob_z_vmap_matches_per_sweep():
    """The chunked sweep replays all sweeps' transcripts in ONE vmapped
    batched sort (segmenters/bigram.py:_build_chunk_fn); the batched values
    must equal per-sweep calls."""
    import jax
    import jax.numpy as jnp
    from segmentalist_tpu import FixedVarPrior
    from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg
    from segmentalist_tpu.utils.synth import synthetic_corpus

    em, vi, du, lmk, _ = synthetic_corpus(
        n_utterances=5, n_landmarks_max=5, D=3, K_true=2, n_slices_max=3,
        seed=3)
    prior = FixedVarPrior.create(0.05 * np.ones(3), np.zeros(3), np.ones(3))
    np.random.seed(3)
    seg = BigramAcousticWordseg(
        am_K=4, am_param_prior=prior,
        lm_params={"type": "smooth", "intrp_lambda": 0.15, "a": 1.2,
                   "b": 2.0},
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lmk, p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=3, fb_type="unigram", batch_size=2, seed=3)
    fn = seg._log_prob_z_fn or seg._build_log_prob_z_fn()
    rng = np.random.RandomState(1)
    stack = jnp.asarray(rng.randint(-1, 4, (6, 5, 6)).astype(np.int32))
    batched = np.asarray(jax.vmap(fn)(stack))
    per_sweep = np.asarray([float(fn(stack[s])) for s in range(6)])
    npt.assert_allclose(batched, per_sweep, rtol=1e-6)


def test_bigram_full_covariance_smoke():
    """Bigram driver with the full-NIW backend: exercises the fused
    corrected-scoring kernel path (interpret on CPU) plus the XLA fullcov
    chain with the bigram LM weight_fn."""
    from segmentalist_tpu import NIW
    from segmentalist_tpu.utils.synth import synthetic_corpus

    em, vi, du, lm, _ = synthetic_corpus(
        n_utterances=6, n_landmarks_max=6, D=4, K_true=3, n_slices_max=3,
        seed=11)
    prior = NIW.create(np.zeros(4), 0.5, 7.0,
                       0.3 * np.eye(4) + 0.03 * np.ones((4, 4)))
    np.random.seed(11)
    seg = BigramAcousticWordseg(
        am_K=6, am_param_prior=prior,
        lm_params={"type": "smooth", "intrp_lambda": 0.1, "a": 1.0,
                   "b": 1.0},
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, covariance_type="full", fb_type="unigram",
        p_boundary_init=0.5, beta_sent_boundary=-1, n_slices_max=3,
        batch_size=3, seed=11)
    rec = seg.gibbs_sample(3, validate=True)
    assert np.isfinite(rec["log_marg"]).all()
    # LM tables still consistent with a fresh recount.
    fresh = seg._all_transcript_counts()
    np.testing.assert_array_equal(
        np.asarray(seg.lm.state.unigram_counts),
        np.asarray(fresh.unigram_counts))


def test_transcript_pairs_batch_prev_pos():
    """return_prev_pos exposes the previous valid POSITION per slot, decoded
    from the same encoded cummax that defines the (prev, cur) pairs — the
    LM-replay metric consumes it instead of re-deriving its own forward
    fill."""
    import jax.numpy as jnp
    from segmentalist_tpu.models.bigram_lm import transcript_pairs_batch

    tr = jnp.asarray([[3, -1, 5, 5, -1, -1, 2],
                      [-1, -1, -1, -1, -1, -1, -1],
                      [7, 0, -1, 0, 1, -1, -1]], dtype=jnp.int32)
    pj, pi, prev_pos = transcript_pairs_batch(tr, return_prev_pos=True)
    pj2, pi2 = transcript_pairs_batch(tr)
    npt.assert_array_equal(np.asarray(pj), np.asarray(pj2))
    npt.assert_array_equal(np.asarray(pi), np.asarray(pi2))
    # brute-force oracle
    tr_np = np.asarray(tr)
    want = np.full(tr_np.shape, -1, np.int64)
    for u in range(tr_np.shape[0]):
        last = -1
        for s in range(tr_np.shape[1]):
            want[u, s] = last
            if tr_np[u, s] >= 0:
                last = s
    npt.assert_array_equal(np.asarray(prev_pos), want)
    # consistency: where a pair exists, prev_pos addresses its prev token
    pj_np, prev_np = np.asarray(pj), np.asarray(prev_pos)
    has = pj_np >= 0
    npt.assert_array_equal(
        pj_np[has],
        tr_np[np.nonzero(has)[0], prev_np[has]])
