"""Native corpus-ops parity and checkpoint/resume roundtrips."""

import numpy as np
import numpy.testing as npt
import pytest

from segmentalist_tpu import native
from segmentalist_tpu.corpus import Utterances, tri_index


def _toy_utt_inputs(n_utt=5, n_max=6, n_slices_max=3, seed=0):
    rng = np.random.RandomState(seed)
    lengths, vec_ids, durations, landmarks = [], [], [], []
    for u in range(n_utt):
        N = rng.randint(2, n_max + 1)
        T = N * (N + 1) // 2
        v = -np.ones(T, dtype=int)
        i_embed = 100 * u
        d = -np.ones(T, dtype=float)
        for start in range(N):
            for end in range(start, min(N, start + n_slices_max)):
                k = tri_index(end + 1, start)
                v[k] = i_embed
                d[k] = (end - start + 1) * 10
                i_embed += 1
        lengths.append(N)
        vec_ids.append(v)
        durations.append(list(d))
        landmarks.append([(j + 1) * 10 for j in range(N)])
    return lengths, vec_ids, durations, landmarks


def test_native_pack_dense_matches_numpy():
    if not native.available():
        pytest.skip("native lib unavailable")
    lengths, vec_ids, durations, landmarks = _toy_utt_inputs()
    u_native = Utterances(lengths, vec_ids, durations, landmarks,
                          p_boundary_init=0, n_slices_max=3)
    # Force the numpy path by building a second instance with native disabled.
    import segmentalist_tpu.native as nat

    saved = nat.pack_dense
    nat.pack_dense = lambda *a, **k: None
    try:
        u_np = Utterances(lengths, vec_ids, durations, landmarks,
                          p_boundary_init=0, n_slices_max=3)
    finally:
        nat.pack_dense = saved
    npt.assert_array_equal(np.asarray(u_native.seg_ids), np.asarray(u_np.seg_ids))
    a, b = np.asarray(u_native.seg_durations), np.asarray(u_np.seg_durations)
    npt.assert_array_equal(np.isnan(a), np.isnan(b))
    npt.assert_allclose(a[~np.isnan(a)], b[~np.isnan(b)])


def test_native_init_boundaries_respects_constraints():
    if not native.available():
        pytest.skip("native lib unavailable")
    lengths, vec_ids, durations, landmarks = _toy_utt_inputs(n_utt=8)
    n_max = max(lengths)
    T = n_max * (n_max + 1) // 2
    vpad = -np.ones((len(lengths), T), dtype=np.int64)
    for i, v in enumerate(vec_ids):
        vpad[i, : len(v)] = v
    bounds = native.init_boundaries_random(
        np.asarray(lengths), vpad, n_max, 0.5, 0, 3, seed=7
    )
    assert bounds is not None
    for i, N in enumerate(lengths):
        assert bounds[i, N - 1]
        idx = np.where(bounds[i, :N])[0]
        spans = np.diff(np.concatenate([[-1], idx]))
        assert spans.max() <= 3


def test_native_segmented_embeds_matches_reference_query():
    if not native.available():
        pytest.skip("native lib unavailable")
    lengths, vec_ids, durations, landmarks = _toy_utt_inputs(n_utt=6, seed=3)
    np.random.seed(0)
    utts = Utterances(lengths, vec_ids, durations, landmarks,
                      p_boundary_init=0.5, n_slices_max=3)
    n_max = utts.N_max
    out = native.segmented_embeds(
        utts.boundaries.astype(np.uint8), utts.vec_ids,
        np.asarray(lengths, np.int64),
    )
    for i in range(len(lengths)):
        expected = utts.get_segmented_embeds_i(i)
        got = [int(x) for x in out[i] if x != -2]
        assert got == expected


def test_checkpoint_roundtrip(tmp_path):
    import __graft_entry__ as ge
    from segmentalist_tpu.utils import checkpoint as ckpt

    np.random.seed(0)
    seg = ge._build_segmenter(n_utterances=8, batch_size=4, seed=5)
    seg.gibbs_sample(2)
    ckpt.save_checkpoint(str(tmp_path / "ck"), seg, step=2)

    state_before = {
        "counts": np.asarray(seg.acoustic_model.stats.counts).copy(),
        "assignments": np.asarray(seg.acoustic_model.assignments).copy(),
        "boundaries": np.asarray(seg._boundaries_dev).copy(),
    }
    # Perturb, then restore.
    seg.gibbs_sample(2)
    ckpt.restore_checkpoint(str(tmp_path / "ck"), seg, step=2)
    npt.assert_array_equal(
        np.asarray(seg.acoustic_model.stats.counts), state_before["counts"]
    )
    npt.assert_array_equal(
        np.asarray(seg.acoustic_model.assignments), state_before["assignments"]
    )
    npt.assert_array_equal(
        np.asarray(seg._boundaries_dev), state_before["boundaries"]
    )
    # Restored state continues sampling normally.
    rec = seg.gibbs_sample(1)
    assert np.isfinite(rec["log_marg"][-1])


def test_checkpoint_roundtrip_bigram_lm_state(tmp_path):
    """Bigram driver checkpoints include the LM count tables."""
    from segmentalist_tpu.priors import FixedVarPrior
    from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg
    from segmentalist_tpu.utils import checkpoint as ckpt
    from segmentalist_tpu.utils.synth import synthetic_corpus

    em, vi, du, lm, _ = synthetic_corpus(
        n_utterances=6, n_landmarks_max=5, D=3, K_true=2, n_slices_max=3,
        seed=11)
    prior = FixedVarPrior.create(0.05 * np.ones(3), np.zeros(3), np.ones(3))
    np.random.seed(11)
    seg = BigramAcousticWordseg(
        am_K=5, am_param_prior=prior,
        lm_params={"type": "smooth", "intrp_lambda": 0.1, "a": 1.0, "b": 1.0},
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=3, fb_type="unigram", batch_size=3, seed=11)
    seg.gibbs_sample(2)
    ckpt.save_checkpoint(str(tmp_path / "ck"), seg, step=2)
    uni_before = np.asarray(seg.lm.state.unigram_counts).copy()
    big_before = np.asarray(seg.lm.state.bigram_counts).copy()
    seg.gibbs_sample(2)
    ckpt.restore_checkpoint(str(tmp_path / "ck"), seg, step=2)
    npt.assert_array_equal(np.asarray(seg.lm.state.unigram_counts), uni_before)
    npt.assert_array_equal(np.asarray(seg.lm.state.bigram_counts), big_before)
    rec = seg.gibbs_sample(1)
    assert np.isfinite(rec["log_marg"][-1])


def test_embedding_id_bound_enforced():
    """Ids >= 2**24 would be quantized by the sweep's one-hot f32 id pulls
    (segmenters/common._gather2); the corpus rejects them at construction."""
    lengths, vec_ids, durations, landmarks = _toy_utt_inputs(n_utt=2)
    vec_ids[0][0] = 2 ** 24
    with pytest.raises(ValueError, match="2\\*\\*24"):
        Utterances(lengths, vec_ids, durations, landmarks,
                   p_boundary_init=0, n_slices_max=3)


def test_checkpoint_resume_is_bit_exact(tmp_path):
    """A restored run continues EXACTLY the uninterrupted chain: the fused-
    chunk path draws its per-sweep permutations from the carried device key,
    which the checkpoint captures -- so 16 sweeps == 8 sweeps + save +
    restore into a FRESH segmenter + 8 sweeps, bit for bit.  Any sampler
    state missing from segmenter_state() makes this diverge."""
    import __graft_entry__ as ge
    from segmentalist_tpu.utils import checkpoint as ckpt

    np.random.seed(0)
    seg_a = ge._build_segmenter(n_utterances=8, batch_size=4, seed=7)
    seg_a.gibbs_sample(16)

    np.random.seed(0)
    seg_b = ge._build_segmenter(n_utterances=8, batch_size=4, seed=7)
    seg_b.gibbs_sample(8)
    ckpt.save_checkpoint(str(tmp_path / "ck"), seg_b, step=8)

    # Same corpus (the checkpoint stores sampler state, not the data), but
    # a scrambled host RNG: chunked runs draw permutations from the carried
    # device key, so host RNG state must not matter.
    seg_c = ge._build_segmenter(n_utterances=8, batch_size=4, seed=7)
    np.random.seed(123)
    seg_c._rng = np.random.RandomState(123)
    ckpt.restore_checkpoint(str(tmp_path / "ck"), seg_c, step=8)
    seg_c.gibbs_sample(8)

    npt.assert_array_equal(np.asarray(seg_a.acoustic_model.assignments),
                           np.asarray(seg_c.acoustic_model.assignments))
    npt.assert_array_equal(np.asarray(seg_a._boundaries_dev),
                           np.asarray(seg_c._boundaries_dev))
    npt.assert_array_equal(np.asarray(seg_a.acoustic_model.stats.counts),
                           np.asarray(seg_c.acoustic_model.stats.counts))
    npt.assert_array_equal(np.asarray(seg_a.acoustic_model.key),
                           np.asarray(seg_c.acoustic_model.key))
    npt.assert_array_equal(np.asarray(seg_a.acoustic_model.stats.sum_x),
                           np.asarray(seg_c.acoustic_model.stats.sum_x))


def test_checkpoint_resume_unchunked_is_bit_exact(tmp_path):
    """The UNCHUNKED path (validate=True forces per-sweep dispatch) permutes
    utterances with the host RandomState; the checkpoint captures its MT19937
    state, so 16 sweeps == 8 + save + restore into a fresh segmenter with a
    deliberately scrambled host RNG + 8 sweeps, bit for bit."""
    import __graft_entry__ as ge
    from segmentalist_tpu.utils import checkpoint as ckpt

    np.random.seed(0)
    seg_a = ge._build_segmenter(n_utterances=8, batch_size=4, seed=7)
    seg_a.gibbs_sample(16, validate=True)

    np.random.seed(0)
    seg_b = ge._build_segmenter(n_utterances=8, batch_size=4, seed=7)
    seg_b.gibbs_sample(8, validate=True)
    ckpt.save_checkpoint(str(tmp_path / "ck"), seg_b, step=8)

    seg_c = ge._build_segmenter(n_utterances=8, batch_size=4, seed=7)
    seg_c._rng = np.random.RandomState(999)  # must be overwritten by restore
    ckpt.restore_checkpoint(str(tmp_path / "ck"), seg_c, step=8)
    seg_c.gibbs_sample(8, validate=True)

    npt.assert_array_equal(np.asarray(seg_a.acoustic_model.assignments),
                           np.asarray(seg_c.acoustic_model.assignments))
    npt.assert_array_equal(np.asarray(seg_a._boundaries_dev),
                           np.asarray(seg_c._boundaries_dev))
    npt.assert_array_equal(np.asarray(seg_a.acoustic_model.stats.counts),
                           np.asarray(seg_c.acoustic_model.stats.counts))
    npt.assert_array_equal(np.asarray(seg_a.acoustic_model.stats.sum_x),
                           np.asarray(seg_c.acoustic_model.stats.sum_x))
