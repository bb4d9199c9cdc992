"""Fused multi-sweep dispatch (the _WORDSEG_CHUNK path) on all three
wordseg drivers.

Runs long enough (n_iter > _WORDSEG_CHUNK) that the chunked dispatch with
DEVICE-side utterance permutations handles most sweeps and the legacy
host-permutation path the remainder; checks record-dict shape/finiteness
and that the post-run state satisfies the sampler invariants (statistics
consistent with the assignment vector -- the same invariants the
``validate=True`` device checks assert)."""

import numpy as np
import jax.numpy as jnp

from segmentalist_tpu import FBGMM, FixedVarPrior
from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg
from segmentalist_tpu.segmenters.kmeans_seg import SegmentalKMeansWordseg
from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
from segmentalist_tpu.utils.synth import synthetic_corpus

N_ITER = 11  # 8 chunked + 3 legacy sweeps


def _corpus():
    em, vi, du, lm, _ = synthetic_corpus(
        n_utterances=12, n_landmarks_max=6, D=6, K_true=4, n_slices_max=3,
        seed=5,
    )
    return em, vi, du, lm


def _prior(D=6):
    return FixedVarPrior.create(
        0.05 * np.ones(D), np.zeros(D), np.ones(D))


def _check_stats_consistent(am):
    """Global sufficient statistics must equal a recount from the
    assignment vector after any mix of chunked/legacy sweeps."""
    from segmentalist_tpu.ops.stats import suff_stats_from_assignments

    rebuilt = suff_stats_from_assignments(
        am.X, am.assignments, am.K_max, full_cov=am.cov.FULL_COV)
    np.testing.assert_array_equal(np.asarray(am.stats.counts),
                                  np.asarray(rebuilt.counts))
    np.testing.assert_allclose(np.asarray(am.stats.sum_x),
                               np.asarray(rebuilt.sum_x), atol=1e-6)


def test_unigram_chunked_sweeps():
    em, vi, du, lm = _corpus()
    seg = UnigramAcousticWordseg(
        am_class=FBGMM, am_alpha=1.0, am_K=8, am_param_prior=_prior(),
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, n_slices_max=3, batch_size=4, seed=1,
    )
    record = seg.gibbs_sample(N_ITER)
    assert all(len(v) == N_ITER for v in record.values())
    assert np.isfinite(record["log_marg"]).all()
    assert np.isfinite(record["log_marg*length"]).all()
    _check_stats_consistent(seg.acoustic_model)
    # Boundaries must still be valid (last landmark of each utterance set).
    seg._sync_boundaries_to_host()
    for i in range(seg.utterances.D):
        n = seg.utterances.lengths[i]
        assert seg.utterances.boundaries[i][n - 1]


def test_bigram_chunked_sweeps():
    em, vi, du, lm = _corpus()
    seg = BigramAcousticWordseg(
        am_K=8, am_param_prior=_prior(),
        lm_params={"type": "smooth", "intrp_lambda": 0.1, "a": 1.0,
                   "b": 2.0},
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, n_slices_max=3, batch_size=4, seed=2,
        fb_type="unigram",
    )
    record = seg.gibbs_sample(N_ITER)
    assert all(len(v) == N_ITER for v in record.values())
    assert np.isfinite(record["log_marg"]).all()
    _check_stats_consistent(seg.acoustic_model)
    # LM count tables must recount from the current transcripts.
    from segmentalist_tpu.models.bigram_lm import (
        BigramLMState, add_block_counts)

    transcripts = seg._all_transcripts()
    zero = BigramLMState(
        unigram_counts=jnp.zeros((seg.lm.K,), jnp.int32),
        bigram_counts=jnp.zeros((seg.lm.K, seg.lm.K), jnp.int32))
    recount = add_block_counts(
        zero, transcripts, jnp.ones((transcripts.shape[0],), bool), sign=1)
    np.testing.assert_array_equal(np.asarray(seg.lm.state.unigram_counts),
                                  np.asarray(recount.unigram_counts))
    np.testing.assert_array_equal(np.asarray(seg.lm.state.bigram_counts),
                                  np.asarray(recount.bigram_counts))


def test_fbgmm_chunk_size_invariance():
    """The chain is a function of the key-splitting order only: slicing the
    same sweep sequence into big chunks, 16-chunks, or single sweeps must
    produce bit-identical assignments, statistics, and metrics (this is what
    makes the _SWEEP_CHUNK_BIG dispatch-amortisation path safe)."""
    from segmentalist_tpu.models import fbgmm as fbgmm_mod

    rng = np.random.RandomState(7)
    X = np.vstack([rng.randn(20, 3) + c
                   for c in ([0, 0, 0], [5, 5, 0], [-5, 0, 5])]).astype(
                       np.float32)

    def run(big):
        old = fbgmm_mod._SWEEP_CHUNK_BIG
        fbgmm_mod._SWEEP_CHUNK_BIG = big
        try:
            np.random.seed(3)
            m = FBGMM(X, _prior(3), alpha=1.0, K=6, assignments="rand",
                      covariance_type="fixed")
            rec = m.gibbs_sample(45, mode="blocked")
            return m, rec
        finally:
            fbgmm_mod._SWEEP_CHUNK_BIG = old

    m_big, rec_big = run(24)        # 24-chunk + 16-chunk + 5 singles
    m_std, rec_std = run(1 << 30)   # 16-chunks + 13 singles
    np.testing.assert_array_equal(np.asarray(m_big.assignments),
                                  np.asarray(m_std.assignments))
    np.testing.assert_array_equal(np.asarray(m_big.stats.counts),
                                  np.asarray(m_std.stats.counts))
    np.testing.assert_array_equal(rec_big["log_marg"], rec_std["log_marg"])
    np.testing.assert_array_equal(rec_big["components"],
                                  rec_std["components"])


def test_kmeans_chunked_sweeps():
    em, vi, du, lm = _corpus()
    seg = SegmentalKMeansWordseg(
        am_K=8, embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, n_slices_max=3, batch_size=4, seed=3,
    )
    record = seg.segment(N_ITER)
    assert all(len(v) == N_ITER for v in record.values())
    assert np.isfinite(record["sum_neg_sqrd_norm"]).all()
    am = seg.acoustic_model
    from segmentalist_tpu.models.kmeans import kmeans_state_from_assignments

    rebuilt = kmeans_state_from_assignments(
        am.X, am.state.assignments, am.K_max)
    np.testing.assert_array_equal(np.asarray(am.state.counts),
                                  np.asarray(rebuilt.counts))
    np.testing.assert_allclose(np.asarray(am.state.sum_x),
                               np.asarray(rebuilt.sum_x), atol=1e-5)
