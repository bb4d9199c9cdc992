"""Property-style fuzzing across all three drivers: random corpora, random
hyperparameters, invariant checks (technique inspired by the reference's
smoke main()s, hardened into assertions)."""

import numpy as np
import pytest

from segmentalist_tpu import FBGMM, FixedVarPrior
from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg
from segmentalist_tpu.segmenters.kmeans_seg import SegmentalKMeansWordseg
from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
from segmentalist_tpu.utils.synth import synthetic_corpus


def _check_segmentation(seg):
    seg._sync_boundaries_to_host()
    am = seg.acoustic_model
    n_tokens = 0
    for i in range(seg.utterances.D):
        N = seg.utterances.lengths[i]
        bounds = seg.utterances.boundaries[i][:N]
        assert bounds[-1], "final boundary must always be set"
        embeds = seg.utterances.get_segmented_embeds_i(i)
        n_tokens += sum(1 for e in embeds if e != -1)
    # Assigned embeddings == segments in the current segmentation.
    if hasattr(am, "stats"):
        a = np.asarray(am.assignments)
        assert (a >= 0).sum() == n_tokens
        counts = np.asarray(am.stats.counts)
        assert counts.sum() == n_tokens
        assert counts.min() >= 0
    else:  # k-means
        a = np.asarray(am.state.assignments)
        assert (a >= 0).sum() == n_tokens


@pytest.mark.parametrize("seed,cov_type,fb_type", [
    (0, "fixed", "standard"), (1, "fixed", "standard"),
    (2, "fixed", "standard"), (7, "diag", "standard"),
    (8, "full", "standard"), (10, "full", "standard"),
    (11, "fixed", "viterbi"), (12, "diag", "viterbi"),
    (14, "full", "viterbi"),
])
def test_unigram_fuzz(seed, cov_type, fb_type):
    from segmentalist_tpu import NIW

    rng = np.random.RandomState(seed)
    n_lm = rng.randint(3, 9)
    W = rng.randint(2, min(5, n_lm) + 1)
    D = rng.randint(2, 6)
    em, vi, du, lm, _ = synthetic_corpus(
        n_utterances=rng.randint(3, 9), n_landmarks_max=n_lm, D=D,
        K_true=rng.randint(2, 4), n_slices_max=W, seed=seed)
    if cov_type == "fixed":
        prior = FixedVarPrior.create(0.05 * np.ones(D), np.zeros(D),
                                     np.ones(D))
    elif cov_type == "diag":
        prior = NIW.create(np.zeros(D), 0.1, float(D) + 3.0,
                           0.2 * np.ones(D))
    else:
        prior = NIW.create(np.zeros(D), 0.1, float(D) + 3.0,
                           0.2 * np.eye(D) + 0.02 * np.ones((D, D)))
    np.random.seed(seed)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=float(rng.uniform(0.5, 5)), am_K=rng.randint(3, 10),
        am_param_prior=prior, embedding_mats=em, vec_ids_dict=vi,
        durations_dict=du, landmarks_dict=lm, covariance_type=cov_type,
        p_boundary_init=float(rng.uniform(0.2, 0.9)),
        beta_sent_boundary=float(rng.choice([-1, 2.0])),
        n_slices_min=int(rng.choice([0, 1])), n_slices_max=W,
        time_power_term=float(rng.choice([1.0, 1.2])),
        wip=float(rng.uniform(-1, 1)), batch_size=int(rng.randint(1, 5)),
        fb_type=fb_type, seed=seed)
    rec = seg.gibbs_sample(3, validate=True)
    if fb_type == "viterbi":
        # Deterministic given (sampler state, host-RNG state): replaying a
        # sweep from a snapshot must reproduce it exactly on any backend.
        am = seg.acoustic_model
        snap = (am.stats, am.assignments, seg._boundaries_dev, am.key,
                seg._rng.get_state())
        seg.gibbs_sample(1, validate=True)
        a1 = np.asarray(am.assignments).copy()
        b1 = np.asarray(seg._boundaries_dev).copy()
        am.stats, am.assignments, seg._boundaries_dev, am.key = snap[:4]
        seg._rng.set_state(snap[4])
        seg.gibbs_sample(1, validate=True)
        np.testing.assert_array_equal(a1, np.asarray(am.assignments))
        np.testing.assert_array_equal(b1, np.asarray(seg._boundaries_dev))
    assert np.isfinite(rec["log_marg"]).all()
    _check_segmentation(seg)


@pytest.mark.parametrize("seed", [3, 4])
def test_kmeans_fuzz(seed):
    rng = np.random.RandomState(seed)
    n_lm = rng.randint(3, 8)
    W = rng.randint(2, min(4, n_lm) + 1)
    em, vi, du, lm, _ = synthetic_corpus(
        n_utterances=rng.randint(3, 8), n_landmarks_max=n_lm,
        D=rng.randint(2, 5), K_true=2, n_slices_max=W, seed=seed)
    np.random.seed(seed)
    seg = SegmentalKMeansWordseg(
        am_K=rng.randint(3, 8), embedding_mats=em, vec_ids_dict=vi,
        durations_dict=du, landmarks_dict=lm,
        p_boundary_init=float(rng.uniform(0.2, 0.9)), n_slices_max=W,
        wip=float(rng.uniform(-1, 1)), batch_size=int(rng.randint(1, 4)),
        seed=seed)
    rec = seg.segment(3, n_iter_inbetween_kmeans=int(rng.choice([0, 1])))
    assert np.isfinite(rec["sum_neg_sqrd_norm"]).all()
    _check_segmentation(seg)


@pytest.mark.parametrize("seed", [5, 6])
def test_bigram_fuzz(seed):
    rng = np.random.RandomState(seed)
    n_lm = rng.randint(3, 8)
    W = rng.randint(2, min(4, n_lm) + 1)
    D = rng.randint(2, 5)
    em, vi, du, lm, _ = synthetic_corpus(
        n_utterances=rng.randint(3, 8), n_landmarks_max=n_lm, D=D,
        K_true=2, n_slices_max=W, seed=seed)
    prior = FixedVarPrior.create(0.05 * np.ones(D), np.zeros(D), np.ones(D))
    np.random.seed(seed)
    seg = BigramAcousticWordseg(
        am_K=rng.randint(3, 8), am_param_prior=prior,
        lm_params={"type": "smooth",
                   "intrp_lambda": float(rng.uniform(0, 0.5)),
                   "a": float(rng.uniform(0.5, 3)),
                   "b": float(rng.uniform(0.5, 3))},
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=float(rng.uniform(0.2, 0.9)),
        beta_sent_boundary=-1, n_slices_max=W, fb_type="unigram",
        batch_size=int(rng.randint(1, 4)), seed=seed)
    rec = seg.gibbs_sample(3)
    assert np.isfinite(rec["log_marg"]).all()
    _check_segmentation(seg)
    # LM count tables must exactly match a from-scratch rebuild.
    import jax.numpy as jnp
    uni = np.asarray(seg.lm.state.unigram_counts)
    big = np.asarray(seg.lm.state.bigram_counts)
    fresh = seg._all_transcript_counts()
    np.testing.assert_array_equal(uni, np.asarray(fresh.unigram_counts))
    np.testing.assert_array_equal(big, np.asarray(fresh.bigram_counts))


def test_dp_window_narrower_than_stored_spans():
    """Segmenter n_slices_max smaller than the spans present in the data:
    the DP must only choose spans within its window."""
    em, vi, du, lm, _ = synthetic_corpus(
        n_utterances=5, n_landmarks_max=6, D=3, K_true=2, n_slices_max=4,
        seed=9)
    prior = FixedVarPrior.create(0.05 * np.ones(3), np.zeros(3), np.ones(3))
    np.random.seed(9)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=5, am_param_prior=prior,
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=2, batch_size=2, seed=9)
    assert seg.utterances.W >= 2
    seg.gibbs_sample(3)
    seg._sync_boundaries_to_host()
    for i in range(seg.utterances.D):
        spans = [b - a for a, b in seg.utterances.get_segmented_landmark_indices(i)]
        # Non-leading spans obey the window (leading remainder + fallback
        # may be shorter but never longer than the window).
        assert all(s <= 2 for s in spans[1:]), (i, spans)
