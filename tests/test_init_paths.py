"""Constructor paths of the segmentation drivers that the main tests do not
exercise: seed assignments, one-by-one init, min_duration masking, spread
init for k-means (reference unigram_acoustic_wordseg.py:176-239,
utterances.py:94-102, kmeans_acoustic_wordseg.py:179-205)."""

import numpy as np
import numpy.testing as npt

from segmentalist_tpu import FBGMM, FixedVarPrior
from segmentalist_tpu.corpus import Utterances
from segmentalist_tpu.segmenters.kmeans_seg import SegmentalKMeansWordseg
from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
from segmentalist_tpu.utils.synth import synthetic_corpus


def _corpus(seed=13):
    return synthetic_corpus(n_utterances=5, n_landmarks_max=5, D=3, K_true=2,
                            n_slices_max=3, seed=seed)


def _prior(D=3):
    return FixedVarPrior.create(0.05 * np.ones(D), np.zeros(D), np.ones(D))


def test_seed_assignments_init():
    em, vi, du, lm, _ = _corpus()
    # Seed boundaries at every landmark time -> one segment per landmark;
    # assignments cycle integer labels.
    seed_bounds = {u: list(lm[u]) for u in lm}
    seed_assign = {u: [i % 3 for i in range(len(lm[u]))] for u in lm}
    np.random.seed(13)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=6, am_param_prior=_prior(),
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, seed_boundaries_dict=seed_bounds,
        seed_assignments_dict=seed_assign, beta_sent_boundary=-1,
        n_slices_max=3, batch_size=2, seed=13)
    a = np.asarray(seg.acoustic_model.assignments)
    assert (a >= 0).sum() > 0
    # Integer seed labels map to themselves (reference :195-198).
    assert set(np.unique(a[a >= 0])).issubset({0, 1, 2})
    rec = seg.gibbs_sample(2)
    assert np.isfinite(rec["log_marg"]).all()


def test_one_by_one_init():
    em, vi, du, lm, _ = _corpus()
    np.random.seed(13)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=6, am_param_prior=_prior(),
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, init_am_assignments="one-by-one",
        beta_sent_boundary=-1, n_slices_max=3, batch_size=2, seed=13)
    rec = seg.gibbs_sample(2)
    assert np.isfinite(rec["log_marg"]).all()


def test_min_duration_masks_short_candidates():
    """Durations below min_duration are NaN-masked (utterances.py:94-102)
    and never segmentable, unless everything would be masked."""
    lengths = [3]
    vec_ids = [np.arange(6, dtype=np.int64)]
    durations = [np.array([1.0, 3.0, 5.0, 1.0, 3.0, 1.0])]
    landmarks = [[1, 2, 3]]
    utt = Utterances(lengths, vec_ids, durations, landmarks,
                     p_boundary_init=0.5, n_slices_max=3, min_duration=2)
    durs = utt.durations[0]
    assert np.isnan(durs[0]) and np.isnan(durs[3]) and np.isnan(durs[5])
    assert durs[1] == 3.0 and durs[2] == 5.0


def test_min_duration_keeps_longest_when_all_masked():
    lengths = [2]
    vec_ids = [np.arange(3, dtype=np.int64)]
    durations = [np.array([1.0, 2.0, 1.0])]
    landmarks = [[1, 2]]
    utt = Utterances(lengths, vec_ids, durations, landmarks,
                     p_boundary_init=0.5, n_slices_max=2, min_duration=10)
    durs = utt.durations[0]
    # argmax-duration candidate survives (utterances.py:85-87).
    assert durs[1] == 2.0
    assert np.isnan(durs[0]) and np.isnan(durs[2])


def test_kmeans_spread_init():
    em, vi, du, lm, _ = _corpus()
    np.random.seed(13)
    seg = SegmentalKMeansWordseg(
        am_K=4, embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, init_am_assignments="spread",
        p_boundary_init=0.5, n_slices_max=3, batch_size=2, seed=13)
    counts = np.asarray(seg.acoustic_model.state.counts)
    # Spread init balances components (max - min <= 1 among initialized).
    assert counts.max() - counts[counts > 0].min() <= 1
    rec = seg.segment(2)
    assert np.isfinite(rec["sum_neg_sqrd_norm"]).all()


def test_native_and_numpy_boundary_init_same_constraints():
    """Both random-init paths (native rejection resampler and the numpy
    fallback) must satisfy the identical constraints: final landmark on,
    all spans within [n_slices_min, n_slices_max] (or N <= n_slices_min),
    and at least one segment with a real embedding
    (reference utterances.py:136-157)."""
    from segmentalist_tpu import native

    em, vi, du, lm, _ = synthetic_corpus(n_utterances=30, n_landmarks_max=7,
                                         D=3, K_true=2, n_slices_max=3,
                                         seed=3)
    lengths = [len(lm[u]) for u in sorted(lm)]
    vec_ids = [vi[u] for u in sorted(vi)]
    durations = [du[u] for u in sorted(du)]
    landmarks = [lm[u] for u in sorted(lm)]

    def check(utt):
        for i in range(utt.D):
            N = utt.lengths[i]
            assert utt.boundaries[i, N - 1]
            embeds = np.asarray(utt.get_segmented_embeds_i(i))
            assert (embeds != -1).any()
            spans = [b - a for a, b in utt.get_segmented_landmark_indices(i)]
            assert max(spans) <= 3 and min(spans) >= 1 or N <= 1

    rng = np.random.RandomState(7)
    utt_native = Utterances(lengths, vec_ids, durations, landmarks,
                            p_boundary_init=0.5, n_slices_min=1,
                            n_slices_max=3, rng=rng)
    check(utt_native)

    # Force the numpy fallback and re-check the identical constraints.
    orig = native.init_boundaries_random
    native.init_boundaries_random = lambda *a, **k: None
    try:
        utt_np = Utterances(lengths, vec_ids, durations, landmarks,
                            p_boundary_init=0.5, n_slices_min=1,
                            n_slices_max=3, rng=np.random.RandomState(7))
        check(utt_np)
    finally:
        native.init_boundaries_random = orig
