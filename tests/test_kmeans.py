"""K-means components / model / segmenter tests.

Ports the reference's analytic checks (tests/test_kmeans_components.py):
means vs mean_numerators/counts, distances vs np.linalg.norm, objective; plus
segmenter smoke + convergence checks.
"""

import numpy as np
import numpy.testing as npt

from segmentalist_tpu.models.kmeans import KMeans
from segmentalist_tpu.segmenters.kmeans_seg import SegmentalKMeansWordseg


def _gen(seed=1, N=10, D=3, K_true=4):
    rng = np.random.RandomState(seed)
    z_true = rng.randint(0, K_true, N)
    mu = rng.randn(D, K_true) * 4.0
    X = (mu[:, z_true] + rng.randn(D, N) * 0.7).T
    return X, z_true


def test_means_and_distances():
    """Reference tests/test_kmeans_components.py:13-79."""
    X, _ = _gen()
    N, D = X.shape
    np.random.seed(1)
    assignments = np.random.randint(0, 3, N)
    model = KMeans(X, 3, assignments)

    n = 0
    means = np.asarray(model.means())
    for k in range(3):
        members = X[assignments == k]
        if len(members) == 0:
            continue
        n += len(members)
        npt.assert_almost_equal(members.mean(axis=0), means[k])
    assert n == N

    for i in range(N):
        expected = [-np.linalg.norm(X[i] - means[k]) ** 2 for k in range(3)]
        npt.assert_almost_equal(np.asarray(model.neg_sqrd_norm(i)), expected)


def test_sum_neg_sqrd_norm():
    """Reference tests/test_kmeans_components.py:82-117."""
    X, _ = _gen()
    N = X.shape[0]
    np.random.seed(1)
    assignments = np.random.randint(0, 3, N)
    model = KMeans(X, 3, assignments)
    means = np.asarray(model.means())
    expected = sum(
        -np.linalg.norm(X[i] - means[assignments[i]]) ** 2 for i in range(N)
    )
    npt.assert_almost_equal(model.sum_neg_sqrd_norm(), expected)


def test_fit_converges_and_early_stops():
    X, z_true = _gen(N=60, K_true=3)
    np.random.seed(2)
    model = KMeans(X, 5, "spread")
    record = model.fit(50)
    assert record["n_mean_updates"][-1] == 0  # early stop fired
    assert record["sum_neg_sqrd_norm"][-1] >= record["sum_neg_sqrd_norm"][0]
    # k-means on separated data must be pure.
    a = np.asarray(model.assignments)
    for k in np.unique(a):
        members = z_true[a == k]
        assert np.bincount(members).max() == len(members)


def _toy_corpus():
    rng = np.random.RandomState(0)
    # Two "words" in embedding space; utterances of 3 landmarks.
    w1 = rng.randn(4)
    w2 = rng.randn(4) + 4.0
    mats, vids, durs, lms = {}, {}, {}, {}
    n_slices = 3
    for u in range(4):
        # Candidate embeddings for all spans of a 3-landmark utterance.
        vec_ids = -1 * np.ones((n_slices ** 2 + n_slices) // 2, dtype=int)
        i_embed = 0
        rows = []
        for cur_start in range(n_slices):
            for cur_end in range(cur_start, n_slices):
                t = cur_end + 1
                i = t * (t - 1) // 2
                vec_ids[i + cur_start] = i_embed
                # Single-slice spans at landmarks 0 and 1+2 look like w1 / w2.
                if cur_start == 0 and cur_end == 0:
                    rows.append(w1 + 0.05 * rng.randn(4))
                elif cur_start == 1 and cur_end == 2:
                    rows.append(w2 + 0.05 * rng.randn(4))
                else:
                    rows.append(rng.randn(4) * 2.0)
                i_embed += 1
        mats["utt%d" % u] = np.array(rows)
        vids["utt%d" % u] = vec_ids
        durs["utt%d" % u] = [1, 2, 1, 3, 2, 1]
        lms["utt%d" % u] = [1, 2, 3]
    return mats, vids, durs, lms


def test_segmental_kmeans_runs_and_improves():
    mats, vids, durs, lms = _toy_corpus()
    np.random.seed(1)
    seg = SegmentalKMeansWordseg(
        am_K=3, embedding_mats=mats, vec_ids_dict=vids, durations_dict=durs,
        landmarks_dict=lms, p_boundary_init=0.5, n_slices_max=3, batch_size=2,
    )
    record = seg.segment(5, n_iter_inbetween_kmeans=1)
    assert record["sum_neg_len_sqrd_norm"][-1] >= record["sum_neg_len_sqrd_norm"][0]
    for i in range(4):
        tr = seg.get_unsup_transcript_i(i)
        assert all(k >= 0 for k in tr)
        assert seg.get_max_unsup_transcript_i(i)  # runs
    # Triangular parity helper runs and masks invalids.
    v = seg.get_vec_embed_neg_len_sqrd_norms(
        seg.utterances.vec_ids[0], seg.utterances.durations[0]
    )
    assert np.isfinite(v).all()


def test_segmental_kmeans_batch1_matches_semantics():
    """segment_i processes exactly one utterance."""
    mats, vids, durs, lms = _toy_corpus()
    np.random.seed(1)
    seg = SegmentalKMeansWordseg(
        am_K=3, embedding_mats=mats, vec_ids_dict=vids, durations_dict=durs,
        landmarks_dict=lms, p_boundary_init=0.5, n_slices_max=3, batch_size=1,
    )
    before = [seg.get_unsup_transcript_i(i) for i in range(4)]
    seg.segment_i(2)
    after = [seg.get_unsup_transcript_i(i) for i in range(4)]
    # Other utterances' segmentations unchanged (their boundaries fixed).
    for i in (0, 1, 3):
        b0 = seg.utterances.boundaries[i]
        assert b0[len(lms["utt%d" % i]) - 1]
