"""Deterministic argmax oracle for the segmental k-means move (segment_i).

The reference never tested its k-means segmenter end to end; this oracle
enumerates the duration-scaled best-component segmentation and the argmax
assignments from first principles (leave-out means included) and asserts
segment_i reproduces them exactly.
"""
import jax
import numpy as np

from segmentalist_tpu.segmenters.kmeans_seg import SegmentalKMeansWordseg

_PATTERNS = {
    (0, 0, 1): [(0, 3)],
    (1, 0, 1): [(0, 1), (1, 3)],
    (0, 1, 1): [(0, 2), (2, 3)],
    (1, 1, 1): [(0, 1), (1, 2), (2, 3)],
}

def _tri(t_excl, start):
    return t_excl * (t_excl - 1) // 2 + start

def _pattern_embeds(pattern):
    return [_tri(e, s) for s, e in _PATTERNS[pattern]]


def test_kmeans_segment_move_matches_argmax_oracle():
    """segment_i is deterministic: duration-scaled best-component distances
    per candidate (reference kmeans_acoustic_wordseg.py:334-351), max-sum
    segmentation (Viterbi, :449-555), then argmax assignments (:436-442)."""
    rng = np.random.RandomState(21)
    emb0 = rng.randn(6, 2) * 1.3
    emb1 = rng.randn(3, 2)
    embedding_mats = {"u0": emb0, "u1": emb1}
    vec_ids_dict = {"u0": np.arange(6), "u1": np.arange(3)}
    durations = np.array([1.0, 2.0, 1.0, 3.0, 2.0, 1.0])
    durations_dict = {"u0": durations.astype(int).tolist(), "u1": [1, 2, 1]}
    landmarks_dict = {"u0": [1, 2, 3], "u1": [1, 2]}
    wip = 0.7
    np.random.seed(19)
    seg = SegmentalKMeansWordseg(
        am_K=3, embedding_mats=embedding_mats, vec_ids_dict=vec_ids_dict,
        durations_dict=durations_dict, landmarks_dict=landmarks_dict,
        p_boundary_init=0.5, n_slices_max=3, wip=wip, batch_size=1, seed=19)
    am = seg.acoustic_model

    # Oracle from the segmenter's CURRENT state, with utterance 0's own
    # segments left out of the means (the reference deletes them first,
    # kmeans_acoustic_wordseg.py:253-259).
    counts = np.asarray(am.state.counts).astype(float)
    sum_x = np.asarray(am.state.sum_x).astype(float)
    assignments = np.asarray(am.state.assignments)
    random_means = np.asarray(am.random_means)
    old_embeds = [e for e in seg.utterances.get_segmented_embeds_i(0)
                  if e != -1]
    for e in old_embeds:
        k = assignments[e]
        counts[k] -= 1
        sum_x[k] -= emb0[e]
    means = np.where((counts > 0)[:, None],
                     sum_x / np.maximum(counts, 1)[:, None], random_means)

    def cand_score(e):
        d2 = ((emb0[e][None, :] - means) ** 2).sum(-1)
        return -d2.min() * durations[e] + wip

    best_p = max(_PATTERNS, key=lambda p: sum(cand_score(e)
                                              for e in _pattern_embeds(p)))
    best_ks = [int(np.argmin(((emb0[e][None, :] - means) ** 2).sum(-1)))
               for e in _pattern_embeds(best_p)]

    st0 = am.state
    b0 = seg._boundaries_dev
    for t in range(3):
        am.state = st0
        seg._boundaries_dev = b0
        seg.segment_i(0)
        bounds = tuple(np.asarray(seg._boundaries_dev)[0, :3]
                       .astype(int).tolist())
        assert bounds == best_p, (bounds, best_p)
        ks = [int(np.asarray(am.state.assignments)[e])
              for e in _pattern_embeds(bounds)]
        assert ks == best_ks, (ks, best_ks)
