"""End-to-end word segmentation on a synthetic AWE corpus.

Counterpart of the reference module main() demos
(unigram_acoustic_wordseg.py:871-963, kmeans_acoustic_wordseg.py,
bigram_acoustic_wordseg.py:765-857): build a corpus of utterances with known
word boundaries, run each of the three segmenters, and report boundary
precision/recall/F1 and discovered cluster counts.

    JAX_PLATFORMS=cpu python examples/segmentation_example.py   # seconds
    python examples/segmentation_example.py                     # TPU
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from segmentalist_tpu import FBGMM, FixedVarPrior
from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg
from segmentalist_tpu.segmenters.kmeans_seg import SegmentalKMeansWordseg
from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
from segmentalist_tpu.utils.synth import boundary_f_score, synthetic_corpus


def main():
    em, vi, du, lm, truth = synthetic_corpus(
        n_utterances=60, n_landmarks_max=10, D=8, K_true=6, n_slices_max=4,
        seed=0)
    D = 8
    prior = FixedVarPrior.create(0.05 * np.ones(D), np.zeros(D), np.ones(D))

    def report(name, seg, rec_key, rec):
        seg._sync_boundaries_to_host()
        pred = {u: seg.utterances.boundaries[i]
                for i, u in enumerate(seg.ids_to_utterance_labels)}
        p, r, f1 = boundary_f_score(pred, truth)
        print("%-22s P=%.3f R=%.3f F1=%.3f   %s=%.1f" % (
            name, p, r, f1, rec_key, rec[rec_key][-1]))
        print("  utt0 transcript:", seg.get_unsup_transcript_i(0))

    np.random.seed(0)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=30, am_param_prior=prior,
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=4, batch_size=20, seed=0)
    rec = seg.gibbs_sample(15)
    report("unigram FBGMM", seg, "log_marg", rec)

    np.random.seed(0)
    km = SegmentalKMeansWordseg(
        am_K=30, embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, n_slices_max=4,
        batch_size=20, seed=0)
    rec = km.segment(15)
    report("segmental k-means", km, "sum_neg_sqrd_norm", rec)

    np.random.seed(0)
    bi = BigramAcousticWordseg(
        am_K=30, am_param_prior=prior,
        lm_params={"type": "smooth", "intrp_lambda": 0.1, "a": 1.0, "b": 1.0},
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=4, fb_type="unigram", batch_size=20, seed=0)
    rec = bi.gibbs_sample(15)
    report("bigram FBGMM", bi, "log_marg", rec)


if __name__ == "__main__":
    main()
