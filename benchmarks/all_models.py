"""Buckeye-scale benchmarks for all three segmenter families.

The driver-facing flagship benchmark is ../bench.py (unigram fixed-var);
this script measures the other model families at the same corpus scale and
prints one line per family.  Run on the TPU chip:

    python benchmarks/all_models.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

N_UTT = 1000
N_LM = 20
D = 13
K = 1000
W = 6
B = 125
# 64 sweeps x best-of-2: the end-of-call fetch RPC (30-150 ms) must be
# amortised below the noise floor now that the fast families run ~3-8
# ms/sweep (20 sweeps of k-means is only ~66 ms of device time).
SWEEPS = 64
TIMED_CALLS = 2


def corpus():
    from segmentalist_tpu.utils.synth import synthetic_corpus

    return synthetic_corpus(n_utterances=N_UTT, n_landmarks_max=N_LM, D=D,
                            K_true=50, n_slices_max=W, seed=0)


def run(name, build, sample):
    em, vi, du, lm, truth = corpus()
    em = {k: v.astype(np.float32) for k, v in em.items()}
    seg = build(em, vi, du, lm)
    t0 = time.time()
    sample(seg, 1)
    # Warm the fused multi-sweep chunk too (separate jit program).
    from segmentalist_tpu.segmenters.unigram import _WORDSEG_CHUNK

    sample(seg, _WORDSEG_CHUNK)
    compile_s = time.time() - t0
    per_sweep = float("inf")
    for _ in range(TIMED_CALLS):
        t0 = time.time()
        rec = sample(seg, SWEEPS)
        per_sweep = min(per_sweep, (time.time() - t0) / SWEEPS)
    from segmentalist_tpu.utils.synth import boundary_f_score

    seg._sync_boundaries_to_host()
    pred = {u: seg.utterances.boundaries[i]
            for i, u in enumerate(seg.ids_to_utterance_labels)}
    _, _, f1 = boundary_f_score(pred, truth)
    print("%-28s %8.4f s/sweep  %6.1f sweeps/s  F1=%.3f  (compile %.0fs)"
          % (name, per_sweep, 1.0 / per_sweep, f1, compile_s), flush=True)


def main():
    from segmentalist_tpu import FBGMM, FixedVarPrior
    from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg
    from segmentalist_tpu.segmenters.kmeans_seg import SegmentalKMeansWordseg
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg

    prior = FixedVarPrior.create(0.05 * np.ones(D, np.float32),
                                 np.zeros(D, np.float32),
                                 np.ones(D, np.float32))

    def build_uni(em, vi, du, lm):
        np.random.seed(0)
        return UnigramAcousticWordseg(
            FBGMM, am_alpha=1.0, am_K=K, am_param_prior=prior,
            embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
            landmarks_dict=lm, p_boundary_init=0.5, beta_sent_boundary=-1,
            n_slices_max=W, batch_size=B, seed=0)

    def build_km(em, vi, du, lm):
        np.random.seed(0)
        return SegmentalKMeansWordseg(
            am_K=K, embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
            landmarks_dict=lm, p_boundary_init=0.5, n_slices_max=W,
            batch_size=B, seed=0)

    def build_bi(em, vi, du, lm):
        np.random.seed(0)
        return BigramAcousticWordseg(
            am_K=K, am_param_prior=prior,
            lm_params={"type": "smooth", "intrp_lambda": 0.1, "a": 1.0,
                       "b": 1.0},
            embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
            landmarks_dict=lm, p_boundary_init=0.5, beta_sent_boundary=-1,
            n_slices_max=W, fb_type="unigram", batch_size=B, seed=0)

    def build_full(em, vi, du, lm):
        from segmentalist_tpu.priors import NIW

        full_prior = NIW.create(np.zeros(D, np.float32), 0.05,
                                float(D) + 3.0,
                                0.05 * np.eye(D, dtype=np.float32))
        np.random.seed(0)
        return UnigramAcousticWordseg(
            FBGMM, am_alpha=1.0, am_K=K, am_param_prior=full_prior,
            embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
            landmarks_dict=lm, covariance_type="full", p_boundary_init=0.5,
            beta_sent_boundary=-1, n_slices_max=W, batch_size=B, seed=0)

    run("unigram FBGMM (fixed var)", build_uni,
        lambda s, n: s.gibbs_sample(n))
    run("segmental k-means", build_km, lambda s, n: s.segment(n))
    run("bigram FBGMM + smooth LM", build_bi, lambda s, n: s.gibbs_sample(n))
    def build_diag(em, vi, du, lm):
        from segmentalist_tpu.priors import NIW

        diag_prior = NIW.create(np.zeros(D, np.float32), 0.05,
                                float(D) + 3.0,
                                0.05 * np.ones(D, dtype=np.float32))
        np.random.seed(0)
        return UnigramAcousticWordseg(
            FBGMM, am_alpha=1.0, am_K=K, am_param_prior=diag_prior,
            embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
            landmarks_dict=lm, covariance_type="diag", p_boundary_init=0.5,
            beta_sent_boundary=-1, n_slices_max=W, batch_size=B, seed=0)

    run("unigram FBGMM (diag)", build_diag,
        lambda s, n: s.gibbs_sample(n))
    run("unigram FBGMM (full NIW)", build_full,
        lambda s, n: s.gibbs_sample(n))

    # Bigram driver, non-fixed covariance backends (round-3 kernel
    # coverage parity with the unigram driver: diag fused scoring +
    # bigram diag chain kernel; bigram-LM full-NIW chain kernel).
    def build_bi_cov(cov_type):
        from segmentalist_tpu.priors import NIW

        if cov_type == "diag":
            p = NIW.create(np.zeros(D, np.float32), 0.05, float(D) + 3.0,
                           0.05 * np.ones(D, dtype=np.float32))
        else:
            p = NIW.create(np.zeros(D, np.float32), 0.05, float(D) + 3.0,
                           0.05 * np.eye(D, dtype=np.float32))

        def build(em, vi, du, lm):
            np.random.seed(0)
            return BigramAcousticWordseg(
                am_K=K, am_param_prior=p,
                lm_params={"type": "smooth", "intrp_lambda": 0.1, "a": 1.0,
                           "b": 1.0},
                embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
                landmarks_dict=lm, covariance_type=cov_type,
                p_boundary_init=0.5, beta_sent_boundary=-1, n_slices_max=W,
                fb_type="unigram", batch_size=B, seed=0)

        return build

    run("bigram FBGMM (diag)", build_bi_cov("diag"),
        lambda s, n: s.gibbs_sample(n))
    run("bigram FBGMM (full NIW)", build_bi_cov("full"),
        lambda s, n: s.gibbs_sample(n))


if __name__ == "__main__":
    main()
