"""Blocked Gibbs (B=125) vs the exact reference-semantics chain (B=1) as
utterance length grows: settles whether the F1-vs-N_max decline measured in
PERFORMANCE.md is a property of the synthetic task or a blocked-Gibbs
artefact.

``batch_size=1`` reproduces the reference's utterance-at-a-time chain
exactly (segmenters/unigram.py docstring): every utterance conditions on
fully fresh statistics.  If blocked sweeps degraded quality at long N, the
B=1 runs would hold F1 while B=125 declines; if both decline identically,
the decline is the task's (longer utterances = more boundary positions
per token under the same K_true=50 prototype inventory).

Same corpus/prior/sweep-count recipe as benchmarks/scaling.py's length
sweep (U=1000, D=13, K=1000, W=6, 20 timed sweeps).

Run on the TPU chip:  python benchmarks/blocked_vs_exact.py
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

D = 13
K = 1000
W = 6
SWEEPS = 20


def run(n_utt, n_lm, batch):
    from segmentalist_tpu import FBGMM, FixedVarPrior
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
    from segmentalist_tpu.utils.synth import boundary_f_score, synthetic_corpus

    em, vi, du, lm, truth = synthetic_corpus(
        n_utterances=n_utt, n_landmarks_max=n_lm, D=D, K_true=50,
        n_slices_max=W, seed=0,
    )
    em = {k: v.astype(np.float32) for k, v in em.items()}
    prior = FixedVarPrior.create(
        0.05 * np.ones(D, np.float32), np.zeros(D, np.float32),
        np.ones(D, np.float32),
    )
    np.random.seed(0)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=K, am_param_prior=prior,
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=W, batch_size=batch, seed=0,
    )
    t0 = time.time()
    seg.gibbs_sample(1)
    warm = time.time() - t0
    t0 = time.time()
    seg.gibbs_sample(SWEEPS)
    dt = (time.time() - t0) / SWEEPS
    seg._sync_boundaries_to_host()
    pred = {u: seg.utterances.boundaries[i]
            for i, u in enumerate(seg.ids_to_utterance_labels)}
    f1 = boundary_f_score(pred, truth)[2]
    print("N_max=%3d B=%4d  %.4f s/sweep  F1=%.3f  (warmup %.0fs)"
          % (n_lm, batch, dt, f1, warm), flush=True)
    return f1


def main():
    for n_lm in (20, 60, 120):
        f1_blocked = run(1000, n_lm, 125)
        f1_exact = run(1000, n_lm, 1)
        print("N_max=%3d   blocked F1=%.3f   exact-chain F1=%.3f   "
              "delta=%+.3f" % (n_lm, f1_blocked, f1_exact,
                               f1_blocked - f1_exact), flush=True)


if __name__ == "__main__":
    main()
