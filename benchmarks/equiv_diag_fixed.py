"""Diagnose the blocked-vs-exact fixed-family divergence found by
benchmarks/blocked_equivalence.py (blocked log_marg ~ -215k vs exact
~ -20k on the U=200 corpus): sweep batch_size and print the per-sweep
log_marg trajectory for each arm.  Measurement tooling only."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

U, N_MAX, D, K, W, SWEEPS = 200, 20, 13, 500, 6, 30


def main():
    from segmentalist_tpu import FBGMM, FixedVarPrior
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
    from segmentalist_tpu.utils.synth import synthetic_corpus

    em, vi, du, lm, _ = synthetic_corpus(
        n_utterances=U, n_landmarks_max=N_MAX, D=D, K_true=50,
        n_slices_max=W, seed=0)
    em = {k: v.astype(np.float32) for k, v in em.items()}
    prior = FixedVarPrior.create(
        0.05 * np.ones(D, np.float32), np.zeros(D, np.float32),
        np.ones(D, np.float32))
    for batch in (125, 63, 25, 5, 1):
        np.random.seed(0)
        seg = UnigramAcousticWordseg(
            FBGMM, am_alpha=1.0, am_K=K, am_param_prior=prior,
            embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
            landmarks_dict=lm, covariance_type="fixed",
            p_boundary_init=0.5, beta_sent_boundary=-1, n_slices_max=W,
            batch_size=batch, seed=0)
        rec = seg.gibbs_sample(SWEEPS)
        traj = np.asarray(rec["log_marg"])
        comp = np.asarray(rec["components"])
        print("batch=%-3d log_marg[0,1,2,14,29]=%s  components[0,29]=%s"
              % (batch,
                 np.array2string(traj[[0, 1, 2, 14, 29]], precision=1),
                 comp[[0, 29]]), flush=True)


if __name__ == "__main__":
    main()
