"""Single-chip scaling sweeps: corpus size and utterance length.

Two axes the flagship benchmark (../bench.py: 1000 utterances x <= 20
landmarks) holds fixed:

  * corpus scale -- 1x / 4x / 16x utterances at the same K/D/W.  The sweep
    is linear in corpus size on one chip; the corpus axis is also the mesh
    axis (segmentalist_tpu.parallel), so multi-chip data parallelism shards
    the same sweep.
  * utterance length -- N_max 20 / 60 / 120 landmarks at 1x utterance count.
    The DP cost is O(N * W) per utterance (the reference's windowing,
    SURVEY.md section 5.7), so time grows linearly with N, not N^2.

Run on the TPU chip:  python benchmarks/scaling.py
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
# 64 sweeps x best-of-2 amortise the end-of-call fetch RPC (30-150 ms)
# below the noise floor at the fast configs' ~7-11 ms/sweep.
SWEEPS = 64


def run(n_utt, n_lm, batch):
    from segmentalist_tpu import FBGMM, FixedVarPrior
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
    from segmentalist_tpu.utils.synth import boundary_f_score, synthetic_corpus

    em, vi, du, lm, truth = synthetic_corpus(
        n_utterances=n_utt, n_landmarks_max=n_lm, D=D, K_true=50,
        n_slices_max=W, seed=0,
    )
    em = {k: v.astype(np.float32) for k, v in em.items()}
    n_cand = sum(m.shape[0] for m in em.values())
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
    from segmentalist_tpu.segmenters.unigram import _WORDSEG_CHUNK

    t0 = time.time()
    seg.gibbs_sample(1)
    seg.gibbs_sample(_WORDSEG_CHUNK)  # warm the fused chunk program too
    warm = time.time() - t0
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        seg.gibbs_sample(SWEEPS)
        dt = min(dt, (time.time() - t0) / SWEEPS)
    seg._sync_boundaries_to_host()
    pred = {u: seg.utterances.boundaries[i]
            for i, u in enumerate(seg.ids_to_utterance_labels)}
    f1 = boundary_f_score(pred, truth)[2]
    print("U=%5d N_max=%3d B=%4d  %7d candidates  %.4f s/sweep  F1=%.3f"
          "  (warmup %.0fs)" % (n_utt, n_lm, batch, n_cand, dt, f1, warm),
          flush=True)
    return dt


def main():
    print("-- corpus scale (N_max=20) --", flush=True)
    t1 = run(1000, 20, 125)
    t4 = run(4000, 20, 125)
    t16 = run(16000, 20, 250)
    print("4x: %.2fx time   16x: %.2fx time" % (t4 / t1, t16 / t1))
    print("-- utterance length (1000 utterances) --", flush=True)
    l1 = run(1000, 20, 125)
    l3 = run(1000, 60, 125)
    l6 = run(1000, 120, 125)
    print("3x length: %.2fx time   6x length: %.2fx time"
          % (l3 / l1, l6 / l1))


if __name__ == "__main__":
    main()
