"""At-scale distributional equivalence: blocked sweeps (batch_size=125) vs
the exact reference-semantics chain (batch_size=1).

``batch_size=1`` reproduces the reference's utterance-at-a-time collapsed
Gibbs conditioning exactly (every utterance sees fully fresh statistics --
``unigram_acoustic_wordseg.py:449-455``, ``fbgmm.py:357-403``); the blocked
sweep freshens statistics only between blocks.  The toy-scale oracles
(tests/test_blocked_sweep_oracle.py, tests/test_exact_posterior*.py) prove
the per-block transition kernel exact; this harness adds the SURVEY section
7 acceptance measurement at scale: N seeds per arm on a 200-utterance
corpus, two-sample tests on the final log_marg and boundary-F1
distributions.  Run for the flagship fixed-variance family and one
non-fixed family (diag).

Run on the TPU chip (~15 min):  python benchmarks/blocked_equivalence.py
Writes EQUIV_rNN.json-style output on stdout (one JSON line at the end).
"""

import json
import os
import sys
import time

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

U = 200
N_MAX = 20
D = 13
K = 500
W = 6
SWEEPS = 30
SEEDS = int(os.environ.get("SEGTPU_EQUIV_SEEDS", "10"))


def build_corpus():
    from segmentalist_tpu.utils.synth import synthetic_corpus

    em, vi, du, lm, truth = synthetic_corpus(
        n_utterances=U, n_landmarks_max=N_MAX, D=D, K_true=50,
        n_slices_max=W, seed=0,
    )
    em = {k: v.astype(np.float32) for k, v in em.items()}
    return em, vi, du, lm, truth


def run_chain(corpus, cov_type, batch, seed):
    from segmentalist_tpu import FBGMM, FixedVarPrior, NIW
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
    from segmentalist_tpu.utils.synth import boundary_f_score

    em, vi, du, lm, truth = corpus
    if cov_type == "fixed":
        prior = FixedVarPrior.create(
            0.05 * np.ones(D, np.float32), np.zeros(D, np.float32),
            np.ones(D, np.float32))
    else:
        prior = NIW.create(np.zeros(D, np.float32), 0.05, float(D) + 3.0,
                           0.05 * np.ones(D, np.float32))
    np.random.seed(seed)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=K, am_param_prior=prior,
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, covariance_type=cov_type, p_boundary_init=0.5,
        beta_sent_boundary=-1, n_slices_max=W, batch_size=batch, seed=seed,
    )
    rec = seg.gibbs_sample(SWEEPS)
    seg._sync_boundaries_to_host()
    pred = {u: seg.utterances.boundaries[i]
            for i, u in enumerate(seg.ids_to_utterance_labels)}
    f1 = boundary_f_score(pred, truth)[2]
    return float(rec["log_marg"][-1]), float(f1)


def two_sample(a, b):
    from scipy import stats

    a, b = np.asarray(a), np.asarray(b)
    t = stats.ttest_ind(a, b, equal_var=False)
    u = stats.mannwhitneyu(a, b, alternative="two-sided")
    return {
        "blocked_mean": float(a.mean()), "blocked_std": float(a.std(ddof=1)),
        "exact_mean": float(b.mean()), "exact_std": float(b.std(ddof=1)),
        "welch_t_p": float(t.pvalue), "mannwhitney_p": float(u.pvalue),
    }


def main():
    corpus = build_corpus()
    out = {"config": {"U": U, "N_max": N_MAX, "D": D, "K": K, "W": W,
                      "sweeps": SWEEPS, "seeds": SEEDS,
                      "arms": {"blocked": 125, "exact": 1}},
           "families": {}}
    for cov_type in ("fixed", "diag"):
        arms = {}
        for batch in (125, 1):
            lm_vals, f1_vals = [], []
            for s in range(SEEDS):
                t0 = time.time()
                lmv, f1 = run_chain(corpus, cov_type, batch, s)
                lm_vals.append(lmv)
                f1_vals.append(f1)
                print("%s batch=%-3d seed=%d  log_marg=%.2f  F1=%.4f "
                      " (%.0fs)" % (cov_type, batch, s, lmv, f1,
                                    time.time() - t0), flush=True)
            arms[batch] = (lm_vals, f1_vals)
        out["families"][cov_type] = {
            "log_marg": two_sample(arms[125][0], arms[1][0]),
            "f1": two_sample(arms[125][1], arms[1][1]),
            "raw": {"blocked": {"log_marg": arms[125][0],
                                "f1": arms[125][1]},
                    "exact": {"log_marg": arms[1][0], "f1": arms[1][1]}},
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
