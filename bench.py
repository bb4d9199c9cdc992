"""Benchmark: unigram FBGMM acoustic word segmentation at Buckeye scale.

Measures full blocked-Gibbs sweeps/sec of the flagship configuration
(BASELINE.json config #3: unigram segmenter, fixed-variance components) on a
synthetic corpus with ~50k candidate embeddings, and compares against the
reference implementation's per-sweep cost.

Baseline estimation: the reference scores each candidate with a vectorised
numpy ``log_marg_i`` (K-vector ops + logsumexp) in a Python loop per utterance
(``unigram_acoustic_wordseg.py:474-511``, ``fbgmm.py:256-286``).  We time a
faithful numpy re-creation of that per-candidate computation on a subsample
and extrapolate to the full corpus; the DP (Cython logsumexp per landmark) is
charged at the same measured per-op cost.  This is conservative -- the real
Python-2 reference adds interpreter overhead we do not charge.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compile cache: repeated bench runs skip the slow (minutes,
# remote-tunnel) TPU compile.  The sandbox's sitecustomize imports jax before
# this module, so the env var alone is too late -- set it via the config.
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# --------------------------------------------------------------------------
# Corpus configuration: ~50k candidate embeddings (Buckeye-scale per
# BASELINE.json), D=13 downsampled AWEs, K=1000 components.
N_UTT = 1000
N_LANDMARKS_MAX = 20
D_EMBED = 13
K_COMPONENTS = 1000
N_SLICES_MAX = 6
BATCH_SIZE = 250
N_SWEEPS = 5


def build_segmenter():
    from segmentalist_tpu import FBGMM, FixedVarPrior
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
    from segmentalist_tpu.utils.synth import synthetic_corpus

    (embedding_mats, vec_ids_dict, durations_dict, landmarks_dict, truth) = (
        synthetic_corpus(
            n_utterances=N_UTT, n_landmarks_max=N_LANDMARKS_MAX, D=D_EMBED,
            K_true=50, n_slices_max=N_SLICES_MAX, seed=0,
        )
    )
    n_cand = sum(m.shape[0] for m in embedding_mats.values())
    prior = FixedVarPrior.create(
        0.05 * np.ones(D_EMBED, np.float32),
        np.zeros(D_EMBED, np.float32),
        1.0 * np.ones(D_EMBED, np.float32),
    )
    np.random.seed(0)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=K_COMPONENTS, am_param_prior=prior,
        embedding_mats={k: v.astype(np.float32) for k, v in embedding_mats.items()},
        vec_ids_dict=vec_ids_dict, durations_dict=durations_dict,
        landmarks_dict=landmarks_dict, p_boundary_init=0.5,
        beta_sent_boundary=-1, n_slices_max=N_SLICES_MAX,
        batch_size=BATCH_SIZE, seed=0,
    )
    return seg, n_cand, truth


def time_tpu_sweeps(seg):
    # Warmup (compile).
    t0 = time.time()
    seg.gibbs_sample(1)
    warmup = time.time() - t0
    print("warmup (incl. compile): %.1fs" % warmup, file=sys.stderr)
    t0 = time.time()
    rec = seg.gibbs_sample(N_SWEEPS)
    dt = (time.time() - t0) / N_SWEEPS
    return dt, rec


def estimate_reference_sweep_seconds(n_candidates, n_landmarks_total):
    """Time the reference's per-candidate numpy scoring on a subsample."""
    rng = np.random.RandomState(0)
    K, D = K_COMPONENTS, D_EMBED
    mu_pred = rng.randn(K, D)
    prec_pred = np.abs(rng.randn(K, D)) + 0.5
    log_prod = np.sum(np.log(prec_pred), axis=1)
    counts = rng.randint(0, 50, K)
    n_sample = 2000
    xs = rng.randn(n_sample, D)

    def log_marg_i(x):
        # fbgmm.py:256-286 + gaussian_components_fixedvar.py:242-253
        log_prob_z = np.log(1.0 / K + counts) - np.log(counts.sum() + 1.0)
        deltas = mu_pred - x
        log_prob_z = log_prob_z + (
            -0.5 * D * np.log(2 * np.pi)
            + 0.5 * log_prod
            - 0.5 * ((deltas * deltas) * prec_pred).sum(axis=1)
        )
        m = log_prob_z.max()
        return np.log(np.exp(log_prob_z - m).sum()) + m

    # Best-of-3 to damp host-load noise in the baseline estimate.
    per_candidate = float("inf")
    for _ in range(3):
        t0 = time.time()
        for i in range(n_sample):
            log_marg_i(xs[i])
        per_candidate = min(per_candidate, (time.time() - t0) / n_sample)

    # Forward+backward DP: ~2 windowed logsumexp per landmark, tiny next to
    # scoring; charge one candidate-equivalent per landmark.
    ref_sweep = per_candidate * (n_candidates + n_landmarks_total)
    print(
        "reference emulation: %.1f us/candidate -> %.2f s/sweep"
        % (per_candidate * 1e6, ref_sweep),
        file=sys.stderr,
    )
    return ref_sweep


def main():
    seg, n_cand, truth = build_segmenter()
    n_landmarks_total = sum(seg.utterances.lengths)
    print(
        "corpus: %d utterances, %d candidate embeddings, %d landmarks, "
        "K=%d, D=%d" % (seg.utterances.D, n_cand, n_landmarks_total,
                        K_COMPONENTS, D_EMBED),
        file=sys.stderr,
    )

    sweep_seconds, rec = time_tpu_sweeps(seg)
    sweeps_per_sec = 1.0 / sweep_seconds

    # Segmentation quality on the synthetic ground truth.
    from segmentalist_tpu.utils.synth import boundary_f_score

    seg._sync_boundaries_to_host()
    pred = {
        utt: seg.utterances.boundaries[i]
        for i, utt in enumerate(seg.ids_to_utterance_labels)
    }
    p, r, f1 = boundary_f_score(pred, truth)
    evals_per_sec = n_cand * K_COMPONENTS / sweep_seconds
    print(
        "sweep: %.4fs (%.2f sweeps/s), %.3g logprob evals/s, "
        "boundary F1=%.3f (P=%.3f R=%.3f), log_marg=%.1f"
        % (sweep_seconds, sweeps_per_sec, evals_per_sec, f1, p, r,
           rec["log_marg"][-1]),
        file=sys.stderr,
    )

    ref_sweep = estimate_reference_sweep_seconds(n_cand, n_landmarks_total)
    vs_baseline = ref_sweep / sweep_seconds

    print(json.dumps({
        "metric": "unigram_fbgmm_gibbs_sweeps_per_sec_buckeye_scale",
        "value": round(sweeps_per_sec, 4),
        "unit": "sweeps/sec (50k candidates, K=1000, 1 chip)",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
