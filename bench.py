"""Benchmark: every BASELINE.json config, with per-config reference baselines.

Configs (BASELINE.json "configs"):
  1. clustering_2d   FBGMM (fixed-var) on the 2-D toy of the reference
                     notebook (examples/clustering_examples.ipynb: N=100,
                     D=2, K=4), sequential collapsed-Gibbs (exact chain).
  2. kmeans_wordseg  Segmental k-means word segmentation at Buckeye scale.
  3. unigram_fixed   Unigram FBGMM segmentation, fixed-variance components
                     (the flagship / headline config).
  4. unigram_full    Unigram FBGMM with full NIW covariance.
  5. bigram          Bigram FBGMM + smooth interpolated bigram LM.

Configs 2-5 run on a synthetic corpus with ~52k candidate embeddings /
1000 utterances / K=1000 / D=13 (Buckeye scale per BASELINE.json) on one
TPU chip.

Baseline estimation (per config; Python 2 is unavailable in this image, so
the reference cannot be executed directly): each config times a faithful
numpy re-creation of the reference's own per-item computation on a
subsample and extrapolates to its per-sweep operation counts:

  * fixed-var / bigram scoring: vectorised K-component Gaussian predictive +
    logsumexp per candidate (fbgmm.py:256-286,
    gaussian_components_fixedvar.py:242-253) -- a Python-loop per candidate.
  * full NIW: per-candidate K-component multivariate Student-t einsum
    (gaussian_components.py:228-251) PLUS the O(D^3) `inv`+`slogdet` the
    reference pays per item add/delete (:319-331), charged twice per token
    per sweep (delete + re-add).
  * k-means: per-candidate K-component squared-distance max
    (kmeans_components.py:169-226).
  * bigram extra: per-token K-vector smoothed conditional
    (bigram_lms.py:56-91) for the sequential assignment chain
    (bigram_acoustic_wordseg.py:482-494), plus the corpus-replay log_prob_z
    (:287-305) once per sweep.
  * DP: a measured per-landmark windowed logsumexp + normalized draw
    (unigram_acoustic_wordseg.py:691-751), charged once per landmark.
  * 2-D toy: the reference's entire per-item Gibbs body (delete, score
    K=4, draw, add) in a Python loop, charged N=100 times per sweep.

This is conservative -- the real Python-2 reference adds interpreter and
bookkeeping overhead we do not charge.

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "configs": {name:
   {"sweeps_per_sec", "ref_sweeps_per_sec", "vs_baseline", "f1"}}}

On ANY failure (most commonly: the TPU tunnel is down and the axon backend
cannot initialize) it still prints exactly one JSON line -- with an "error"
field and whatever configs completed -- and exits nonzero.  The traceback
goes to stderr.  The one-JSON-line-on-stdout invariant holds in both
outcomes (CLAUDE.md).
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
# Corpus configuration: ~52k candidate embeddings (Buckeye-scale per
# BASELINE.json), D=13 downsampled AWEs, K=1000 components.
N_UTT = 1000
N_LANDMARKS_MAX = 20
D_EMBED = 13
K_COMPONENTS = 1000
N_SLICES_MAX = 6
BATCH_SIZE = 125
# Each gibbs_sample call ends with ONE batched device fetch -- a full RPC
# round-trip on a remote-attached chip (30-150 ms observed).  Enough sweeps
# per timed call amortise it below the noise floor: at the current ~7.5
# ms/sweep flagship cost, 64 sweeps = ~0.5 s timed region, and the best of
# two calls bounds the residual RPC inflation to the *minimum* round-trip
# (~30 ms, <7%) rather than an unlucky 150 ms spike.
N_SWEEPS = 64
N_TIMED_CALLS = 2


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def corpus():
    from segmentalist_tpu.utils.synth import synthetic_corpus

    em, vi, du, lm, truth = synthetic_corpus(
        n_utterances=N_UTT, n_landmarks_max=N_LANDMARKS_MAX, D=D_EMBED,
        K_true=50, n_slices_max=N_SLICES_MAX, seed=0,
    )
    em = {k: v.astype(np.float32) for k, v in em.items()}
    return em, vi, du, lm, truth


def fixed_prior():
    from segmentalist_tpu import FixedVarPrior

    return FixedVarPrior.create(
        0.05 * np.ones(D_EMBED, np.float32),
        np.zeros(D_EMBED, np.float32),
        1.0 * np.ones(D_EMBED, np.float32),
    )


def time_sweeps(sample):
    from segmentalist_tpu.segmenters.unigram import _WORDSEG_CHUNK

    t0 = time.time()
    sample(1)  # warmup / compile the single-sweep path
    # Warm the fused multi-sweep chunk too (it is a separate jit program;
    # compiling it inside the timed region charged ~20 s of tunnel compile
    # to the per-sweep number).
    sample(_WORDSEG_CHUNK)
    log("  warmup (incl. compile): %.1fs" % (time.time() - t0))
    dt = float("inf")
    for _ in range(N_TIMED_CALLS):
        t0 = time.time()
        rec = sample(N_SWEEPS)
        dt = min(dt, (time.time() - t0) / N_SWEEPS)
    return dt, rec


def f1_of(seg, truth):
    from segmentalist_tpu.utils.synth import boundary_f_score

    seg._sync_boundaries_to_host()
    pred = {
        utt: seg.utterances.boundaries[i]
        for i, utt in enumerate(seg.ids_to_utterance_labels)
    }
    return boundary_f_score(pred, truth)[2]


def best_of(fn, n_items, reps=3):
    """Best-of-N per-item wall time of a host-side emulation loop."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, (time.time() - t0) / n_items)
    return best


# --------------------------------------------------------------------------
# Reference emulations (numpy re-creations of the per-item reference math).

def ref_fixedvar_candidate_seconds(K=K_COMPONENTS, D=D_EMBED, lm_weights=False):
    """fbgmm.py:256-286 + gaussian_components_fixedvar.py:242-253 (and for
    the bigram driver the identical-shape log_marg_i_embed_unigram,
    bigram_acoustic_wordseg.py:314-329)."""
    rng = np.random.RandomState(0)
    mu_pred = rng.randn(K, D)
    prec_pred = np.abs(rng.randn(K, D)) + 0.5
    log_prod = np.sum(np.log(prec_pred), axis=1)
    counts = rng.randint(0, 50, K)
    lmw = np.log((counts + 1.0 / K) / (counts.sum() + 1.0))  # lm weights
    n_sample = 2000
    xs = rng.randn(n_sample, D)

    def log_marg_i(x):
        if lm_weights:
            log_prob_z = lmw.copy()
        else:
            log_prob_z = np.log(1.0 / K + counts) - np.log(counts.sum() + 1.0)
        deltas = mu_pred - x
        log_prob_z = log_prob_z + (
            -0.5 * D * np.log(2 * np.pi)
            + 0.5 * log_prod
            - 0.5 * ((deltas * deltas) * prec_pred).sum(axis=1)
        )
        m = log_prob_z.max()
        return np.log(np.exp(log_prob_z - m).sum()) + m

    return best_of(lambda: [log_marg_i(xs[i]) for i in range(n_sample)],
                   n_sample)


def ref_full_candidate_seconds(K=K_COMPONENTS, D=D_EMBED):
    """Multivariate Student-t over K components per candidate
    (gaussian_components.py:228-251: einsum over deltas x inv_covars)."""
    rng = np.random.RandomState(0)
    mu_pred = rng.randn(K, D)
    inv_covars = np.broadcast_to(np.eye(D), (K, D, D)).copy()
    logdets = rng.rand(K)
    vs = rng.randint(D + 1, D + 50, K).astype(float)
    counts = rng.randint(0, 50, K)
    from scipy.special import gammaln
    n_sample = 500
    xs = rng.randn(n_sample, D)

    def log_marg_i(x):
        deltas = mu_pred - x
        # reference: np.einsum per candidate (gaussian_components.py:351-352)
        maha = np.einsum("kd,kde,ke->k", deltas, inv_covars, deltas)
        v = vs
        logp = (
            gammaln((v + D) / 2.0) - gammaln(v / 2.0)
            - D / 2.0 * np.log(v) - D / 2.0 * np.log(np.pi)
            - 0.5 * logdets - (v + D) / 2.0 * np.log1p(maha / v)
        )
        logp = logp + np.log(1.0 / K + counts) - np.log(counts.sum() + 1.0)
        m = logp.max()
        return np.log(np.exp(logp - m).sum()) + m

    return best_of(lambda: [log_marg_i(xs[i]) for i in range(n_sample)],
                   n_sample)


def ref_dp_landmark_seconds(W=N_SLICES_MAX):
    """Per-landmark cost of the reference's FFBS DP: one windowed logsumexp
    in the forward pass (unigram_acoustic_wordseg.py:691-703) plus one
    normalized windowed draw in the backward pass (:709-751), as Python-loop
    numpy on <= W-wide windows."""
    rng = np.random.RandomState(0)
    n_sample = 4000
    windows = rng.randn(n_sample, W)
    alphas = rng.randn(n_sample, W)

    def one(i):
        # forward step: logsumexp over the window
        v = windows[i] + alphas[i]
        m = v.max()
        fwd = np.log(np.exp(v - m).sum()) + m
        # backward step: normalize + inverse-CDF draw (utils.py:10-21)
        p = np.exp(v - fwd)
        c = np.cumsum(p / p.sum())
        return np.searchsorted(c, 0.5)

    return best_of(lambda: [one(i) for i in range(n_sample)], n_sample)


def ref_full_update_seconds(D=D_EMBED):
    """Per add/del item update: O(D^3) inv + slogdet of the predictive
    covariance (gaussian_components.py:319-331)."""
    rng = np.random.RandomState(0)
    n_sample = 2000
    mats = rng.randn(n_sample, D, D)
    mats = mats @ mats.transpose(0, 2, 1) + 5 * np.eye(D)

    def one():
        for i in range(n_sample):
            np.linalg.inv(mats[i])
            np.linalg.slogdet(mats[i])

    return best_of(one, n_sample)


def ref_kmeans_candidate_seconds(K=K_COMPONENTS, D=D_EMBED):
    """Best-component negative squared distance per candidate
    (kmeans_components.py:169-226 + max at :228-229)."""
    rng = np.random.RandomState(0)
    means = rng.randn(K, D)
    n_sample = 2000
    xs = rng.randn(n_sample, D)

    def neg_sqrd_norm(x):
        deltas = means - x
        return (-(deltas * deltas).sum(axis=1)).max()

    return best_of(lambda: [neg_sqrd_norm(xs[i]) for i in range(n_sample)],
                   n_sample)


def ref_bigram_token_seconds(K=K_COMPONENTS):
    """Per-token sequential assignment extras in the bigram driver: the
    K-vector smoothed conditional (bigram_lms.py:56-91) + inverse-CDF draw
    (utils.py:10-21), on top of the fixed-var predictive charged per
    candidate."""
    rng = np.random.RandomState(0)
    unigram = rng.randint(0, 50, K).astype(float)
    bigram = rng.randint(0, 5, (K, K)).astype(float)
    n_sample = 2000
    js = rng.randint(0, K, n_sample)

    def one_token(j):
        uni = (unigram + 1.0 / K) / (unigram.sum() + 1.0)
        big = (bigram[j] + 1.0 / K) / (unigram[j] + 1.0)
        p = 0.1 * uni + 0.9 * big
        c = np.cumsum(p / p.sum())
        return np.searchsorted(c, 0.5)

    return best_of(lambda: [one_token(js[i]) for i in range(n_sample)],
                   n_sample)


def ref_bigram_replay_seconds(n_tokens, K=K_COMPONENTS):
    """Corpus-replay log_prob_z, once per sweep
    (bigram_acoustic_wordseg.py:287-305): per token two count lookups, a
    probability and a count update."""
    rng = np.random.RandomState(0)
    toks = rng.randint(0, 200, n_tokens)

    def replay():
        unigram = np.zeros(K)
        bigram = {}
        lp = 0.0
        j = -1
        for i in toks:
            p_uni = (unigram[i] + 1.0 / K) / (unigram.sum() + 1.0)
            if j >= 0:
                p_big = (bigram.get((j, i), 0) + 1.0 / K) / (unigram[j] + 1.0)
                lp += np.log(0.1 * p_uni + 0.9 * p_big)
                bigram[(j, i)] = bigram.get((j, i), 0) + 1
            else:
                lp += np.log(p_uni)
            unigram[i] += 1
            j = i
        return lp

    t0 = time.time()
    replay()
    return time.time() - t0


def ref_2d_fbgmm_sweep_seconds(N=100, K=4, D=2):
    """One collapsed-Gibbs sweep of the reference FBGMM on the notebook's
    2-D toy (fbgmm.py:351-403: per item delete, score K, draw, add)."""
    rng = np.random.RandomState(0)
    X = rng.randn(N, D)
    counts = np.full(K, N // K, dtype=float)
    mu_N = rng.randn(K, D)
    prec_N = np.abs(rng.randn(K, D)) + 1.0
    assign = np.arange(N) % K  # track real assignments so counts stay >= 0

    def sweep():
        for i in range(N):
            x = X[i]
            k_old = assign[i]
            counts[k_old] -= 1  # del_item
            mu_N[k_old] -= x / 10.0
            log_prob_z = np.log(1.0 / K + counts)
            deltas = mu_N - x
            log_prob_z = log_prob_z + (
                -0.5 * D * np.log(2 * np.pi)
                + 0.5 * np.sum(np.log(prec_N), axis=1)
                - 0.5 * ((deltas * deltas) * prec_N).sum(axis=1)
            )
            p = np.exp(log_prob_z - log_prob_z.max())
            c = np.cumsum(p / p.sum())
            k = int(np.searchsorted(c, rng.rand()))  # utils.py draw
            counts[k] += 1  # add_item
            mu_N[k] += x / 10.0
            assign[i] = k

    return best_of(sweep, 1, reps=5)


# --------------------------------------------------------------------------
# TPU runs.

def run_unigram_fixed(em, vi, du, lm, truth):
    from segmentalist_tpu import FBGMM
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg

    np.random.seed(0)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=K_COMPONENTS, am_param_prior=fixed_prior(),
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=N_SLICES_MAX, batch_size=BATCH_SIZE, seed=0,
    )
    dt, rec = time_sweeps(lambda n: seg.gibbs_sample(n))
    return seg, dt, rec


def run_unigram_full(em, vi, du, lm, truth):
    from segmentalist_tpu import FBGMM, NIW
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg

    prior = NIW.create(np.zeros(D_EMBED, np.float32), 0.05,
                       float(D_EMBED) + 3.0,
                       0.05 * np.eye(D_EMBED, dtype=np.float32))
    np.random.seed(0)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=K_COMPONENTS, am_param_prior=prior,
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, covariance_type="full", p_boundary_init=0.5,
        beta_sent_boundary=-1, n_slices_max=N_SLICES_MAX,
        batch_size=BATCH_SIZE, seed=0,
    )
    dt, rec = time_sweeps(lambda n: seg.gibbs_sample(n))
    return seg, dt, rec


def run_bigram(em, vi, du, lm, truth):
    from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg

    np.random.seed(0)
    seg = BigramAcousticWordseg(
        am_K=K_COMPONENTS, am_param_prior=fixed_prior(),
        lm_params={"type": "smooth", "intrp_lambda": 0.1, "a": 1.0, "b": 1.0},
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=N_SLICES_MAX, fb_type="unigram", batch_size=BATCH_SIZE,
        seed=0,
    )
    dt, rec = time_sweeps(lambda n: seg.gibbs_sample(n))
    return seg, dt, rec


def run_unigram_fixed_long():
    """Long-utterance row (N_max=120): exercises the dynamic-loop DP path
    (the register-unrolled filter covers N <= 128 but the chain kernels'
    VMEM tiles shrink) and the slab machinery at 6x the flagship candidate
    count (SURVEY.md section 5.7; benchmarks/scaling.py measured this config
    informally -- this puts it in the driver artifact)."""
    from segmentalist_tpu import FBGMM
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
    from segmentalist_tpu.utils.synth import synthetic_corpus

    em, vi, du, lm, truth = synthetic_corpus(
        n_utterances=N_UTT, n_landmarks_max=120, D=D_EMBED,
        K_true=50, n_slices_max=N_SLICES_MAX, seed=0,
    )
    em = {k: v.astype(np.float32) for k, v in em.items()}
    n_cand = sum(m.shape[0] for m in em.values())
    n_landmarks = sum(len(v) for v in lm.values())
    np.random.seed(0)
    seg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=K_COMPONENTS, am_param_prior=fixed_prior(),
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=N_SLICES_MAX, batch_size=BATCH_SIZE, seed=0,
    )
    dt, rec = time_sweeps(lambda n: seg.gibbs_sample(n))
    return seg, dt, rec, truth, n_cand, n_landmarks


def run_kmeans(em, vi, du, lm, truth):
    from segmentalist_tpu.segmenters.kmeans_seg import SegmentalKMeansWordseg

    np.random.seed(0)
    seg = SegmentalKMeansWordseg(
        am_K=K_COMPONENTS, embedding_mats=em, vec_ids_dict=vi,
        durations_dict=du, landmarks_dict=lm, p_boundary_init=0.5,
        n_slices_max=N_SLICES_MAX, batch_size=BATCH_SIZE, seed=0,
    )
    dt, rec = time_sweeps(lambda n: seg.segment(n))
    return seg, dt, rec


def run_2d_fbgmm():
    from segmentalist_tpu import FBGMM

    from segmentalist_tpu.models.fbgmm import _SWEEP_CHUNK, _SWEEP_CHUNK_BIG

    rng = np.random.RandomState(1)
    X = np.vstack([rng.randn(25, 2) + c for c in
                   ([0, 0], [4, 4], [-4, 4], [4, -4])]).astype(np.float32)
    np.random.seed(1)
    model = FBGMM(X, fixed_prior_2d(), alpha=1.0, K=4, assignments="rand",
                  covariance_type="fixed")
    t0 = time.time()
    # Warm all three dispatch paths (big chunk, chunk, single-sweep
    # remainder) so the timed run is compile-free.
    model.gibbs_sample(_SWEEP_CHUNK_BIG + _SWEEP_CHUNK + 1, mode="blocked")
    log("  warmup (incl. compile): %.1fs" % (time.time() - t0))
    # A chunk multiple, and enough sweeps to amortise the constant
    # end-of-run record fetch (~30 ms RPC on the remote-attached chip --
    # it dominated a 100-sweep run and misread as per-sweep cost; the
    # measured in-chunk device cost is ~75 us/sweep,
    # benchmarks/toy_breakdown.py).
    n = 100 * _SWEEP_CHUNK
    t0 = time.time()
    model.gibbs_sample(n, mode="blocked")
    return (time.time() - t0) / n


def fixed_prior_2d():
    from segmentalist_tpu import FixedVarPrior

    return FixedVarPrior.create(
        0.5 * np.ones(2, np.float32), np.zeros(2, np.float32),
        np.ones(2, np.float32),
    )


# --------------------------------------------------------------------------

def main(configs):
    # Fail fast (and clean) when the TPU backend cannot initialize: the
    # tunnel being down raises here, before any timing work.
    log("backend: %s" % (jax.devices(),))
    em, vi, du, lm, truth = corpus()
    n_cand = sum(m.shape[0] for m in em.values())
    n_landmarks = sum(len(v) for v in lm.values())
    log("corpus: %d utterances, %d candidates, %d landmarks, K=%d, D=%d"
        % (N_UTT, n_cand, n_landmarks, K_COMPONENTS, D_EMBED))

    def add(name, sweep_s, ref_sweep_s, f1=None):
        # ``sweep_ms`` is the stable headline number: the emulated-reference
        # denominator re-measures host-CPU per-item loops each run (best-of-3
        # of vectorised numpy bodies, see the ref_* functions above) and
        # varies ~2x run-to-run with host load, so ``vs_baseline`` inherits
        # that variance while the absolute device sweep time does not
        # (PERFORMANCE.md, "emulation-denominator protocol").
        configs[name] = {
            "sweeps_per_sec": round(1.0 / sweep_s, 4),
            "sweep_ms": round(sweep_s * 1e3, 4),
            "ref_sweeps_per_sec": round(1.0 / ref_sweep_s, 6),
            "vs_baseline": round(ref_sweep_s / sweep_s, 2),
        }
        if f1 is not None:
            configs[name]["f1"] = round(f1, 3)
        log("%-16s %8.4f s/sweep  ref %8.3f s/sweep  -> %7.1fx%s"
            % (name, sweep_s, ref_sweep_s, ref_sweep_s / sweep_s,
               ("  F1=%.3f" % f1) if f1 is not None else ""))

    # ---- 3. unigram fixed-var (flagship) ------------------------------- #
    log("[unigram_fixed]")
    seg, dt_fixed, rec = run_unigram_fixed(em, vi, du, lm, truth)
    per_cand_fixed = ref_fixedvar_candidate_seconds()
    dp_lm = ref_dp_landmark_seconds()
    log("  reference DP emulation: %.2f us/landmark" % (dp_lm * 1e6))
    ref_fixed = per_cand_fixed * n_cand + dp_lm * n_landmarks
    f1_fixed = f1_of(seg, truth)
    add("unigram_fixed", dt_fixed, ref_fixed, f1_fixed)
    n_tokens = int(rec["n_tokens"][-1])

    # Non-flagship configs are isolated: a mid-run device failure in one
    # still leaves a JSON record with every config that did complete.
    def guarded(name, fn):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 - record and continue
            import traceback

            log("  %s FAILED: %s" % (name, e))
            traceback.print_exc(file=sys.stderr)
            configs[name] = {"error": "%s: %s" % (type(e).__name__, e)}

    # ---- 4. unigram full NIW ------------------------------------------- #
    def _run_full():
        seg_f, dt_full, rec_f = run_unigram_full(em, vi, du, lm, truth)
        per_cand_full = ref_full_candidate_seconds()
        per_update_full = ref_full_update_seconds()
        n_tokens_full = int(rec_f["n_tokens"][-1])
        # Per sweep the reference deletes and re-adds every token's
        # embedding, each triggering the O(D^3) cache update
        # (gaussian_components:319-331).
        ref_full = (per_cand_full * n_cand + dp_lm * n_landmarks
                    + per_update_full * 2 * n_tokens_full)
        add("unigram_full", dt_full, ref_full, f1_of(seg_f, truth))

    log("[unigram_full]")
    guarded("unigram_full", _run_full)

    # ---- 5. bigram ------------------------------------------------------ #
    def _run_bigram():
        seg_b, dt_big, rec_b = run_bigram(em, vi, du, lm, truth)
        per_cand_big = ref_fixedvar_candidate_seconds(lm_weights=True)
        per_tok_big = ref_bigram_token_seconds()
        n_tokens_big = int(rec_b["n_tokens"][-1])
        replay = ref_bigram_replay_seconds(n_tokens_big)
        ref_big = (per_cand_big * n_cand + dp_lm * n_landmarks
                   + per_tok_big * n_tokens_big + replay)
        add("bigram", dt_big, ref_big, f1_of(seg_b, truth))

    log("[bigram]")
    guarded("bigram", _run_bigram)

    # ---- 2. segmental k-means ------------------------------------------ #
    def _run_kmeans():
        seg_k, dt_km, _ = run_kmeans(em, vi, du, lm, truth)
        per_cand_km = ref_kmeans_candidate_seconds()
        ref_km = per_cand_km * n_cand + dp_lm * n_landmarks
        add("kmeans_wordseg", dt_km, ref_km, f1_of(seg_k, truth))

    log("[kmeans_wordseg]")
    guarded("kmeans_wordseg", _run_kmeans)

    # ---- 6. long utterances (N_max=120) --------------------------------- #
    def _run_long():
        seg_l, dt_long, _, truth_l, n_cand_l, n_lm_l = run_unigram_fixed_long()
        ref_long = per_cand_fixed * n_cand_l + dp_lm * n_lm_l
        add("unigram_fixed_long", dt_long, ref_long, f1_of(seg_l, truth_l))
        configs["unigram_fixed_long"]["note"] = (
            "1000 utterances x N_max=120 landmarks (~%dk candidates, 6x the "
            "flagship); same K/D/W.  The lower F1 is a property of the "
            "synthetic task at this length, not of blocked Gibbs "
            "(benchmarks/blocked_vs_exact.py: the exact B=1 chain declines "
            "identically; PERFORMANCE.md scaling table)." % (n_cand_l // 1000)
        )

    log("[unigram_fixed_long]")
    guarded("unigram_fixed_long", _run_long)

    # ---- 1. 2-D toy clustering ----------------------------------------- #
    # The ONLY config with an in-repo measured reference number: the
    # notebook's logged sample_time, 13 ms/sweep for this exact config
    # (examples/clustering_examples.ipynb; SURVEY.md section 6).  We report
    # against that measurement and print this host's emulation alongside.
    # N=100 / K=4 has no parallelism for a TPU to exploit -- the per-sweep
    # cost is the dispatch/latency floor -- so unlike the Buckeye-scale
    # configs this one is reported for completeness, not speedup.
    def _run_toy():
        dt_2d = run_2d_fbgmm()
        ref_2d_notebook = 0.013
        ref_2d_emul = ref_2d_fbgmm_sweep_seconds()
        log("  host emulation of the reference toy sweep: %.4f s/sweep "
            "(notebook measurement: %.3f)" % (ref_2d_emul, ref_2d_notebook))
        add("clustering_2d", dt_2d, ref_2d_notebook)
        configs["clustering_2d"][
            "ref_emulation_this_host_sweeps_per_sec"] = (
            round(1.0 / ref_2d_emul, 2))
        configs["clustering_2d"]["note"] = (
            "vs the reference's own in-repo measured 13 ms/sweep "
            "(clustering_examples.ipynb); N=100, K=4 leaves the TPU nothing "
            "to parallelise, so the per-sweep cost is per-sweep kernel "
            "overhead inside the fused 256-sweep big chunks "
            "(per-dispatch RPC amortised; per-sweep kernel breakdown: "
            "benchmarks/toy_breakdown.py)"
        )

    log("[clustering_2d]")
    guarded("clustering_2d", _run_toy)

    evals_per_sec = n_cand * K_COMPONENTS / dt_fixed
    log("flagship: %.2f sweeps/s, %.3g logprob evals/s, F1=%.3f, "
        "n_tokens=%d" % (1.0 / dt_fixed, evals_per_sec, f1_fixed, n_tokens))

    print(json.dumps({
        "metric": "unigram_fbgmm_gibbs_sweeps_per_sec_buckeye_scale",
        "value": round(1.0 / dt_fixed, 4),
        "unit": "sweeps/sec (52k candidates, K=1000, 1 chip)",
        "sweep_ms": round(dt_fixed * 1e3, 4),
        "vs_baseline": round(ref_fixed / dt_fixed, 2),
        "configs": configs,
    }))


if __name__ == "__main__":
    _configs = {}
    try:
        main(_configs)
    except Exception as e:  # noqa: BLE001 - one JSON line in BOTH outcomes
        import traceback

        traceback.print_exc(file=sys.stderr)
        msg = "%s: %s" % (type(e).__name__, e)
        if "Unable to initialize backend" in str(e):
            msg = "tpu-backend-unavailable: " + msg
        print(json.dumps({
            "metric": "unigram_fbgmm_gibbs_sweeps_per_sec_buckeye_scale",
            "value": 0.0,
            "unit": "sweeps/sec (52k candidates, K=1000, 1 chip)",
            "vs_baseline": 0.0,
            "error": msg[:500],
            "configs": _configs,
        }))
        sys.exit(1)
