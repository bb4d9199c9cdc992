"""Unigram acoustic word segmentation (TPU-native).

Re-design of the reference ``UnigramAcousticWordseg``
(``unigram_acoustic_wordseg.py:27-564``): blocked Gibbs sampling alternating

  (a) per-utterance boundary resampling by forward-filtering backward-sampling
      over duration-scaled candidate log marginals, and
  (b) sequential component-assignment resampling of the new segments,

composed with an :class:`~segmentalist_tpu.models.fbgmm.FBGMM` acoustic model
and an :class:`~segmentalist_tpu.corpus.Utterances` corpus state.

TPU shape: utterances are processed in blocks of ``batch_size`` inside one
jitted sweep (see ``segmenters/common.py``); candidate scoring for the whole
block is a single embeddings x components kernel; the DP is the batched scan
of ``ops/dp.py``.  ``batch_size=1`` reproduces the reference's utterance-at-
a-time chain; larger blocks trade chain fidelity for throughput (documented
blocked-Gibbs approximation, SURVEY.md section 7).
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..corpus import Utterances
from ..models.fbgmm import FBGMM, component_logits_batch, log_weights
from ..ops import dp as dp_ops
from ..ops.random import NEG_INF, logsumexp
from ..ops.stats import add_item, canonicalize_new_component
from .common import (
    assign_rows_from_segments,
    cand_tables,
    decollide_new_components,
    flat_contrib,
    gather_block_segments,
    leave_out_moments_T,
    leave_out_stats,
    masked_candidate_scores,
    materialize_assignments,
    merge_sweep_assignments,
    pad_utterance_order,
    select_assign_slots,
    slab_segment_rows,
    utterance_contrib,
)

logger = logging.getLogger(__name__)

# Sweeps fused per device dispatch in ``gibbs_sample`` (a lax.scan over
# per-sweep temperatures, with the utterance permutation drawn ON DEVICE
# under the carried PRNG key).  On a remote-attached TPU every dispatch
# costs ~1 ms of round-trip latency -- ~10% of a flagship sweep -- so
# fusing 8 sweeps amortises it to ~1%.  A fixed chunk length keeps the jit
# cache to two entries (chunk + single-sweep remainder).
_WORDSEG_CHUNK = 8


def process_embeddings(embedding_mats, vec_ids_dict):
    """Flatten per-utterance embedding matrices into one [N, D] matrix and
    re-index the per-utterance ``vec_ids`` to global row ids
    (reference ``process_embeddings``, unigram_acoustic_wordseg.py:571-646).
    """
    embeddings = []
    vec_ids = []
    ids_to_utterance_labels = []
    i_embed = 0
    for utt in sorted(embedding_mats):
        ids_to_utterance_labels.append(utt)
        mat = np.asarray(embedding_mats[utt])
        local = np.asarray(vec_ids_dict[utt])
        remapped = np.where(local >= 0, local + i_embed, -1)
        embeddings.append(mat)
        vec_ids.append(remapped)
        i_embed += mat.shape[0]
    return np.concatenate(embeddings, axis=0), vec_ids, ids_to_utterance_labels


def _tri_to_dense(vec, N, W):
    """Packed triangular per-utterance score vector -> dense [1, N, W] scores
    (see corpus.py for the layouts).  -inf where the span is out of range.
    Vectorised gather (one fancy-index, no Python span loop)."""
    vec = np.asarray(vec, dtype=float)
    out = np.full((1, N, W), -np.inf)
    tg, wg = np.mgrid[0:N, 0:W]
    ok = wg <= tg  # spans reaching before the utterance start do not exist
    idx = (tg + 1) * tg // 2 + tg - wg
    out[0][ok] = vec[idx[ok]]
    return out


def _dense_to_tri(dense, lengths):
    """Dense [U, N_max, W] scores -> list of packed triangular vectors (the
    reference's per-utterance layout, ``utterances.py:59-65``), one per row.
    Slots whose span is wider than the ``W`` window come back -inf: the dense
    corpus tensors only hold the spans the DP window can consume
    (corpus.py module docstring).  Vectorised; the index maps are built once
    for the largest utterance and sliced per row."""
    dense = np.asarray(dense, dtype=float)
    _, N_max, W = dense.shape
    t = np.arange(N_max)
    tt = np.repeat(t, t + 1)  # packed slot -> span end t
    jj = np.concatenate([np.arange(k + 1) for k in t])  # packed slot -> start
    ww = tt - jj  # packed slot -> window index (duration - 1)
    ok = ww < W
    out = []
    for u, N in enumerate(lengths):
        T = N * (N + 1) // 2
        vec = np.full(T, -np.inf)
        m = ok[:T]
        vec[m] = dense[u, tt[:T][m], ww[:T][m]]
        out.append(vec)
    return out


def forward_backward(vec_embed_log_probs, log_p_continue, N, n_slices_min=0,
                     n_slices_max=0, i_utt=None, anneal_temp=1, key=None):
    """Module-level FFBS over one utterance's packed triangular score vector
    (reference ``forward_backward``, unigram_acoustic_wordseg.py:653-756).

    Returns ``(log_prob, boundaries)`` exactly like the reference.  The
    categorical draws use a JAX PRNG key; if ``key`` is None a seed is drawn
    from numpy's global RNG (matching the reference's implicit global-RNG
    dependence).
    """
    W = min(n_slices_max, N) if n_slices_max > 0 else N
    scores = jnp.asarray(_tri_to_dense(vec_embed_log_probs, N, W))
    if key is None:
        key = jax.random.PRNGKey(int(np.random.randint(0, 2 ** 31 - 1)))
    log_prob, bounds = dp_ops.segment_dp(
        scores, jnp.asarray([N], jnp.int32), key, log_p_continue,
        anneal_temp, n_slices_min=n_slices_min, n_slices_max=W,
        mode="sample",
    )
    return float(log_prob[0]), np.asarray(bounds[0])


def forward_backward_viterbi(vec_embed_log_probs, log_p_continue, N,
                             n_slices_min=0, n_slices_max=0, i_utt=None,
                             anneal_temp=None):
    """Module-level Viterbi twin (reference ``forward_backward_viterbi``,
    unigram_acoustic_wordseg.py:759-864)."""
    W = min(n_slices_max, N) if n_slices_max > 0 else N
    scores = jnp.asarray(_tri_to_dense(vec_embed_log_probs, N, W))
    log_prob, bounds = dp_ops.segment_dp(
        scores, jnp.asarray([N], jnp.int32), jax.random.PRNGKey(0),
        log_p_continue, 1.0, n_slices_min=n_slices_min, n_slices_max=W,
        mode="viterbi",
    )
    return float(log_prob[0]), np.asarray(bounds[0])


class UnigramAcousticWordseg:
    """Unigram word segmentation of speech using acoustic word embeddings.

    Constructor parameters mirror the reference
    (``unigram_acoustic_wordseg.py:118-125``); additions:

    batch_size : int
        Number of utterances resampled per blocked-Gibbs step (1 = reference
        chain semantics; larger = faster).
    seed : int
        Seed for both the host-side init RNG and the device PRNG key.
    """

    def __init__(self, am_class, am_alpha, am_K, am_param_prior,
                 embedding_mats, vec_ids_dict, durations_dict, landmarks_dict,
                 seed_boundaries_dict=None, seed_assignments_dict=None,
                 covariance_type="fixed", n_slices_min=0, n_slices_max=20,
                 min_duration=0, p_boundary_init=0.5, beta_sent_boundary=2.0,
                 lms=1.0, wip=0.0, fb_type="standard",
                 init_am_assignments="rand", time_power_term=1.0,
                 batch_size: Optional[int] = None, seed: int = 0,
                 decollide_new: bool = True):
        logger.info("Initializing")
        assert seed_assignments_dict is None or seed_boundaries_dict is not None

        self.n_slices_min = int(n_slices_min)
        self.n_slices_max = int(n_slices_max)
        self.beta_sent_boundary = beta_sent_boundary
        self.wip = float(wip)
        self.time_power_term = float(time_power_term)
        self.decollide_new = bool(decollide_new)
        self.set_fb_type(fb_type)

        embeddings, vec_ids, ids_to_utterance_labels = process_embeddings(
            embedding_mats, vec_ids_dict
        )
        self.ids_to_utterance_labels = ids_to_utterance_labels
        N = embeddings.shape[0]

        if seed_boundaries_dict is not None:
            seed_boundaries = [seed_boundaries_dict[i] for i in ids_to_utterance_labels]
        else:
            seed_boundaries = None
        lengths = [len(landmarks_dict[i]) for i in ids_to_utterance_labels]
        landmarks = [landmarks_dict[i] for i in ids_to_utterance_labels]
        durations = [durations_dict[i] for i in ids_to_utterance_labels]
        self.utterances = Utterances(
            lengths, vec_ids, durations, landmarks,
            seed_boundaries=seed_boundaries, p_boundary_init=p_boundary_init,
            n_slices_min=n_slices_min, n_slices_max=n_slices_max,
            min_duration=min_duration,
        )

        # Embeddings in the initial segmentation.
        # Batched native segmentation query (falls back to the per-
        # utterance host loop; see Utterances.all_segmented_embeds).
        all_embeds = self.utterances.all_segmented_embeds()
        init_embeds = all_embeds[all_embeds >= 0]

        key = jax.random.PRNGKey(seed)
        assignments = -1 * np.ones(N, dtype=int)
        if seed_assignments_dict is not None:
            logger.info("Using seed assignments")
            from .common import seed_assignments_to_vector

            self.seed_to_cluster, am_K = seed_assignments_to_vector(
                self.utterances, ids_to_utterance_labels,
                seed_assignments_dict, assignments, am_K,
            )
            self.acoustic_model = FBGMM(
                embeddings, am_param_prior, am_alpha, am_K, assignments,
                covariance_type=covariance_type, lms=lms, key=key,
            )
        elif init_am_assignments == "rand":
            logger.info("Using random initial component assignments")
            assignments[init_embeds] = np.random.randint(0, am_K, len(init_embeds))
            self.acoustic_model = FBGMM(
                embeddings, am_param_prior, am_alpha, am_K, assignments,
                covariance_type=covariance_type, lms=lms, key=key,
            )
        elif init_am_assignments == "one-by-one":
            logger.info("Using a one-by-one initial assignment")
            self.acoustic_model = FBGMM(
                embeddings, am_param_prior, am_alpha, am_K, assignments,
                covariance_type=covariance_type, lms=lms, key=key,
            )
            for i_embed in init_embeds:
                self.acoustic_model.gibbs_sample_inside_loop_i(int(i_embed))
        else:
            raise ValueError(
                "invalid value for `init_am_assignments`: " + init_am_assignments
            )

        self.batch_size = int(batch_size) if batch_size else min(
            64, self.utterances.D
        )
        self._boundaries_dev = self.utterances.boundaries_device()
        self._rng = np.random.RandomState(seed)
        self._sweep_fn = None

    # ------------------------------------------------------------------ API

    def set_fb_type(self, fb_type: str):
        self.fb_type = fb_type
        if fb_type == "standard":
            self._dp_mode = "sample"
        elif fb_type == "viterbi":
            self._dp_mode = "viterbi"
        else:
            raise ValueError("invalid `fb_type`: " + fb_type)
        self._sweep_fn = None
        self._chunk_fn = None

    def calc_p_continue(self) -> float:
        """Sentence-continue probability under the symmetric Beta prior
        (reference ``calc_p_continue``, unigram_acoustic_wordseg.py:513-531)."""
        if self.beta_sent_boundary != -1:
            n_tokens = int(jnp.sum(self.acoustic_model.stats.counts))
            n_sentences = self.utterances.D - 1
            n_continue = n_tokens - n_sentences
            return (n_continue + self.beta_sent_boundary / 2.0) / (
                n_tokens + self.beta_sent_boundary
            )
        return 1.0

    def get_unsup_transcript_i(self, i: int):
        """Component assignments of utterance i's current segments
        (reference unigram_acoustic_wordseg.py:533-537)."""
        self._sync_boundaries_to_host()
        return list(
            self.acoustic_model.components.get_assignments(
                self.utterances.get_segmented_embeds_i(i)
            )
        )

    def get_log_margs_i(self, i: int):
        """Log marginals of utterance i's segments with the utterance held out
        (reference ``get_log_margs_i``, unigram_acoustic_wordseg.py:539-564)."""
        self._sync_boundaries_to_host()
        embeds = [e for e in self.utterances.get_segmented_embeds_i(i) if e != -1]
        am = self.acoustic_model
        saved = (am.stats, am.assignments)
        for e in embeds:
            am.del_item(e)
        out = [float(v) for v in am.log_marg_batch(np.array(embeds, dtype=int))]
        am.stats, am.assignments = saved
        return out

    def get_vec_embed_log_probs(self, vec_ids, durations) -> np.ndarray:
        """Duration-scaled candidate log marginals in the reference's packed
        triangular layout (reference unigram_acoustic_wordseg.py:474-511).
        Scores against the *current* model state (call after removal, as the
        reference does inside ``gibbs_sample_i``)."""
        vec_ids = np.asarray(vec_ids)
        durations = np.asarray(durations, dtype=float)
        out = np.full(len(vec_ids), -np.inf)
        valid = vec_ids != -1
        if valid.any():
            margs = np.asarray(
                self.acoustic_model.log_marg_batch(vec_ids[valid].astype(int))
            )
            out[valid] = margs
        nan_dur = np.isnan(durations)
        out[nan_dur & valid] = -np.inf
        ok = valid & ~nan_dur
        out[ok] = out[ok] * durations[ok] ** self.time_power_term
        return out + self.wip

    def get_vec_embed_log_probs_all(self, utt_ids=None):
        """Candidate scores for MANY utterances in ONE device dispatch.

        The reference (and :meth:`get_vec_embed_log_probs`) scores one
        utterance per call -- a corpus-scale caller pays one device
        round-trip per utterance plus the O(N^2) host repack.  This batch
        twin runs a single jitted kernel over the dense ``[U, N_max, W]``
        corpus tensors and repacks with one vectorised gather, then returns
        a list of packed triangular vectors (the reference layout), one per
        requested utterance (default: all, in corpus order).

        Spans wider than the DP window ``n_slices_max`` come back -inf (the
        dense tensors only carry the window the DP can consume); the
        windowed entries match :meth:`get_vec_embed_log_probs` exactly.
        One compile per distinct ``len(utt_ids)``.
        """
        utt = self.utterances
        if utt_ids is None:
            utt_ids = np.arange(utt.D)
        utt_ids = np.asarray(utt_ids, dtype=np.int64)
        am = self.acoustic_model
        if not hasattr(self, "_batch_score_fn"):
            cov, prior = am.cov, am.prior
            alpha, K_max, lms = am.alpha, am.K_max, am.lms

            @jax.jit
            def score_all(stats, X, log_prior_vec, rows, seg_ids, seg_durs,
                          tpt, wip):
                ids_blk = seg_ids[rows]
                durs_blk = seg_durs[rows]
                flat = jnp.maximum(ids_blk, 0).reshape(-1)
                params = cov.predictive_params(prior, stats)
                logits = component_logits_batch(
                    cov, prior, stats, params, X[flat], log_prior_vec[flat],
                    alpha, K_max, lms, include_denominator=True,
                )
                margs = logsumexp(logits, axis=-1).reshape(ids_blk.shape)
                return masked_candidate_scores(margs, ids_blk, durs_blk,
                                               tpt, wip)

            self._batch_score_fn = score_all
        dense = np.asarray(self._batch_score_fn(
            am.stats, am.X, am.log_prior_vec, jnp.asarray(utt_ids),
            utt.seg_ids, utt.seg_durations,
            self.time_power_term, self.wip,
        ))
        return _dense_to_tri(dense, [utt.lengths[i] for i in utt_ids])

    # ------------------------------------------------------------- sampling

    def gibbs_sample_i(self, i: int, anneal_temp: float = 1.0,
                       anneal_gibbs_am: bool = False) -> float:
        """Block-Gibbs resample boundaries + assignments for one utterance
        (reference ``gibbs_sample_i``, unigram_acoustic_wordseg.py:252-360)."""
        order = np.full((self.batch_size,), -1, dtype=np.int64)
        order[0] = i
        return self._run_blocks(order.reshape(1, -1), anneal_temp, anneal_gibbs_am)

    def gibbs_sample(self, n_iter: int, am_n_iter: int = 0,
                     anneal_schedule=None, anneal_start_temp_inv: float = 0.1,
                     anneal_end_temp_inv: float = 1.0, n_anneal_steps: int = -1,
                     anneal_gibbs_am: bool = False, monitor_i=None,
                     validate: bool = False,
                     debug_gibbs_only: bool = False) -> dict:
        """Blocked Gibbs sampling over all utterances
        (reference ``gibbs_sample``, unigram_acoustic_wordseg.py:362-472).

        ``monitor_i`` / ``validate``: per-sweep deep trace of one utterance
        and opt-in sampler-invariant checks (the reference's
        ``i_debug_monitor`` / NaN asserts; see ``utils/debug.py``).  Both
        are enqueued on device and fetched in the same end-of-run batch, so
        the loop stays sync-free.  ``debug_gibbs_only``: sample ONLY the
        monitored utterance each sweep (the reference's standing flag,
        unigram_acoustic_wordseg.py:20, :451-452; requires ``monitor_i``).
        """
        if debug_gibbs_only:
            assert monitor_i is not None, \
                "debug_gibbs_only requires monitor_i"
        from ..utils.annealing import anneal_temperatures
        from ..utils import debug as dbg

        logger.info("Gibbs sampling for " + str(n_iter) + " iterations")
        temps = anneal_temperatures(
            n_iter, anneal_schedule, anneal_start_temp_inv,
            anneal_end_temp_inv, n_anneal_steps,
        )
        record = {k: [] for k in (
            "sample_time", "log_marg", "log_marg*length", "log_prob_z",
            "log_prob_X_given_z", "anneal_temp", "components", "n_tokens")}

        # Fully asynchronous loop: every sweep and its metrics are enqueued
        # without a host sync (a sync costs a full RPC round-trip on a
        # remote-attached TPU); everything is fetched in one batch at the
        # end.  When no per-sweep host work is requested, full
        # _WORDSEG_CHUNK-sized runs are fused into ONE dispatch (device-side
        # utterance permutations + a lax.scan over sweeps): chunk entries'
        # sample_time is the chunk wall time divided evenly across its
        # sweeps (cf. FBGMM.gibbs_sample).
        use_chunks = (
            am_n_iter == 0 and monitor_i is None and not validate
            and getattr(self, "_mesh", None) is None
            and not getattr(self, "_shard_map_mode", False)
        )
        pending = []  # (t_dispatched, n_sweeps, temps)
        pending_dev = []  # aligned (log_prob, metrics) device values
        pending_monitor = []
        pending_validate = []
        start = time.time()
        i_iter = 0
        while i_iter < n_iter:
            if use_chunks and n_iter - i_iter >= _WORDSEG_CHUNK:
                chunk = self._get_chunk_fn()
                am = self.acoustic_model
                ts = np.asarray(temps[i_iter:i_iter + _WORDSEG_CHUNK],
                                dtype=am.X.dtype)
                ats = ts if anneal_gibbs_am else np.ones_like(ts)
                (am.stats, am.assignments, self._boundaries_dev, am.key,
                 lps, ms) = chunk(am.stats, am.assignments,
                                  self._boundaries_dev, am.key, ts, ats)
                pending.append((time.time(), _WORDSEG_CHUNK, ts))
                pending_dev.append((lps, ms))
                i_iter += _WORDSEG_CHUNK
                continue
            if am_n_iter > 0:
                self.acoustic_model.gibbs_sample(
                    am_n_iter, consider_unassigned=False
                )
            temp = float(temps[i_iter])
            if debug_gibbs_only:
                order = np.asarray([int(monitor_i)], dtype=np.int64)
            else:
                order = self._rng.permutation(self.utterances.D)
            blocks = pad_utterance_order(order, self.batch_size)
            log_prob_dev = self._run_blocks_async(blocks, temp, anneal_gibbs_am)
            metrics_dev = self.acoustic_model.sweep_metrics_device()
            pending.append((time.time(), 1, [temp]))
            pending_dev.append((log_prob_dev, metrics_dev))
            if monitor_i is not None:
                pending_monitor.append(self._monitor_device(int(monitor_i)))
            if validate:
                pending_validate.append(self._validate_device())
            i_iter += 1

        if monitor_i is not None:
            dbg.log_monitor(logger, int(monitor_i),
                            jax.device_get(pending_monitor))
        if validate:
            dbg.check_validation(jax.device_get(pending_validate),
                                 dbg.FBGMM_CHECKS)
        fetched = jax.device_get(pending_dev)

        def append_one(rec, ts, j, f):
            log_prob, m_tuple = f
            m = self.acoustic_model.metrics_to_dict(m_tuple)
            rec["log_marg"].append(m["log_marg"])
            rec["log_marg*length"].append(float(log_prob))
            rec["log_prob_z"].append(m["log_prob_z"])
            rec["log_prob_X_given_z"].append(m["log_prob_X_given_z"])
            rec["anneal_temp"].append(float(ts[j]))
            rec["components"].append(m["components"])
            rec["n_tokens"].append(m["n_assigned"])

        from .common import drain_pending_record

        return drain_pending_record(record, pending, fetched, start,
                                    append_one, logger)

    def segment(self, *args, **kwargs):  # pragma: no cover - convenience alias
        return self.gibbs_sample(*args, **kwargs)

    # ------------------------------------------------------------ internals

    def _run_blocks(self, blocks: np.ndarray, anneal_temp: float,
                    anneal_gibbs_am: bool) -> float:
        return float(self._run_blocks_async(blocks, anneal_temp,
                                            anneal_gibbs_am))

    def _run_blocks_async(self, blocks: np.ndarray, anneal_temp: float,
                          anneal_gibbs_am: bool):
        am = self.acoustic_model
        sweep = self._get_sweep_fn()
        assign_temp = anneal_temp if anneal_gibbs_am else 1.0
        from .common import place_blocks

        blocks_dev = place_blocks(blocks, getattr(self, "_mesh", None))
        (am.stats, am.assignments, self._boundaries_dev, am.key, log_prob) = sweep(
            am.stats, am.assignments, self._boundaries_dev, am.key,
            blocks_dev, np.asarray(anneal_temp, dtype=am.X.dtype),
            np.asarray(assign_temp, dtype=am.X.dtype),
        )
        return log_prob

    def _sync_boundaries_to_host(self):
        self.utterances.set_boundaries_from_device(self._boundaries_dev)

    def _monitor_device(self, i: int):
        """Enqueue (candidate scores, boundaries, transcript) of utterance
        ``i`` scored with the utterance held out -- the same leave-out
        quantities the sweep samples from (reference ``i_debug_monitor``
        traces, unigram_acoustic_wordseg.py:262-307)."""
        if getattr(self, "_monitor_fn", None) is None:
            am = self.acoustic_model
            cov, prior = am.cov, am.prior
            X, K_max = am.X, am.K_max
            alpha, lms = am.alpha, am.lms
            log_prior_vec = am.log_prior_vec
            full_cov = cov.FULL_COV
            utt = self.utterances
            N_max, W_store = utt.N_max, utt.W
            W_dp = (min(self.n_slices_max, N_max)
                    if self.n_slices_max > 0 else N_max)
            seg_ids_all, seg_durs_all = utt.seg_ids, utt.seg_durations
            lengths_all = utt.lengths_dev
            tpt, wip = self.time_power_term, self.wip

            def dp_slice(a):
                if W_store >= W_dp:
                    return a[..., :W_dp]
                pad = [(0, 0)] * (a.ndim - 1) + [(0, W_dp - W_store)]
                fill = -1 if a.dtype in (jnp.int32, jnp.int64) else jnp.nan
                return jnp.pad(a, pad, constant_values=fill)

            @jax.jit
            def monitor(stats, assignments, boundaries, idx):
                idx1 = idx[None]
                lengths_blk = lengths_all[idx1]
                seg_ids_blk = seg_ids_all[idx1]
                old_embeds, _ = gather_block_segments(
                    boundaries[idx1], lengths_blk, seg_ids_blk
                )
                old_ks = jnp.where(
                    old_embeds >= 0,
                    assignments[jnp.maximum(old_embeds, 0)], -1,
                )
                lo = leave_out_stats(
                    stats,
                    utterance_contrib(X, old_embeds, old_ks, K_max, full_cov),
                )
                params = jax.vmap(
                    lambda s: cov.predictive_params(prior, s)
                )(lo)
                cand_ids = dp_slice(seg_ids_blk).reshape(1, N_max * W_dp)
                Xc = X[jnp.maximum(cand_ids, 0)]
                post = jax.vmap(cov.log_post_pred_batch)(params, Xc)
                w = jax.vmap(
                    lambda c: log_weights(c, alpha, K_max, lms, True, X.dtype)
                )(lo.counts)
                prior_c = log_prior_vec[jnp.maximum(cand_ids, 0)]
                logits = w[:, None, :] + jnp.where(
                    (lo.counts > 0)[:, None, :], post, prior_c[..., None]
                )
                log_margs = logsumexp(logits, axis=-1).reshape(1, N_max, W_dp)
                scores = masked_candidate_scores(
                    log_margs, dp_slice(seg_ids_blk),
                    dp_slice(seg_durs_all[idx1]), tpt, wip,
                )
                return scores[0], boundaries[idx], old_ks[0]

            self._monitor_fn = monitor
        am = self.acoustic_model
        return self._monitor_fn(am.stats, am.assignments,
                                self._boundaries_dev, jnp.int32(i))

    def _validate_device(self):
        """Enqueue the sampler-invariant flags (see utils/debug.py)."""
        if getattr(self, "_validate_fn", None) is None:
            from ..utils import debug as dbg

            lengths_all = self.utterances.lengths_dev

            @jax.jit
            def validate(stats, assignments, boundaries):
                return dbg.fbgmm_validation_flags(
                    stats, assignments, boundaries, lengths_all
                )

            self._validate_fn = validate
        am = self.acoustic_model
        return self._validate_fn(am.stats, am.assignments,
                                 self._boundaries_dev)

    def _get_sweep_fn(self):
        if self._sweep_fn is None:
            self._sweep_fn = self._build_sweep_fn()
        return self._sweep_fn

    def _make_block_step(self, B: int, pallas: bool, reduce_fn,
                         assign_table: bool = False, axis_name=None):
        """Build the per-block Gibbs update, shared by the single-device sweep
        (``reduce_fn`` = identity) and the explicit-collective shard_map sweep
        (``reduce_fn`` = ``psum`` over the mesh axis; ``B`` is then the
        per-shard block size, see ``parallel/shard_sweep.py``).

        Returns ``(carry, updates)``: the [N] assignment vector in the carry
        is READ-ONLY within a sweep -- each block returns its
        ``(valid, old_embeds, new_embeds, new_ks)`` and the sweep builders
        apply ONE deferred ``merge_sweep_assignments`` after the block scan
        (exact: blocks partition a permutation, so no block reads a row
        another block of the same sweep wrote; see
        ``common.merge_assignments``).

        ``assign_table=True`` (the fused-chunk fast path) replaces the [N]
        assignment vector in the carry with the compact per-utterance slot
        table [U, N_max * W_dp] (see ``common.assign_rows_from_segments``):
        reads become one-hot slot selects, writes become scatter-free row
        rebuilds + one row-granular ``.at[idx].set``, and the [N] vector is
        materialized ONCE per chunk instead of via four element-rate-bound
        [N] scatters per sweep (~0.5 ms/sweep at flagship scale, the largest
        residual of the round-5 profile).  ``updates`` is then ``None``.
        Chain values are bit-identical: the table stores the same integers
        the vector would, and every read/write rides exact one-hot selects.

        ``pallas=False`` selects the pure-XLA kernels (required under a GSPMD
        mesh: GSPMD cannot partition ``pallas_call`` inside plain ``jit``).
        With ``pallas=True`` the Pallas kernels run (interpret mode off-TPU);
        both consume the same pre-drawn Gumbel noise and sample identical
        chains.
        """
        am = self.acoustic_model
        cov, prior = am.cov, am.prior
        X = am.X
        alpha, K_max, lms = am.alpha, am.K_max, am.lms
        log_prior_vec = am.log_prior_vec
        full_cov = cov.FULL_COV
        utt = self.utterances
        N_max = utt.N_max
        W_dp = min(self.n_slices_max, N_max) if self.n_slices_max > 0 else N_max
        W_store = utt.W
        n_min = self.n_slices_min
        tpt = self.time_power_term
        wip = self.wip
        dp_mode = self._dp_mode
        viterbi_assign = self.fb_type == "viterbi"
        beta_sb = float(self.beta_sent_boundary)
        n_sentences = self.utterances.D - 1
        decollide = getattr(self, "decollide_new", True)

        def dp_slice(a):
            if W_store >= W_dp:
                return a[..., :W_dp]
            pad = [(0, 0)] * (a.ndim - 1) + [(0, W_dp - W_store)]
            fill = -1 if a.dtype in (jnp.int32, jnp.int64) else jnp.nan
            return jnp.pad(a, pad, constant_values=fill)

        def log_p_continue_dev(counts):
            """Beta sentence-boundary continue probability from the carried
            counts (reference ``calc_p_continue``,
            unigram_acoustic_wordseg.py:513-531).  Computed *inside* the
            jitted sweep: a host-side evaluation would cost one synchronous
            device fetch per sweep (~30 ms on a remote-attached TPU)."""
            if beta_sb == -1:
                return jnp.zeros((), X.dtype)
            n_tokens = jnp.sum(counts).astype(X.dtype)
            n_continue = n_tokens - n_sentences
            return jnp.log(
                (n_continue + beta_sb / 2.0) / (n_tokens + beta_sb)
            )

        cov_type = self.acoustic_model.covariance_type
        pallas_chain_ok = pallas and cov_type in ("fixed", "diag")
        lms_eff = 1.0 if viterbi_assign else lms

        def assignment_chain(lo_b, params_b, embeds_b, x_b, lp_b, gumb_b,
                             temp):
            """Sequential within-utterance assignment resampling (reference
            gibbs_sample_inside_loop_i conditioning, fbgmm.py:422-463)."""

            def step(carry, inp):
                stats_b, p_b = carry
                e, x, lp, g = inp
                ok = e >= 0
                if viterbi_assign:
                    # map_assign_i omits the lms scaling (fbgmm.py:475-479).
                    w = log_weights(stats_b.counts, alpha, K_max, 1.0,
                                    include_denominator=False, dtype=x.dtype)
                else:
                    w = log_weights(stats_b.counts, alpha, K_max, lms,
                                    include_denominator=False, dtype=x.dtype)
                post = cov.log_post_pred(p_b, x)
                logits = w + jnp.where(stats_b.counts > 0, post, lp)
                if viterbi_assign:
                    k = jnp.argmax(logits)
                else:
                    k = jnp.argmax(jnp.where(
                        jnp.isneginf(logits), NEG_INF, logits / temp + g
                    ))
                k = canonicalize_new_component(stats_b.counts, k)
                stats_b = add_item(stats_b, x, k, full_cov=full_cov,
                                   weight=ok.astype(jnp.int32))
                p_b = cov.update_predictive_row(prior, stats_b, p_b, k)
                return (stats_b, p_b), jnp.where(ok, k.astype(jnp.int32), -1)

            (_, _), ks = jax.lax.scan(
                step, (lo_b, params_b), (embeds_b, x_b, lp_b, gumb_b)
            )
            return ks

        def run_chains(lo, params_b, lo_counts, sum_xT, sum_sqT,
                       new_embeds, Xe, lpe, gumbel, temp):
            # When the fused-scoring path built the leave-out moments
            # feature-major, feed the chain kernels the SAME [B, D, K]
            # tables (their native VMEM layout, stats_T=True) -- no
            # [B, K, D] tensor is ever materialised.
            stats_T = sum_xT is not None
            if pallas_chain_ok and cov_type == "fixed":
                from ..ops.pallas_chain import fixedvar_chain

                return fixedvar_chain(
                    new_embeds, Xe, lpe, gumbel,
                    lo_counts if stats_T else lo.counts,
                    sum_xT if stats_T else lo.sum_x,
                    prior.var, prior.var_0, prior.mu_0, temp,
                    alpha=alpha, K=K_max, lms=lms_eff,
                    use_argmax=viterbi_assign,
                    interpret=jax.default_backend() != "tpu",
                    stats_T=stats_T,
                )
            if pallas_chain_ok and cov_type == "diag":
                from ..ops.pallas_chain import diag_chain

                return diag_chain(
                    new_embeds, Xe, lpe, gumbel,
                    lo_counts if stats_T else lo.counts,
                    sum_xT if stats_T else lo.sum_x,
                    sum_sqT if stats_T else lo.sum_sq,
                    prior.m_0, float(prior.k_0), float(prior.v_0), prior.S_0,
                    temp, alpha=alpha, K=K_max, lms=lms_eff,
                    use_argmax=viterbi_assign,
                    interpret=jax.default_backend() != "tpu",
                    stats_T=stats_T,
                )
            if cov_type == "diag":
                # Non-pallas diag (GSPMD mesh): the XLA twin with the
                # kernel's Stirling-lgamma composition, so the chain is
                # bit-identical to the Pallas path (CLAUDE.md invariant).
                from ..ops.pallas_chain import diag_chain_xla

                return diag_chain_xla(
                    new_embeds, Xe, lpe, gumbel,
                    lo.counts, lo.sum_x, lo.sum_sq,
                    prior.m_0, float(prior.k_0), float(prior.v_0), prior.S_0,
                    temp, alpha=alpha, K=K_max, lms=lms_eff,
                    use_argmax=viterbi_assign,
                )
            return jax.vmap(
                lambda lo_b, p_b, e_b, x_b, lp_b, g_b: assignment_chain(
                    lo_b, p_b, e_b, x_b, lp_b, g_b, temp
                )
            )(lo, params_b, new_embeds, Xe, lpe, gumbel)

        from .fullcov import (
            corrected_candidate_post,
            counts_contrib,
            fullcov_chain,
            fullcov_score_inputs,
            pallas_chain_inputs,
            touched_leave_out,
        )

        def block_step(carry, idx_blk, seg_ids_all, seg_durs_all, lengths_all,
                       anneal_temp, assign_temp, cand_X_all=None,
                       cand_lp_all=None):
            stats, assignments, boundaries, key, lp_total = carry
            valid = idx_blk >= 0
            idx = jnp.maximum(idx_blk, 0)
            lengths_blk = jnp.where(valid, lengths_all[idx], 0)
            seg_ids_blk = seg_ids_all[idx]      # [B, N_max, W_store]
            seg_durs_blk = seg_durs_all[idx]
            bounds_blk = boundaries[idx]

            # 1. Current segments and leave-one-utterance-out stats
            #    (reference removes the utterance's embeddings before
            #    scoring, unigram_acoustic_wordseg.py:270-273).
            old_embeds, segs_old = gather_block_segments(
                bounds_blk, lengths_blk, seg_ids_blk
            )
            if assign_table:
                # ``assignments`` carries the [U, M] slot table: row-gather
                # the block's rows and one-hot-select the segments' slots
                # (same integers as the [N]-vector gather, exactly).
                old_ks = select_assign_slots(assignments[idx], segs_old,
                                             W_dp)
                old_ks = jnp.where(old_embeds >= 0, old_ks, -1)
            else:
                old_ks = jnp.where(
                    old_embeds >= 0,
                    assignments[jnp.maximum(old_embeds, 0)],
                    -1,
                )

            # 2. Candidate scoring: one batched embeddings x components
            #    kernel for the whole block (HOT LOOP #1 of the reference,
            #    unigram_acoustic_wordseg.py:474-511, fbgmm.py:256-286).
            #    The candidate vectors/prior densities are STATIC across
            #    sweeps (seg_ids never change), so the sweep builders
            #    precompute X[seg_ids] once and the per-block "gather"
            #    becomes B contiguous per-utterance slabs -- the row-
            #    scattered 15k-tiny-row gather per block was ~2.5 ms/sweep
            #    of pure gather latency (round-3 stage attribution).
            cand_durs = dp_slice(seg_durs_blk)
            if cand_X_all is None:  # shard_map path: gather per block
                cand_ids = dp_slice(seg_ids_blk).reshape(B, N_max * W_dp)
                Xc = X[jnp.maximum(cand_ids, 0)]
                prior_c = log_prior_vec[jnp.maximum(cand_ids, 0)]
            else:
                Xc = cand_X_all[idx].reshape(B, N_max * W_dp, -1)
                prior_c = cand_lp_all[idx].reshape(B, N_max * W_dp)
            # Segment rows pulled from the candidate slab (one-hot MXU
            # contraction) instead of tiny-row X gathers; valid whenever no
            # stored segment can outrun the DP window.
            slab_ok = W_store == W_dp
            if slab_ok:
                Xe_old, _ = slab_segment_rows(Xc, prior_c, segs_old, W_dp)
            else:
                Xe_old = None
            if cov_type == "full":
                # Full covariance scores against the block-GLOBAL predictive
                # parameters (one [K] Cholesky batch + one MXU matmul), then
                # overwrites only each utterance's own <= S touched columns
                # with exact leave-out scores -- no [B, K, D, D] tensors
                # anywhere (see segmenters/fullcov.py).
                M = N_max * W_dp
                lo_counts = stats.counts[None] - counts_contrib(
                    old_ks, old_embeds >= 0, K_max
                )
                params_g = cov.predictive_params(prior, stats)
                touched = touched_leave_out(prior, stats, X, old_embeds,
                                            old_ks, rows=Xe_old)
                if pallas:
                    post = None  # fused scoring below
                else:
                    post = cov.log_post_pred_batch(
                        params_g, Xc.reshape(B * M, -1)
                    ).reshape(B, M, K_max)
                    post = corrected_candidate_post(post, Xc, touched,
                                                    K_max)
            else:
                # Diag Viterbi scores feed a DETERMINISTIC argmax DP, and
                # the fused diag kernel's grouped-product Student-t
                # deviates up to ~3.3e-3 from the exact composition on
                # hardware (ops/pallas_score.py) -- enough to flip
                # boundaries between the Pallas and XLA-fallback paths.
                # Gate the fused kernel to the sampled path; Viterbi uses
                # the exact per-dim composition on every backend.
                fused_ok = cov_type == "fixed" or (
                    cov_type == "diag" and not viterbi_assign)
                if pallas and fused_ok:
                    # Fused-kernel path: leave-out moments and parameter
                    # tables are built FEATURE-MAJOR ([B, D, K] -- the VMEM
                    # layout of both the scoring and chain kernels), so no
                    # [B, K, D] tensor or relayout copy chain exists
                    # anywhere (~1.5 ms/sweep at flagship scale).
                    lo = params_b = post = None
                    lo_counts = stats.counts[None] - counts_contrib(
                        old_ks, old_embeds >= 0, K_max
                    )
                    sum_xT, sum_sqT = leave_out_moments_T(
                        stats, X, old_embeds, old_ks, K_max,
                        with_sq=cov_type == "diag", rows=Xe_old,
                    )
                else:
                    sum_xT = sum_sqT = None
                    lo = leave_out_stats(
                        stats, utterance_contrib(X, old_embeds, old_ks,
                                                 K_max, full_cov,
                                                 rows=Xe_old)
                    )
                    lo_counts = lo.counts
                    params_b = jax.vmap(
                        lambda s: cov.predictive_params(prior, s)
                    )(lo)
                    post = jax.vmap(cov.log_post_pred_batch)(params_b, Xc)
            w_b = jax.vmap(
                lambda c: log_weights(c, alpha, K_max, lms,
                                      include_denominator=True, dtype=X.dtype)
            )(lo_counts)
            if post is None:
                # Fused scoring: the [B, M, K] logits tile never leaves
                # VMEM (see ops/pallas_score.py).
                from ..ops.pallas_score import fullcov_log_margs

                interp = jax.default_backend() != "tpu"
                if cov_type == "full":
                    g, t, oh_t, tmask_t = fullcov_score_inputs(
                        params_g, touched
                    )
                    log_margs = fullcov_log_margs(
                        Xc.reshape(B, N_max * W_dp, -1), prior_c, *g, *t,
                        oh_t, tmask_t, w_b, lo_counts, K=K_max,
                        interpret=interp, valid_m=lengths_blk * W_dp,
                    ).reshape(B, N_max, W_dp)
                elif cov_type == "fixed":
                    from ..ops.pallas_score import fixedvar_log_margs_T

                    muT, precT = cov.predictive_params_T(
                        prior, lo_counts, sum_xT
                    )
                    # Prefix skip only when the candidate axis is long
                    # enough to amortize the length-sort gathers + finer
                    # tiling: the fixedvar scorer is ~0.4 ms/sweep at
                    # M=120 (flagship) where the overhead measured a net
                    # loss (4.4 -> 4.6 ms/sweep), but wins at M=720
                    # (N_max=120 long config).
                    vm = lengths_blk * W_dp if N_max * W_dp > 256 else None
                    log_margs = fixedvar_log_margs_T(
                        Xc, prior_c, muT, precT, w_b, lo_counts, K=K_max,
                        interpret=interp, valid_m=vm,
                    ).reshape(B, N_max, W_dp)
                else:
                    from ..ops.pallas_score import diag_log_margs_T

                    muT, inv_varT, lpv_b, v_b = cov.predictive_params_T(
                        prior, lo_counts, sum_xT, sum_sqT
                    )
                    log_margs = diag_log_margs_T(
                        Xc, prior_c, muT, inv_varT, lpv_b, v_b, w_b,
                        lo_counts, K=K_max, interpret=interp,
                        valid_m=lengths_blk * W_dp,
                    ).reshape(B, N_max, W_dp)
            else:
                logits = w_b[:, None, :] + jnp.where(
                    (lo_counts > 0)[:, None, :], post, prior_c[..., None]
                )
                log_margs = logsumexp(logits, axis=-1).reshape(B, N_max, W_dp)
            scores = masked_candidate_scores(
                log_margs, dp_slice(seg_ids_blk), cand_durs, tpt, wip
            )

            # 3. Boundary resampling DP (reference fb_func,
            #    unigram_acoustic_wordseg.py:309-313).
            key, k_dp, k_assign = jax.random.split(key, 3)
            log_prob, new_bounds = dp_ops.segment_dp(
                scores, lengths_blk, k_dp, log_p_continue_dev(stats.counts),
                anneal_temp, n_slices_min=n_min, n_slices_max=W_dp,
                mode=dp_mode, use_pallas=None if pallas else False,
            )

            # 4. Sequential assignment of the new segments
            #    (unigram_acoustic_wordseg.py:339-349).
            new_embeds, segs_new = gather_block_segments(
                new_bounds, lengths_blk, seg_ids_blk
            )
            if slab_ok:
                Xe_new, lpe_new = slab_segment_rows(Xc, prior_c, segs_new,
                                                    W_dp)
            else:
                Xe_new = X[jnp.maximum(new_embeds, 0)]
                lpe_new = log_prior_vec[jnp.maximum(new_embeds, 0)]
            gumbel = jax.random.gumbel(
                k_assign, new_embeds.shape + (K_max,), dtype=X.dtype
            )
            if cov_type == "full":
                S = new_embeds.shape[1]
                # HIGHEST: these scores feed an argmax over K (see
                # components_full.log_post_pred_batch docstring).
                G_new = cov.log_post_pred_batch(
                    params_g, Xe_new.reshape(B * S, -1),
                    precision=jax.lax.Precision.HIGHEST,
                ).reshape(B, S, K_max)
                if pallas:
                    from ..ops.pallas_chain import fullcov_chain_pallas

                    (scnt0, tm0, tiP0, tld0, tk0, g_m, g_iP, g_ld) = (
                        pallas_chain_inputs(prior, params_g, stats.counts,
                                            touched)
                    )
                    new_ks = fullcov_chain_pallas(
                        new_embeds, Xe_new, lpe_new, gumbel,
                        G_new, lo_counts, scnt0, tm0, tiP0, tld0, tk0,
                        g_m, g_iP, g_ld, float(prior.k_0), float(prior.v_0),
                        assign_temp, alpha=alpha, K=K_max, lms=lms_eff,
                        use_argmax=viterbi_assign,
                        interpret=jax.default_backend() != "tpu",
                    )
                else:
                    new_ks = fullcov_chain(
                        prior, X, params_g, stats.counts, lo_counts, touched,
                        new_embeds, G_new, gumbel, log_prior_vec, alpha,
                        K_max, lms_eff, assign_temp,
                        use_argmax=viterbi_assign,
                    )
            else:
                new_ks = run_chains(lo, params_b, lo_counts, sum_xT, sum_sqT,
                                    new_embeds, Xe_new, lpe_new, gumbel,
                                    assign_temp)

            # 4b. Cross-utterance new-component decollision: independent
            # chains drawing "a new component" from the SAME empty-slot pool
            # collide at merge time, fusing unrelated segments (a merge trap
            # for non-adaptive covariances; benchmarks/blocked_equivalence).
            # Relabel every collided creator group onto its own fresh empty
            # slot -- exchangeable, so per-utterance conditionals unchanged
            # (see common.decollide_new_components).  B=1 is the reference
            # chain, where the remap is the identity by construction.
            if decollide and B > 1:
                new_ks = decollide_new_components(
                    new_ks, (new_embeds >= 0) & valid[:, None], lo_counts,
                    stats.counts, axis_name=axis_name)

            # 5. Merge block updates into the global state (flat scatters on
            # both sides).  Under shard_map the deltas / assignment updates
            # are psum'ed over ICI by ``reduce_fn`` before being applied, so
            # every shard ends the block with identical replicated state.
            old_ks_masked = jnp.where(valid[:, None], old_ks, -1)
            old_flat_contrib = flat_contrib(
                X, old_embeds, old_ks_masked, K_max, full_cov, valid,
                rows=Xe_old,
            )
            new_flat_contrib = flat_contrib(
                X, new_embeds, new_ks, K_max, full_cov, valid, rows=Xe_new
            )
            delta = reduce_fn(jax.tree.map(
                lambda n, o: n - o, new_flat_contrib, old_flat_contrib
            ))
            stats = jax.tree.map(
                lambda g, d: (g + d).astype(g.dtype), stats, delta
            )

            idx_w = jnp.where(valid, idx, boundaries.shape[0])
            boundaries = boundaries.at[idx_w].set(new_bounds, mode="drop")
            lp_total = lp_total + reduce_fn(
                jnp.sum(jnp.where(valid, log_prob, 0.0))
            )
            if assign_table:
                rows_a = assign_rows_from_segments(
                    segs_new, new_ks, W_dp, N_max * W_dp
                )
                assignments = assignments.at[idx_w].set(rows_a, mode="drop")
                return ((stats, assignments, boundaries, key, lp_total),
                        None)
            return ((stats, assignments, boundaries, key, lp_total),
                    (valid, old_embeds, new_embeds, new_ks))

        return block_step

    def _cand_tables(self):
        """Sweep-static candidate slabs (see ``common.cand_tables``)."""
        am = self.acoustic_model
        return cand_tables(self.utterances, self.n_slices_max, am.X,
                           am.log_prior_vec)

    def _get_chunk_fn(self):
        if getattr(self, "_chunk_fn", None) is None:
            self._chunk_fn = self._build_chunk_fn()
        return self._chunk_fn

    def _build_chunk_fn(self):
        """_WORDSEG_CHUNK sweeps + their per-sweep metrics as ONE jitted
        scan.  The per-sweep utterance permutation is drawn ON DEVICE from
        the carried PRNG key (``jax.random.permutation``) instead of the
        host numpy RNG -- identical in distribution, and it removes the
        per-sweep host round-trip (the reference shuffles on the host,
        unigram_acoustic_wordseg.py:449-450)."""
        from ..models.fbgmm import log_prob_z_dirichlet
        from ..ops.stats import num_active

        block_step = self._make_block_step(
            self.batch_size, pallas=True, reduce_fn=lambda t: t,
            assign_table=True,
        )
        utt = self.utterances
        seg_ids_all = utt.seg_ids
        seg_durs_all = utt.seg_durations
        lengths_all = utt.lengths_dev
        am = self.acoustic_model
        cov, prior, alpha, K_max = am.cov, am.prior, am.alpha, am.K_max
        dtype = am.X.dtype
        N = am.X.shape[0]
        U = utt.D
        B = self.batch_size
        n_blocks = -(-U // B)
        pad = n_blocks * B - U
        # Flat candidate-id table matching the slot-table layout (same
        # window clamp/pad as the block step's dp_slice).
        N_max, W_store = utt.N_max, utt.W
        W_dp = min(self.n_slices_max, N_max) if self.n_slices_max > 0 \
            else N_max
        seg_w = seg_ids_all[..., :W_dp] if W_store >= W_dp else jnp.pad(
            seg_ids_all, ((0, 0), (0, 0), (0, W_dp - W_store)),
            constant_values=-1)
        seg_flat = seg_w.reshape(U, N_max * W_dp)

        @jax.jit
        def chunk(stats, assignments, boundaries, key, temps, assign_temps,
                  cand_X_all=None, cand_lp_all=None):
            # [N] vector -> compact per-utterance slot table (round 5): the
            # chunk's 8 sweeps never touch the [N] vector; it is
            # re-materialized ONCE at the end (common.py helpers).
            embeds0, segs0 = gather_block_segments(
                boundaries, lengths_all, seg_ids_all
            )
            ks0 = jnp.where(embeds0 >= 0,
                            assignments[jnp.maximum(embeds0, 0)], -1)
            A = assign_rows_from_segments(segs0, ks0, W_dp, N_max * W_dp)

            def one_sweep(carry, ts):
                stats, A, boundaries, key = carry
                anneal_temp, assign_temp = ts
                key, k_perm = jax.random.split(key)
                perm = jax.random.permutation(k_perm, U).astype(jnp.int32)
                blocks = jnp.concatenate(
                    [perm, jnp.full((pad,), -1, jnp.int32)]
                ).reshape(n_blocks, B)

                def f(c, idx_blk):
                    return block_step(
                        c, idx_blk, seg_ids_all, seg_durs_all, lengths_all,
                        anneal_temp, assign_temp,
                        cand_X_all=cand_X_all, cand_lp_all=cand_lp_all,
                    )

                init = (stats, A, boundaries, key, jnp.zeros((), dtype))
                ((stats, A, boundaries, key, lp), _) = jax.lax.scan(
                    f, init, blocks
                )
                m = (
                    log_prob_z_dirichlet(stats.counts, alpha, K_max),
                    cov.log_marg(prior, stats),
                    num_active(stats),
                    # Every assigned embedding is exactly one valid slot of
                    # the CURRENT segmentation (the validator invariant), so
                    # the slot-table count equals the [N]-vector count.
                    jnp.sum((A >= 0).astype(jnp.int32)),
                    jnp.sum(stats.counts),
                )
                return (stats, A, boundaries, key), (lp, m)

            (stats, A, boundaries, key), (lps, ms) = jax.lax.scan(
                one_sweep, (stats, A, boundaries, key),
                (temps, assign_temps),
            )
            assignments = materialize_assignments(
                A, seg_flat, N, assignments.dtype
            )
            return stats, assignments, boundaries, key, lps, ms

        cand_X_all, cand_lp_all = self._cand_tables()
        return lambda *args: chunk(*args, cand_X_all=cand_X_all,
                                   cand_lp_all=cand_lp_all)

    def _build_sweep_fn(self):
        # Under a GSPMD mesh the XLA paths are used: GSPMD cannot partition
        # pallas_call inside plain jit (use parallel/shard_sweep.py for
        # per-chip Pallas kernels with explicit collectives).
        on_mesh = getattr(self, "_mesh", None) is not None
        block_step = self._make_block_step(
            self.batch_size, pallas=not on_mesh, reduce_fn=lambda t: t
        )
        utt = self.utterances
        seg_ids_all = utt.seg_ids
        seg_durs_all = utt.seg_durations
        lengths_all = utt.lengths_dev
        dtype = self.acoustic_model.X.dtype

        @jax.jit
        def sweep(stats, assignments, boundaries, key, blocks, anneal_temp,
                  assign_temp, cand_X_all=None, cand_lp_all=None):
            def f(carry, idx_blk):
                return block_step(
                    carry, idx_blk, seg_ids_all, seg_durs_all, lengths_all,
                    anneal_temp, assign_temp,
                    cand_X_all=cand_X_all, cand_lp_all=cand_lp_all,
                )

            init = (stats, assignments, boundaries, key,
                    jnp.zeros((), dtype=dtype))
            ((stats, assignments, boundaries, key, lp_total),
             updates) = jax.lax.scan(f, init, blocks)
            assignments = merge_sweep_assignments(
                assignments, updates, lambda t: t
            )
            return stats, assignments, boundaries, key, lp_total

        if on_mesh:
            # Under GSPMD the [U, ...] candidate tensors would be
            # replicated unsharded; keep the per-block gather.
            return sweep
        # Pass the sweep-static candidate tensors as ARGUMENTS (not
        # closed-over constants, which XLA may embed in the executable).
        cand_X_all, cand_lp_all = self._cand_tables()
        return lambda *args: sweep(*args, cand_X_all=cand_X_all,
                                   cand_lp_all=cand_lp_all)


if __name__ == "__main__":  # smoke demo (reference unigram_acoustic_wordseg.py:871-963)
    from segmentalist_tpu.demos import demo_unigram_seg

    demo_unigram_seg()
