"""Bigram acoustic word segmentation (TPU-native).

Re-design of the reference ``BigramAcousticWordseg``
(``bigram_acoustic_wordseg.py:32-722``): boundary resampling uses *unigram*
marginal scores and the unigram FFBS (the reference's native bigram DP is an
unimplemented stub, ``bigram_acoustic_wordseg.py:694-695, :728-758``; the
``fb_type="bigram"`` seam is kept but raises), while component assignments are
resampled *sequentially along each utterance*, conditioning on the previous
segment's sampled component through the smoothed bigram LM
(``gibbs_sample_inside_loop_i_embed``, ``:332-384``).

Blocked-sweep shape: as in ``segmenters/unigram.py``, with the LM handled by
leave-one-utterance-out count tables (the reference removes the utterance's LM
counts before sampling and re-adds them afterwards, ``:410, :496``).
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..corpus import Utterances
from ..models.bigram_fbgmm import BigramFBGMM
from ..models.bigram_lm import (
    BigramLMState,
    BigramSmoothLM,
    add_block_counts,
    block_count_delta,
    transcript_pairs_batch,
)
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
    segments_from_boundaries,
    select_assign_slots,
    slab_segment_rows,
    utterance_contrib,
)
from .unigram import process_embeddings

logger = logging.getLogger(__name__)


class BigramAcousticWordseg:
    """Bigram word segmentation of speech using acoustic word embeddings
    (constructor parity with ``bigram_acoustic_wordseg.py:129-256``)."""

    def __init__(self, am_K, am_param_prior, lm_params, embedding_mats,
                 vec_ids_dict, durations_dict, landmarks_dict,
                 seed_boundaries_dict=None, seed_assignments_dict=None,
                 covariance_type="fixed", n_slices_min=0, n_slices_max=20,
                 min_duration=0, p_boundary_init=0.5, beta_sent_boundary=2.0,
                 lms=1.0, wip=0.0, fb_type="bigram",
                 init_am_assignments="rand", time_power_term=1.0,
                 batch_size: Optional[int] = None, seed: int = 0,
                 decollide_new: bool = True):
        logger.info("Initializing")
        assert seed_assignments_dict is None or seed_boundaries_dict is not None

        self.n_slices_min = int(n_slices_min)
        self.n_slices_max = int(n_slices_max)
        self.beta_sent_boundary = beta_sent_boundary
        self.wip = float(wip)
        self.lms = float(lms)
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

        # Language model (reference :179-184).
        assert lm_params["type"] == "smooth"
        self.lm = BigramSmoothLM(
            intrp_lambda=lm_params["intrp_lambda"], a=lm_params["a"],
            b=lm_params["b"], K=am_K,
        )

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
        elif init_am_assignments == "rand":
            logger.info("Using random initial component assignments")
            assignments[init_embeds] = np.random.randint(0, am_K, len(init_embeds))
        else:
            raise ValueError(
                "invalid value for `init_am_assignments`: " + init_am_assignments
            )

        self.acoustic_model = BigramFBGMM(
            embeddings, am_param_prior, am_K, assignments,
            covariance_type=covariance_type, lms=lms, lm=self.lm, key=key,
        )

        self.batch_size = int(batch_size) if batch_size else min(
            64, self.utterances.D
        )
        self._boundaries_dev = self.utterances.boundaries_device()
        self._rng = np.random.RandomState(seed)
        self._sweep_fn = None
        self._log_prob_z_fn = None

        # Initial language model counts (reference ``set_lm_counts``, :271-285).
        self.set_lm_counts()

    # ------------------------------------------------------------------ API

    def set_fb_type(self, fb_type: str):
        # The reference's native bigram forward-backward is a stub
        # (bigram_acoustic_wordseg.py:728-758); only the unigram DP works.
        # Accept both values for parity; "bigram" fails at sampling time.
        if fb_type not in ("bigram", "unigram"):
            raise ValueError("invalid `fb_type`: " + fb_type)
        self.fb_type = fb_type
        self._sweep_fn = None
        self._chunk_fn = None

    def set_lm_counts(self):
        self.lm.state = self._all_transcript_counts()

    def _all_transcript_counts(self) -> BigramLMState:
        transcripts = self._all_transcripts()
        state = BigramLMState(
            unigram_counts=jnp.zeros((self.lm.K,), jnp.int32),
            bigram_counts=jnp.zeros((self.lm.K, self.lm.K), jnp.int32),
        )
        valid = jnp.ones((transcripts.shape[0],), bool)
        return add_block_counts(state, transcripts, valid, sign=1)

    def _all_transcripts(self) -> jnp.ndarray:
        """[U, S] padded component transcripts for every utterance."""
        am = self.acoustic_model
        segs = segments_from_boundaries(
            self._boundaries_dev, self.utterances.lengths_dev
        )
        from .common import gather_segment_embeds

        embeds = gather_segment_embeds(segs, self.utterances.seg_ids)
        ks = jnp.where(embeds >= 0, am.assignments[jnp.maximum(embeds, 0)], -1)
        return ks

    def get_unsup_transcript_i(self, i: int):
        self._sync_boundaries_to_host()
        return list(
            self.acoustic_model.components.get_assignments(
                self.utterances.get_segmented_embeds_i(i)
            )
        )

    def calc_p_continue(self) -> float:
        """(reference ``calc_p_continue``, bigram_acoustic_wordseg.py:697-715)."""
        if self.beta_sent_boundary != -1:
            n_tokens = int(jnp.sum(self.acoustic_model.stats.counts))
            n_sentences = self.utterances.D - 1
            n_continue = n_tokens - n_sentences
            return (n_continue + self.beta_sent_boundary / 2.0) / (
                n_tokens + self.beta_sent_boundary
            )
        return 1.0

    def log_prob_z(self) -> float:
        """Sequential-replay bigram assignment probability
        (reference ``log_prob_z``, bigram_acoustic_wordseg.py:287-305)."""
        if self._log_prob_z_fn is None:
            self._log_prob_z_fn = self._build_log_prob_z_fn()
        return float(self._log_prob_z_fn(self._all_transcripts()))

    def sweep_metrics_device(self):
        """Enqueue (log_prob_z, log_prob_X_given_z, K, n_assigned) as one
        fused device call (async record loop, cf. FBGMM.sweep_metrics_device).
        """
        if getattr(self, "_metrics_fn", None) is None:
            am = self.acoustic_model
            cov, prior, K_max = am.cov, am.prior, am.K_max
            utt = self.utterances
            seg_ids, lengths = utt.seg_ids, utt.lengths_dev
            if self._log_prob_z_fn is None:
                self._log_prob_z_fn = self._build_log_prob_z_fn()
            lpz_fn = self._log_prob_z_fn
            from .common import gather_segment_embeds

            @jax.jit
            def metrics(stats, assignments, boundaries):
                segs = segments_from_boundaries(boundaries, lengths)
                embeds = gather_segment_embeds(segs, seg_ids)
                ks = jnp.where(
                    embeds >= 0, assignments[jnp.maximum(embeds, 0)], -1
                )
                lpz = lpz_fn(ks)
                lpx = cov.log_marg(prior, stats)
                return (
                    lpz, lpx,
                    jnp.sum((stats.counts > 0).astype(jnp.int32)),
                    jnp.sum((assignments >= 0).astype(jnp.int32)),
                )

            self._metrics_fn = metrics
        am = self.acoustic_model
        return self._metrics_fn(am.stats, am.assignments, self._boundaries_dev)

    def log_marg(self) -> float:
        return self.log_prob_z() + self.acoustic_model.log_prob_X_given_z()

    def log_marg_i_embed_unigram(self, i_embed: int) -> float:
        """Unigram marginal of one held-out embedding under LM weights
        (reference ``log_marg_i_embed_unigram``, :314-329)."""
        am = self.acoustic_model
        cov = am.cov
        params = cov.predictive_params(am.prior, am.stats)
        from ..models.bigram_lm import log_prob_vec_i

        w = self.lms * log_prob_vec_i(self.lm.state, self.lm.a, self.lm.K,
                                      am.X.dtype)
        post = cov.log_post_pred(params, am.X[i_embed])
        logits = w + jnp.where(am.stats.counts > 0, post,
                               am.log_prior_vec[i_embed])
        return float(logsumexp(logits))

    def get_vec_embed_log_probs_unigram(self, vec_ids, durations) -> np.ndarray:
        """Duration-scaled unigram-marginal candidate scores in the
        reference's packed triangular layout (reference
        ``get_vec_embed_log_probs_unigram``,
        bigram_acoustic_wordseg.py:673-692).  Scores against the *current*
        model state, vectorised over candidates."""
        from ..models.bigram_lm import log_prob_vec_i

        vec_ids = np.asarray(vec_ids)
        durations = np.asarray(durations, dtype=float)
        out = np.full(len(vec_ids), -np.inf)
        valid = vec_ids != -1
        if valid.any():
            am = self.acoustic_model
            cov = am.cov
            ids = jnp.asarray(vec_ids[valid].astype(int))
            params = cov.predictive_params(am.prior, am.stats)
            w = self.lms * log_prob_vec_i(self.lm.state, self.lm.a,
                                          self.lm.K, am.X.dtype)
            post = cov.log_post_pred_batch(params, am.X[ids])
            logits = w[None, :] + jnp.where(
                (am.stats.counts > 0)[None, :], post,
                am.log_prior_vec[ids][:, None],
            )
            out[valid] = np.asarray(logsumexp(logits, axis=-1))
        nan_dur = np.isnan(durations)
        out[nan_dur & valid] = -np.inf
        ok = valid & ~nan_dur
        out[ok] = out[ok] * durations[ok] ** self.time_power_term
        return out + self.wip

    def get_vec_embed_log_probs_unigram_all(self, utt_ids=None):
        """Batch twin of :meth:`get_vec_embed_log_probs_unigram`: scores for
        MANY utterances in ONE device dispatch over the dense ``[U, N_max,
        W]`` corpus tensors, returned as packed triangular vectors (see
        ``unigram.get_vec_embed_log_probs_all`` for layout/window caveats).
        """
        from ..models.bigram_lm import log_prob_vec_i
        from .unigram import _dense_to_tri

        utt = self.utterances
        if utt_ids is None:
            utt_ids = np.arange(utt.D)
        utt_ids = np.asarray(utt_ids, dtype=np.int64)
        am = self.acoustic_model
        if not hasattr(self, "_batch_score_fn"):
            cov = am.cov
            prior, lms = am.prior, self.lms
            lm_a, lm_K = self.lm.a, self.lm.K

            @jax.jit
            def score_all(stats, X, log_prior_vec, lm_state, rows, seg_ids,
                          seg_durs, tpt, wip):
                ids_blk = seg_ids[rows]
                durs_blk = seg_durs[rows]
                flat = jnp.maximum(ids_blk, 0).reshape(-1)
                params = cov.predictive_params(prior, stats)
                w = lms * log_prob_vec_i(lm_state, lm_a, lm_K, X.dtype)
                post = cov.log_post_pred_batch(params, X[flat])
                logits = w[None, :] + jnp.where(
                    (stats.counts > 0)[None, :], post,
                    log_prior_vec[flat][:, None],
                )
                margs = logsumexp(logits, axis=-1).reshape(ids_blk.shape)
                return masked_candidate_scores(margs, ids_blk, durs_blk,
                                               tpt, wip)

            self._batch_score_fn = score_all
        dense = np.asarray(self._batch_score_fn(
            am.stats, am.X, am.log_prior_vec, self.lm.state,
            jnp.asarray(utt_ids), utt.seg_ids, utt.seg_durations,
            self.time_power_term, self.wip,
        ))
        return _dense_to_tri(dense, [utt.lengths[i] for i in utt_ids])

    def get_vec_embed_log_probs_bigram(self, vec_ids, durations):
        """Raising seam: the reference's bigram candidate scorer is an
        unimplemented stub (``get_vec_embed_log_probs_bigram``,
        bigram_acoustic_wordseg.py:694-695, body ``pass``); kept here so a
        future native bigram DP has a place to plug in."""
        raise NotImplementedError(
            "bigram candidate scoring is an unimplemented stub in the "
            "reference (bigram_acoustic_wordseg.py:694-695); use "
            "get_vec_embed_log_probs_unigram (fb_type='unigram')"
        )

    def gibbs_sample_inside_loop_i_embed(self, i_embed: int,
                                         j_prev_assignment: int = -1,
                                         anneal_temp: float = 1.0) -> int:
        """Sample a component for one (unassigned) embedding conditioned on
        the previous segment's component through the bigram LM, and add it
        to the acoustic model (reference
        ``gibbs_sample_inside_loop_i_embed``,
        bigram_acoustic_wordseg.py:332-384).  Returns the sampled component.

        The LM count tables are NOT updated here -- exactly like the
        reference, which re-adds the utterance's counts only after the whole
        utterance (``:496``).
        """
        from ..models.bigram_lm import log_prob_vec_i, prob_vec_given_j
        from ..ops.random import annealed_gumbel_max
        from ..ops.stats import add_item, canonicalize_new_component

        am = self.acoustic_model
        cov = am.cov
        if j_prev_assignment is not None and int(j_prev_assignment) >= 0:
            w = self.lms * jnp.log(prob_vec_given_j(
                self.lm.state, int(j_prev_assignment), self.lm.intrp_lambda,
                self.lm.a, self.lm.b, self.lm.K, am.X.dtype,
            ))
        else:
            w = self.lms * log_prob_vec_i(self.lm.state, self.lm.a,
                                          self.lm.K, am.X.dtype)
        params = cov.predictive_params(am.prior, am.stats)
        post = cov.log_post_pred(params, am.X[i_embed])
        logits = w + jnp.where(am.stats.counts > 0, post,
                               am.log_prior_vec[i_embed])
        am.key, sub = jax.random.split(am.key)
        k = annealed_gumbel_max(sub, logits, anneal_temp)
        k = canonicalize_new_component(am.stats.counts, k)
        am.stats = add_item(am.stats, am.X[i_embed], k,
                            full_cov=cov.FULL_COV)
        am.assignments = am.assignments.at[i_embed].set(k.astype(jnp.int32))
        return int(k)

    # ------------------------------------------------------------- sampling

    def gibbs_sample_i(self, i: int, anneal_temp: float = 1.0,
                       anneal_gibbs_am: bool = False,
                       assignments_only: bool = False) -> float:
        order = np.full((self.batch_size,), -1, dtype=np.int64)
        order[0] = i
        return self._run_blocks(order.reshape(1, -1), anneal_temp,
                                anneal_gibbs_am, assignments_only)

    def gibbs_sample(self, n_iter: int, am_n_iter: int = 0,
                     anneal_schedule=None, anneal_start_temp_inv: float = 0.1,
                     anneal_end_temp_inv: float = 1.0, n_anneal_steps: int = -1,
                     anneal_gibbs_am: bool = False,
                     assignments_only: bool = False, monitor_i=None,
                     validate: bool = False) -> dict:
        """(reference ``gibbs_sample``, bigram_acoustic_wordseg.py:553-670).

        ``monitor_i`` / ``validate``: per-sweep deep trace of one utterance
        and opt-in invariant checks (the reference's ``i_debug_monitor``
        traces, bigram_acoustic_wordseg.py:24, :400-407, and NaN asserts,
        :368; see ``utils/debug.py``)."""
        from ..utils.annealing import anneal_temperatures
        from ..utils import debug as dbg

        if am_n_iter > 0:
            raise NotImplementedError(
                "am_n_iter > 0: the reference asserts to-do here "
                "(bigram_acoustic_wordseg.py:634-638)"
            )
        if self.fb_type == "bigram" and not assignments_only:
            raise NotImplementedError(
                "fb_type='bigram' segmentation: the reference's bigram DP is "
                "an unimplemented stub (bigram_acoustic_wordseg.py:694-695, "
                ":728-758); use fb_type='unigram' as its recipes do."
            )

        logger.info("Gibbs sampling for " + str(n_iter) + " iterations")
        temps = anneal_temperatures(
            n_iter, anneal_schedule, anneal_start_temp_inv,
            anneal_end_temp_inv, n_anneal_steps,
        )
        record = {k: [] for k in (
            "sample_time", "log_marg", "log_marg*length", "log_prob_z",
            "log_prob_X_given_z", "anneal_temp", "components", "n_tokens")}
        # Asynchronous record loop; one batched fetch at the end.  Full
        # _WORDSEG_CHUNK-sized runs fuse into one dispatch with device-side
        # permutations (see segmenters/unigram.py); chunk entries'
        # sample_time is the chunk average.
        from .unigram import _WORDSEG_CHUNK

        use_chunks = (
            monitor_i is None and not validate
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
                chunk = self._get_chunk_fn(bool(assignments_only))
                am = self.acoustic_model
                ts = np.asarray(temps[i_iter:i_iter + _WORDSEG_CHUNK],
                                dtype=am.X.dtype)
                ats = ts if anneal_gibbs_am else np.ones_like(ts)
                (am.stats, am.assignments, self._boundaries_dev,
                 self.lm.state, am.key, lps, ms) = chunk(
                    am.stats, am.assignments, self._boundaries_dev,
                    self.lm.state, am.key, ts, ats)
                pending.append((time.time(), _WORDSEG_CHUNK, ts))
                pending_dev.append((lps, ms))
                i_iter += _WORDSEG_CHUNK
                continue
            temp = float(temps[i_iter])
            order = self._rng.permutation(self.utterances.D)
            blocks = pad_utterance_order(order, self.batch_size)
            log_prob_dev = self._run_blocks_async(blocks, temp,
                                                  anneal_gibbs_am,
                                                  assignments_only)
            pending.append((time.time(), 1, [temp]))
            pending_dev.append((log_prob_dev, self.sweep_metrics_device()))
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
                                 dbg.BIGRAM_CHECKS)
        fetched = jax.device_get(pending_dev)

        def append_one(rec, ts, j, f):
            log_prob, (lpz, lpx, k_act, n_tok) = f
            rec["log_marg"].append(float(lpz) + float(lpx))
            rec["log_marg*length"].append(float(log_prob))
            rec["log_prob_z"].append(float(lpz))
            rec["log_prob_X_given_z"].append(float(lpx))
            rec["anneal_temp"].append(float(ts[j]))
            rec["components"].append(int(k_act))
            rec["n_tokens"].append(int(n_tok))

        from .common import drain_pending_record

        return drain_pending_record(record, pending, fetched, start,
                                    append_one, logger)

    # ------------------------------------------------------------ internals

    def _sync_boundaries_to_host(self):
        self.utterances.set_boundaries_from_device(self._boundaries_dev)

    def _monitor_device(self, i: int):
        """Enqueue (unigram-marginal candidate scores, boundaries,
        transcript) of utterance ``i`` with the utterance held out
        (reference bigram i_debug_monitor traces,
        bigram_acoustic_wordseg.py:400-407)."""
        if getattr(self, "_monitor_fn", None) is None:
            am = self.acoustic_model
            cov, prior = am.cov, am.prior
            X, K_max, lms = am.X, am.K_max, am.lms
            log_prior_vec = am.log_prior_vec
            full_cov = cov.FULL_COV
            utt = self.utterances
            N_max, W_store = utt.N_max, utt.W
            W_dp = (min(self.n_slices_max, N_max)
                    if self.n_slices_max > 0 else N_max)
            seg_ids_all, seg_durs_all = utt.seg_ids, utt.seg_durations
            lengths_all = utt.lengths_dev
            tpt, wip = self.time_power_term, self.wip
            a, K_lm = self.lm.a, self.lm.K

            def dp_slice(arr):
                if W_store >= W_dp:
                    return arr[..., :W_dp]
                pad = [(0, 0)] * (arr.ndim - 1) + [(0, W_dp - W_store)]
                fill = -1 if jnp.issubdtype(arr.dtype, jnp.integer) else jnp.nan
                return jnp.pad(arr, pad, constant_values=fill)

            @jax.jit
            def monitor(stats, assignments, boundaries, lm_state, idx):
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
                contrib = utterance_contrib(X, old_embeds, old_ks, K_max,
                                            full_cov)
                lo = leave_out_stats(stats, contrib)
                uni_lo = lm_state.unigram_counts[None] - contrib.counts
                params = jax.vmap(
                    lambda s: cov.predictive_params(prior, s)
                )(lo)
                cand_ids = dp_slice(seg_ids_blk).reshape(1, N_max * W_dp)
                Xc = X[jnp.maximum(cand_ids, 0)]
                post = jax.vmap(cov.log_post_pred_batch)(params, Xc)
                c = uni_lo.astype(X.dtype)
                w = lms * (jnp.log(c + a / K_lm)
                           - jnp.log(jnp.sum(c, axis=-1, keepdims=True) + a))
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
                                self._boundaries_dev, self.lm.state,
                                jnp.int32(i))

    def _validate_device(self):
        if getattr(self, "_validate_fn", None) is None:
            from ..utils import debug as dbg

            lengths_all = self.utterances.lengths_dev

            @jax.jit
            def validate(stats, assignments, boundaries, lm_state):
                return dbg.bigram_validation_flags(
                    stats, assignments, boundaries, lengths_all, lm_state
                )

            self._validate_fn = validate
        am = self.acoustic_model
        return self._validate_fn(am.stats, am.assignments,
                                 self._boundaries_dev, self.lm.state)

    def _run_blocks(self, blocks, anneal_temp, anneal_gibbs_am,
                    assignments_only) -> float:
        return float(self._run_blocks_async(blocks, anneal_temp,
                                            anneal_gibbs_am, assignments_only))

    def _run_blocks_async(self, blocks, anneal_temp, anneal_gibbs_am,
                          assignments_only):
        am = self.acoustic_model
        sweep = self._get_sweep_fn(bool(assignments_only))
        assign_temp = anneal_temp if anneal_gibbs_am else 1.0
        from .common import place_blocks

        blocks_dev = place_blocks(blocks, getattr(self, "_mesh", None))
        (am.stats, am.assignments, self._boundaries_dev, self.lm.state,
         am.key, log_prob) = sweep(
            am.stats, am.assignments, self._boundaries_dev, self.lm.state,
            am.key, blocks_dev,
            np.asarray(anneal_temp, dtype=am.X.dtype),
            np.asarray(assign_temp, dtype=am.X.dtype),
        )
        return log_prob

    def _get_sweep_fn(self, assignments_only: bool):
        if self._sweep_fn is None:
            self._sweep_fn = {}
        if assignments_only not in self._sweep_fn:
            self._sweep_fn[assignments_only] = self._build_sweep_fn(assignments_only)
        return self._sweep_fn[assignments_only]

    def _cand_tables(self):
        """Sweep-static candidate slabs (see ``common.cand_tables``)."""
        am = self.acoustic_model
        return cand_tables(self.utterances, self.n_slices_max, am.X,
                           am.log_prior_vec)

    def _get_chunk_fn(self, assignments_only: bool):
        if getattr(self, "_chunk_fn", None) is None:
            self._chunk_fn = {}
        if assignments_only not in self._chunk_fn:
            self._chunk_fn[assignments_only] = self._build_chunk_fn(
                assignments_only)
        return self._chunk_fn[assignments_only]

    def _build_chunk_fn(self, assignments_only: bool):
        """Fused multi-sweep dispatch with device-side permutations and
        per-sweep metrics (cf. ``UnigramAcousticWordseg._build_chunk_fn``);
        the LM state rides in the carry."""
        from ..ops.stats import num_active
        from .common import gather_segment_embeds

        block_step = self._make_block_step(
            self.batch_size, pallas=True, reduce_fn=lambda t: t,
            assignments_only=assignments_only, assign_table=True,
        )
        utt = self.utterances
        seg_ids_all = utt.seg_ids
        seg_durs_all = utt.seg_durations
        lengths_all = utt.lengths_dev
        am = self.acoustic_model
        cov, prior = am.cov, am.prior
        dtype = am.X.dtype
        N = am.X.shape[0]
        U = utt.D
        B = self.batch_size
        n_blocks = -(-U // B)
        pad = n_blocks * B - U
        N_max, W_store = utt.N_max, utt.W
        W_dp = min(self.n_slices_max, N_max) if self.n_slices_max > 0 \
            else N_max
        seg_w = seg_ids_all[..., :W_dp] if W_store >= W_dp else jnp.pad(
            seg_ids_all, ((0, 0), (0, 0), (0, W_dp - W_store)),
            constant_values=-1)
        seg_flat = seg_w.reshape(U, N_max * W_dp)
        if self._log_prob_z_fn is None:
            self._log_prob_z_fn = self._build_log_prob_z_fn()
        lpz_fn = self._log_prob_z_fn

        @jax.jit
        def chunk(stats, assignments, boundaries, lm_state, key, temps,
                  assign_temps, cand_X_all=None, cand_lp_all=None):
            # Compact slot-table carry across the chunk (see
            # segmenters/unigram.py); the [N] vector is re-materialized
            # once at the end.
            embeds0, segs0 = gather_block_segments(
                boundaries, lengths_all, seg_ids_all
            )
            ks0 = jnp.where(embeds0 >= 0,
                            assignments[jnp.maximum(embeds0, 0)], -1)
            a_dtype = assignments.dtype
            A = assign_rows_from_segments(segs0, ks0, W_dp, N_max * W_dp)

            def one_sweep(carry, ts):
                stats, A, boundaries, lm_state, key = carry
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

                init = (stats, A, boundaries, lm_state, key,
                        jnp.zeros((), dtype))
                ((stats, A, boundaries, lm_state, key, lp),
                 _) = jax.lax.scan(f, init, blocks)
                segs = segments_from_boundaries(boundaries, lengths_all)
                embeds = gather_segment_embeds(segs, seg_ids_all)
                ks = jnp.where(
                    embeds >= 0, select_assign_slots(A, segs, W_dp), -1
                )
                m = (
                    ks,
                    cov.log_marg(prior, stats),
                    num_active(stats),
                    jnp.sum((A >= 0).astype(jnp.int32)),
                )
                return (stats, A, boundaries, lm_state, key), \
                    (lp, m)

            (stats, A, boundaries, lm_state, key), (lps, ms) = (
                jax.lax.scan(
                    one_sweep,
                    (stats, A, boundaries, lm_state, key),
                    (temps, assign_temps),
                )
            )
            assignments = materialize_assignments(A, seg_flat, N, a_dtype)
            # The LM-replay metric's batched sort is pass-latency-bound,
            # not bandwidth-bound, so replaying all chunk sweeps in ONE
            # vmapped sort costs about the same as one sweep's replay
            # (measured: ~3.1 ms/sweep -> ~0.4 ms/sweep at benchmark
            # scale).  The transcripts ride the scan outputs; values are
            # identical to the per-sweep calls.
            ks_stack, lpx, k_act, n_tok = ms
            lpz = jax.vmap(lpz_fn)(ks_stack)
            ms = (lpz, lpx, k_act, n_tok)
            return stats, assignments, boundaries, lm_state, key, lps, ms

        cand_X_all, cand_lp_all = self._cand_tables()
        return lambda *args: chunk(*args, cand_X_all=cand_X_all,
                                   cand_lp_all=cand_lp_all)

    def _build_log_prob_z_fn(self):
        lam, a, b, K = (self.lm.intrp_lambda, self.lm.a, self.lm.b, self.lm.K)
        dtype = self.acoustic_model.X.dtype

        def self_ranks(keys):
            """rank[g, t] = #{s < t : keys[g, s] == keys[g, t]} for G
            independent key spaces in ONE batched sort.

            Fully parallel replacement for replay counting (the reference
            replays the corpus sequentially,
            bigram_acoustic_wordseg.py:287-305; ranks among equal keys in
            the fixed replay order are the same numbers).  Sort
            (key, position): within an equal-key run the rank is the offset
            from the run start; scatter the ranks back by the position
            payload (a permutation, so every update lands).
            """
            G, T = keys.shape
            iota = jnp.arange(T, dtype=jnp.int32)[None, :]
            pos = jnp.broadcast_to(iota, (G, T))
            sk, sp = jax.lax.sort((keys, pos), dimension=1, num_keys=2)
            first = jnp.concatenate(
                [jnp.ones((G, 1), bool), sk[:, 1:] != sk[:, :-1]], axis=1
            )
            start = jax.lax.cummax(jnp.where(first, iota, 0), axis=1)
            rank = iota - start
            g_idx = jnp.arange(G, dtype=jnp.int32)[:, None]
            return jnp.zeros((G, T), rank.dtype).at[g_idx, sp].set(rank)

        @jax.jit
        def log_prob_z(transcripts):
            U, S = transcripts.shape
            pj, pi, prev_pos = transcript_pairs_batch(
                transcripts, return_prev_pos=True)
            flat_j = pj.reshape(-1)
            flat_i = pi.reshape(-1)
            valid = flat_i >= 0
            has_prev = flat_j >= 0
            n_before = (jnp.cumsum(valid.astype(jnp.int32))
                        - valid.astype(jnp.int32))
            i_s = jnp.maximum(flat_i, 0)
            j_s = jnp.maximum(flat_j, 0)
            pair_valid = valid & has_prev
            # Two self-rank groups: token keys (unigram numerator) and
            # (prev, cur) pair keys (bigram numerator).  The bigram
            # DENOMINATOR — #{key-j tokens before the pair} — needs no
            # third group: the pair immediately follows its prev token in
            # replay order, so it equals rank_uni[prev] + 1.
            tok_key = jnp.where(valid, i_s, K)
            pair_key = jnp.where(pair_valid, j_s * K + i_s, K * K)
            ranks = self_ranks(jnp.stack([tok_key, pair_key]))
            rank_uni, rank_big = ranks[0], ranks[1]
            # rank_uni at each token's previous valid position (+1 for the
            # prev token itself); the position comes straight from
            # transcript_pairs_batch's encoded cummax, so the pairing
            # convention lives in exactly one place.
            r_u_prev = jnp.take_along_axis(
                rank_uni.reshape(U, S), jnp.maximum(prev_pos, 0), axis=1
            ).reshape(-1)
            uni_j_before = r_u_prev + 1
            p_uni = (rank_uni.astype(dtype) + a / K) / (
                n_before.astype(dtype) + a
            )
            p_big = (rank_big.astype(dtype) + b / K) / (
                uni_j_before.astype(dtype) + b
            )
            p = jnp.where(has_prev, lam * p_uni + (1.0 - lam) * p_big, p_uni)
            return jnp.sum(jnp.where(valid, jnp.log(p), 0.0))

        return log_prob_z

    def _make_block_step(self, B: int, pallas: bool, reduce_fn,
                         assignments_only: bool, assign_table: bool = False,
                         axis_name=None):
        """Per-block bigram Gibbs update, shared by the single-device sweep
        (``reduce_fn`` = identity) and the shard_map sweep (``reduce_fn`` =
        ``psum``); see ``UnigramAcousticWordseg._make_block_step`` (incl.
        the deferred once-per-sweep assignment-merge contract: returns
        ``(carry, updates)``).  The LM count-table deltas are additive, so
        under shard_map they ride the same ``psum`` as the
        acoustic-statistic deltas."""
        am = self.acoustic_model
        cov, prior = am.cov, am.prior
        X = am.X
        K_max, lms = am.K_max, am.lms
        log_prior_vec = am.log_prior_vec
        full_cov = cov.FULL_COV
        utt = self.utterances
        N_max = utt.N_max
        W_store = utt.W
        W_dp = min(self.n_slices_max, N_max) if self.n_slices_max > 0 else N_max
        n_min = self.n_slices_min
        tpt = self.time_power_term
        wip = self.wip
        beta_sb = float(self.beta_sent_boundary)
        n_sentences = self.utterances.D - 1
        decollide = getattr(self, "decollide_new", True)
        lam, a, b, K_lm = (self.lm.intrp_lambda, self.lm.a, self.lm.b, self.lm.K)
        assert K_lm == K_max
        cov_type = am.covariance_type

        def dp_slice(arr):
            if W_store >= W_dp:
                return arr[..., :W_dp]
            pad = [(0, 0)] * (arr.ndim - 1) + [(0, W_dp - W_store)]
            fill = -1 if jnp.issubdtype(arr.dtype, jnp.integer) else jnp.nan
            return jnp.pad(arr, pad, constant_values=fill)

        def log_p_continue_dev(counts):
            """In-sweep Beta sentence-boundary term (reference
            ``calc_p_continue``, bigram_acoustic_wordseg.py:697-715); avoids
            a per-sweep synchronous host fetch."""
            if beta_sb == -1:
                return jnp.zeros((), X.dtype)
            n_tokens = jnp.sum(counts).astype(X.dtype)
            n_continue = n_tokens - n_sentences
            return jnp.log(
                (n_continue + beta_sb / 2.0) / (n_tokens + beta_sb)
            )

        def lm_unigram_logw(uni_lo_b):
            c = uni_lo_b.astype(X.dtype)
            return lms * (jnp.log(c + a / K_max) - jnp.log(jnp.sum(c) + a))

        pallas_chain_ok = (not full_cov and pallas
                           and cov_type in ("fixed", "diag"))

        def assignment_chain(lo_b, params_b, uni_lo_b, big_table, big_corr_j,
                             big_corr_i, embeds_b, x_b, lp_b, gumb_b, temp):
            """Sequential bigram-conditioned assignment resampling (reference
            gibbs_sample_inside_loop_i_embed, bigram_acoustic_wordseg.py:332-384).

            ``big_corr_{j,i}``: the utterance's own OLD bigram pairs, removed
            from the global table rows on the fly (the LM counts are only
            re-added after the whole utterance, reference :410, :496).
            """
            uni_w = lm_unigram_logw(uni_lo_b)  # frozen during the chain
            uni_prob = (uni_lo_b.astype(X.dtype) + a / K_max) / (
                jnp.sum(uni_lo_b.astype(X.dtype)) + a
            )
            # One-hot table of the utterance's own OLD bigram successors,
            # built once; the per-step correction is then a [1,S]x[S,K]
            # matvec instead of an [S,K] mask rebuild.
            onehot_pi = (
                jax.nn.one_hot(jnp.maximum(big_corr_i, 0), K_max,
                               dtype=X.dtype)
                * (big_corr_i >= 0).astype(X.dtype)[:, None]
            )  # [S, K]

            def step(carry, inp):
                stats_b, p_b, j_prev = carry
                e, x, lp, g = inp
                ok = e >= 0
                # Bigram row with own-count corrections.
                j_s = jnp.maximum(j_prev, 0)
                row = big_table[j_s].astype(X.dtype)
                sel = (big_corr_j == j_s).astype(X.dtype)
                row = row - sel @ onehot_pi
                uni_j = uni_lo_b[j_s].astype(X.dtype)
                p_cond = lam * uni_prob + (1.0 - lam) * (row + b / K_max) / (
                    uni_j + b
                )
                w_big = lms * jnp.log(p_cond)
                w = jnp.where(j_prev >= 0, w_big, uni_w)
                post = cov.log_post_pred(p_b, x)
                logits = w + jnp.where(stats_b.counts > 0, post, lp)
                k = jnp.argmax(jnp.where(
                    jnp.isneginf(logits), NEG_INF, logits / temp + g
                ))
                k = canonicalize_new_component(stats_b.counts, k)
                stats_b = add_item(stats_b, x, k, full_cov=full_cov,
                                   weight=ok.astype(jnp.int32))
                p_b = cov.update_predictive_row(prior, stats_b, p_b, k)
                j_next = jnp.where(ok, k.astype(jnp.int32), j_prev)
                return (stats_b, p_b, j_next), jnp.where(
                    ok, k.astype(jnp.int32), -1
                )

            (_, _, _), ks = jax.lax.scan(
                step, (lo_b, params_b, jnp.int32(-1)),
                (embeds_b, x_b, lp_b, gumb_b)
            )
            return ks

        from .fullcov import (
            corrected_candidate_post,
            counts_contrib,
            fullcov_chain,
            touched_leave_out,
        )

        def bigram_weight_fn(big_table):
            """Mixture-weight term for the full-covariance chain: the smooth
            interpolated bigram conditional given the previously sampled
            component (reference gibbs_sample_inside_loop_i_embed,
            bigram_acoustic_wordseg.py:332-384), with the utterance's own OLD
            pairs removed from the global table rows on the fly."""

            def weight_fn(counts, j_prev, aux_b):  # noqa: ARG001
                uni_w, uni_prob, uni_lo_b, big_corr_j, onehot_pi = aux_b
                j_s = jnp.maximum(j_prev, 0)
                row = big_table[j_s].astype(X.dtype)
                sel = (big_corr_j == j_s).astype(X.dtype)
                row = row - sel @ onehot_pi
                uni_j = uni_lo_b[j_s].astype(X.dtype)
                p_cond = lam * uni_prob + (1.0 - lam) * (row + b / K_max) / (
                    uni_j + b
                )
                return jnp.where(j_prev >= 0, lms * jnp.log(p_cond), uni_w)

            return weight_fn

        def block_step(carry, idx_blk, seg_ids_all, seg_durs_all, lengths_all,
                       anneal_temp, assign_temp, cand_X_all=None,
                       cand_lp_all=None):
            stats, assignments, boundaries, lm_state, key, lp_total = carry
            valid = idx_blk >= 0
            idx = jnp.maximum(idx_blk, 0)
            lengths_blk = jnp.where(valid, lengths_all[idx], 0)
            seg_ids_blk = seg_ids_all[idx]
            seg_durs_blk = seg_durs_all[idx]
            bounds_blk = boundaries[idx]

            # Old segments, transcripts and LM/AM leave-outs.
            old_embeds, segs_old = gather_block_segments(
                bounds_blk, lengths_blk, seg_ids_blk
            )
            if assign_table:
                old_ks = select_assign_slots(assignments[idx], segs_old,
                                             W_dp)
                old_ks = jnp.where(old_embeds >= 0, old_ks, -1)
            else:
                old_ks = jnp.where(
                    old_embeds >= 0,
                    assignments[jnp.maximum(old_embeds, 0)], -1,
                )
            pj, pi = transcript_pairs_batch(old_ks)
            # Sweep-static candidate tensors indexed as per-utterance slabs
            # when precomputed, and segment rows pulled from them by one-hot
            # MXU contraction (see segmenters/unigram.py and
            # common.slab_segment_rows).
            if not assignments_only:
                if cand_X_all is None:
                    cand_ids = dp_slice(seg_ids_blk).reshape(
                        B, N_max * W_dp)
                    Xc = X[jnp.maximum(cand_ids, 0)]
                    prior_c = log_prior_vec[jnp.maximum(cand_ids, 0)]
                else:
                    Xc = cand_X_all[idx].reshape(B, N_max * W_dp, -1)
                    prior_c = cand_lp_all[idx].reshape(B, N_max * W_dp)
            slab_ok = (W_store == W_dp) and not assignments_only
            if slab_ok:
                Xe_old, _ = slab_segment_rows(Xc, prior_c, segs_old, W_dp)
            else:
                Xe_old = None
            if full_cov:
                lo = params_b = None
                cnt_c = counts_contrib(old_ks, old_embeds >= 0, K_max)
                lo_counts = stats.counts[None] - cnt_c
                uni_lo = lm_state.unigram_counts[None] - cnt_c
                params_g = cov.predictive_params(prior, stats)
                touched = touched_leave_out(prior, stats, X, old_embeds,
                                            old_ks, rows=Xe_old)
            elif pallas_chain_ok:
                # Fused-kernel path: leave-out moments built FEATURE-MAJOR
                # ([B, D, K] -- the VMEM layout of both the scoring and
                # chain kernels), so no [B, K, D] tensor or relayout copy
                # chain exists anywhere (see segmenters/unigram.py).
                lo = params_b = None
                cnt_c = counts_contrib(old_ks, old_embeds >= 0, K_max)
                lo_counts = stats.counts[None] - cnt_c
                uni_lo = lm_state.unigram_counts[None] - cnt_c
                sum_xT, sum_sqT = leave_out_moments_T(
                    stats, X, old_embeds, old_ks, K_max,
                    with_sq=cov_type == "diag", rows=Xe_old,
                )
            else:
                old_contrib = utterance_contrib(X, old_embeds, old_ks, K_max,
                                                full_cov, rows=Xe_old)
                lo = leave_out_stats(stats, old_contrib)
                lo_counts = lo.counts
                uni_lo = lm_state.unigram_counts[None] - old_contrib.counts
                params_b = jax.vmap(
                    lambda s: cov.predictive_params(prior, s)
                )(lo)

            # Boundary resampling with unigram-marginal scores
            # (get_vec_embed_log_probs_unigram, :673-692).
            key, k_dp, k_assign = jax.random.split(key, 3)
            if not assignments_only:
                if full_cov and not pallas:
                    M = N_max * W_dp
                    post = cov.log_post_pred_batch(
                        params_g, Xc.reshape(B * M, -1)
                    ).reshape(B, M, K_max)
                    post = corrected_candidate_post(post, Xc, touched, K_max)
                else:
                    post = None
                w_b = jax.vmap(lm_unigram_logw)(uni_lo)
                if post is None and pallas and full_cov:
                    # Fused corrected scoring (see ops/pallas_score.py);
                    # the LM unigram weights ride in as the mixture-weight
                    # vector.
                    from ..ops.pallas_score import fullcov_log_margs
                    from .fullcov import fullcov_score_inputs

                    g, t, oh_t, tmask_t = fullcov_score_inputs(
                        params_g, touched
                    )
                    log_margs = fullcov_log_margs(
                        Xc.reshape(B, N_max * W_dp, -1), prior_c, *g, *t,
                        oh_t, tmask_t, w_b, lo_counts, K=K_max,
                        interpret=jax.default_backend() != "tpu",
                        valid_m=lengths_blk * W_dp,
                    ).reshape(B, N_max, W_dp)
                elif post is None and pallas and cov_type == "fixed":
                    # Fused scoring: the [B, M, K] logits tile never leaves
                    # VMEM (see ops/pallas_score.py); the LM unigram weights
                    # ride in as the mixture-weight vector.  Parameter
                    # tables derived feature-major (no relayout copies).
                    from ..ops.pallas_score import fixedvar_log_margs_T

                    muT, precT = cov.predictive_params_T(
                        prior, lo_counts, sum_xT
                    )
                    # Prefix skip only for long candidate axes (see the
                    # unigram driver: at M=120 the sort overhead outweighs
                    # the ~0.4 ms fixedvar scorer stage).
                    vm = lengths_blk * W_dp if N_max * W_dp > 256 else None
                    log_margs = fixedvar_log_margs_T(
                        Xc, prior_c, muT, precT, w_b, lo_counts, K=K_max,
                        interpret=jax.default_backend() != "tpu",
                        valid_m=vm,
                    ).reshape(B, N_max, W_dp)
                elif post is None and pallas and cov_type == "diag":
                    # Diag fused scoring, LM unigram weights as the
                    # mixture-weight vector (parity with the unigram driver,
                    # segmenters/unigram.py).
                    from ..ops.pallas_score import diag_log_margs_T

                    muT, inv_varT, lpv_b, v_b = cov.predictive_params_T(
                        prior, lo_counts, sum_xT, sum_sqT
                    )
                    log_margs = diag_log_margs_T(
                        Xc, prior_c, muT, inv_varT, lpv_b, v_b, w_b,
                        lo_counts, K=K_max,
                        interpret=jax.default_backend() != "tpu",
                        valid_m=lengths_blk * W_dp,
                    ).reshape(B, N_max, W_dp)
                else:
                    if post is None:
                        post = jax.vmap(cov.log_post_pred_batch)(params_b, Xc)
                    logits = w_b[:, None, :] + jnp.where(
                        (lo_counts > 0)[:, None, :], post, prior_c[..., None]
                    )
                    log_margs = logsumexp(logits, axis=-1).reshape(
                        B, N_max, W_dp
                    )
                scores = masked_candidate_scores(
                    log_margs, dp_slice(seg_ids_blk),
                    dp_slice(seg_durs_blk), tpt, wip,
                )
                log_prob, new_bounds = dp_ops.segment_dp(
                    scores, lengths_blk, k_dp,
                    log_p_continue_dev(stats.counts), anneal_temp,
                    n_slices_min=n_min, n_slices_max=W_dp, mode="sample",
                    use_pallas=None if pallas else False,
                )
                new_embeds, segs_new = gather_block_segments(
                    new_bounds, lengths_blk, seg_ids_blk
                )
            else:
                log_prob = jnp.zeros((B,), X.dtype)
                new_bounds = bounds_blk
                new_embeds = old_embeds
                segs_new = segs_old
            if slab_ok:
                Xe_new, lpe_new = slab_segment_rows(Xc, prior_c, segs_new,
                                                    W_dp)
            else:
                Xe_new = X[jnp.maximum(new_embeds, 0)]
                lpe_new = log_prior_vec[jnp.maximum(new_embeds, 0)]

            # Sequential bigram-conditioned assignment chains.
            gumbel = jax.random.gumbel(
                k_assign, new_embeds.shape + (K_max,), dtype=X.dtype
            )
            big_table = lm_state.bigram_counts
            if full_cov:
                S = new_embeds.shape[1]
                # HIGHEST: these scores feed an argmax over K (see
                # components_full.log_post_pred_batch docstring).
                G_new = cov.log_post_pred_batch(
                    params_g, Xe_new.reshape(B * S, -1),
                    precision=jax.lax.Precision.HIGHEST,
                ).reshape(B, S, K_max)
                if pallas:
                    # Bigram-conditioned full-NIW touched-slot chain as a
                    # Pallas kernel (parity with the unigram driver's
                    # fullcov_chain_pallas path).
                    from ..ops.pallas_chain import fullcov_chain_pallas
                    from .fullcov import pallas_chain_inputs

                    (scnt0, tm0, tiP0, tld0, tk0, g_m, g_iP, g_ld) = (
                        pallas_chain_inputs(prior, params_g, stats.counts,
                                            touched)
                    )
                    new_ks = fullcov_chain_pallas(
                        new_embeds, Xe_new, lpe_new, gumbel,
                        G_new, lo_counts, scnt0, tm0, tiP0, tld0, tk0,
                        g_m, g_iP, g_ld, float(prior.k_0),
                        float(prior.v_0), assign_temp,
                        alpha=0.0, K=K_max, lms=lms, use_argmax=False,
                        interpret=jax.default_backend() != "tpu",
                        uni_lo=uni_lo, big_table=big_table,
                        corr_j=pj, corr_i=pi,
                        lm_params=(float(a), float(lam), float(b)),
                    )
                else:
                    onehot_pi = (
                        jax.nn.one_hot(jnp.maximum(pi, 0), K_max,
                                       dtype=X.dtype)
                        * (pi >= 0).astype(X.dtype)[..., None]
                    )  # [B, S, K]
                    aux = (
                        jax.vmap(lm_unigram_logw)(uni_lo),
                        (uni_lo.astype(X.dtype) + a / K_max)
                        / (jnp.sum(uni_lo, axis=-1,
                                   keepdims=True).astype(X.dtype) + a),
                        uni_lo, pj, onehot_pi,
                    )
                    new_ks = fullcov_chain(
                        prior, X, params_g, stats.counts, lo_counts, touched,
                        new_embeds, G_new, gumbel, log_prior_vec, 0.0, K_max,
                        lms, assign_temp, use_argmax=False,
                        weight_fn=bigram_weight_fn(big_table), aux_args=aux,
                    )
            elif pallas_chain_ok and cov_type == "fixed":
                from ..ops.pallas_chain import bigram_fixedvar_chain

                new_ks = bigram_fixedvar_chain(
                    new_embeds, Xe_new, lpe_new, gumbel,
                    lo_counts, sum_xT,
                    prior.var, prior.var_0, prior.mu_0, assign_temp,
                    uni_lo, big_table, pj, pi,
                    alpha_a=a, intrp_lambda=lam, b_smooth=b,
                    K=K_max, lms=lms,
                    interpret=jax.default_backend() != "tpu",
                    stats_T=True,
                )
            elif pallas_chain_ok and cov_type == "diag":
                from ..ops.pallas_chain import bigram_diag_chain

                new_ks = bigram_diag_chain(
                    new_embeds, Xe_new, lpe_new, gumbel,
                    lo_counts, sum_xT, sum_sqT,
                    prior.m_0, float(prior.k_0), float(prior.v_0),
                    prior.S_0, assign_temp,
                    uni_lo, big_table, pj, pi,
                    alpha_a=a, intrp_lambda=lam, b_smooth=b,
                    K=K_max, lms=lms,
                    interpret=jax.default_backend() != "tpu",
                    stats_T=True,
                )
            elif cov_type == "diag":
                # Non-pallas diag (GSPMD mesh): the XLA twin with the
                # kernel's Stirling-lgamma composition (bit-identical
                # chains; CLAUDE.md invariant).
                from ..ops.pallas_chain import bigram_diag_chain_xla

                new_ks = bigram_diag_chain_xla(
                    new_embeds, Xe_new, lpe_new, gumbel,
                    lo.counts, lo.sum_x, lo.sum_sq,
                    prior.m_0, float(prior.k_0), float(prior.v_0),
                    prior.S_0, assign_temp,
                    uni_lo, big_table, pj, pi,
                    alpha_a=a, intrp_lambda=lam, b_smooth=b,
                    K=K_max, lms=lms,
                )
            else:
                new_ks = jax.vmap(
                    lambda lo_b, p_b, u_b, cj, ci, e_b, x_b, lp_b, g_b:
                    assignment_chain(
                        lo_b, p_b, u_b, big_table, cj, ci, e_b, x_b, lp_b,
                        g_b, assign_temp
                    )
                )(lo, params_b, uni_lo, pj, pi, new_embeds, Xe_new, lpe_new,
                  gumbel)

            # Cross-utterance new-component decollision before any merge
            # (see common.decollide_new_components and the unigram driver).
            # Valid for the bigram LM too: a slot with zero global acoustic
            # count appears in no transcript, so its leave-out LM counts are
            # zero and every such slot enters the chain's conditional with
            # an identical smoothed weight -- exchangeable, relabel-safe.
            if decollide and B > 1:
                new_ks = decollide_new_components(
                    new_ks, (new_embeds >= 0) & valid[:, None], lo_counts,
                    stats.counts, axis_name=axis_name)

            # Merge acoustic stats / LM counts / assignments / boundaries.
            # All deltas are additive, so under shard_map ``reduce_fn`` psums
            # them before they are applied to the replicated state.
            old_ks_masked = jnp.where(valid[:, None], old_ks, -1)
            old_flat_contrib = flat_contrib(X, old_embeds, old_ks_masked,
                                            K_max, full_cov, valid,
                                            rows=Xe_old)
            new_flat_contrib = flat_contrib(X, new_embeds, new_ks, K_max,
                                            full_cov, valid, rows=Xe_new)
            lm_delta = block_count_delta(
                old_ks, new_ks, valid, K_max, pairs_old=(pj, pi)
            )
            stats_delta = jax.tree.map(
                lambda n, o: n - o, new_flat_contrib, old_flat_contrib
            )
            stats_delta, lm_delta = reduce_fn((stats_delta, lm_delta))
            stats = jax.tree.map(
                lambda g, d: (g + d).astype(g.dtype), stats, stats_delta
            )
            lm_state = jax.tree.map(
                lambda g, d: (g + d).astype(g.dtype), lm_state, lm_delta
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
                return ((stats, assignments, boundaries, lm_state, key,
                         lp_total), None)
            return ((stats, assignments, boundaries, lm_state, key,
                     lp_total),
                    (valid, old_embeds, new_embeds, new_ks))

        return block_step

    def _build_sweep_fn(self, assignments_only: bool):
        on_mesh = getattr(self, "_mesh", None) is not None
        block_step = self._make_block_step(
            self.batch_size, pallas=not on_mesh, reduce_fn=lambda t: t,
            assignments_only=assignments_only,
        )
        utt = self.utterances
        seg_ids_all = utt.seg_ids
        seg_durs_all = utt.seg_durations
        lengths_all = utt.lengths_dev
        dtype = self.acoustic_model.X.dtype

        @jax.jit
        def sweep(stats, assignments, boundaries, lm_state, key, blocks,
                  anneal_temp, assign_temp, cand_X_all=None,
                  cand_lp_all=None):
            def f(carry, idx_blk):
                return block_step(
                    carry, idx_blk, seg_ids_all, seg_durs_all, lengths_all,
                    anneal_temp, assign_temp,
                    cand_X_all=cand_X_all, cand_lp_all=cand_lp_all,
                )

            init = (stats, assignments, boundaries, lm_state, key,
                    jnp.zeros((), dtype))
            ((stats, assignments, boundaries, lm_state, key, lp_total),
             updates) = jax.lax.scan(f, init, blocks)
            assignments = merge_sweep_assignments(
                assignments, updates, lambda t: t
            )
            return stats, assignments, boundaries, lm_state, key, lp_total

        if on_mesh:
            return sweep
        # Candidate tensors as ARGUMENTS, not closed-over constants (see
        # segmenters/unigram.py).
        cand_X_all, cand_lp_all = self._cand_tables()
        return lambda *args: sweep(*args, cand_X_all=cand_X_all,
                                   cand_lp_all=cand_lp_all)


if __name__ == "__main__":  # smoke demo (reference bigram_acoustic_wordseg.py:765-857)
    from segmentalist_tpu.demos import demo_bigram_seg

    demo_bigram_seg()
