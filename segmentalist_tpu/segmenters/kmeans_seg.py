"""Segmental k-means word segmentation (TPU-native).

Re-design of the reference ``SegmentalKMeansWordseg``
(``kmeans_acoustic_wordseg.py:27-443``): per-utterance Viterbi segmentation on
duration-scaled best-component distances, followed by argmax re-assignment.

Differences from the unigram sweep: candidate scoring uses the *global*
component means (the reference does not remove the utterance before scoring,
``kmeans_acoustic_wordseg.py:252-267``); the DP is max-product with no
``p_continue``; assignments are frozen-means argmaxes
(``get_max_unsup_transcript_i``, ``:436-442``), so no sequential chain is
needed inside an utterance.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..corpus import Utterances
from ..models.kmeans import (
    KMeans,
    KMeansState,
    kmeans_state_from_assignments,
    means_from_state,
    neg_sqrd_norms,
)

from ..ops import dp as dp_ops
from ..ops.random import NEG_INF
from .common import (
    assign_rows_from_segments,
    cand_tables,
    flat_contrib,
    gather_block_segments,
    materialize_assignments,
    merge_sweep_assignments,
    pad_utterance_order,
    select_assign_slots,
    slab_segment_rows,
)
from .unigram import process_embeddings

logger = logging.getLogger(__name__)

# The sweep maintains counts/sum_x by additive per-block deltas (see
# ``_make_block_step``); f32 rounding drift vs a from-scratch rebuild is
# unbounded over arbitrarily long runs (measured ~1e-5 relative after a
# 500-sweep soak, PERFORMANCE.md).  An exact rebuild from the assignment
# vector every _RESYNC_EVERY sweeps bounds the drift at negligible cost
# (two segment-sums over the corpus, ~0.6 ms at benchmark scale).
_RESYNC_EVERY = 128


def forward_backward_kmeans_viterbi(vec_embed_neg_len_sqrd_norms, N,
                                    n_slices_min=0, n_slices_max=0,
                                    i_utt=None):
    """Module-level segmental k-means Viterbi over one utterance's packed
    triangular score vector (reference ``forward_backward_kmeans_viterbi``,
    kmeans_acoustic_wordseg.py:449-555).  Returns ``(sum_neg_len_sqrd_norm,
    boundaries)``."""
    from .unigram import _tri_to_dense

    W = min(n_slices_max, N) if n_slices_max > 0 else N
    scores = jnp.asarray(
        _tri_to_dense(vec_embed_neg_len_sqrd_norms, N, W)
    )
    obj, bounds = dp_ops.segment_dp(
        scores, jnp.asarray([N], jnp.int32), jax.random.PRNGKey(0), 0.0,
        1.0, n_slices_min=n_slices_min, n_slices_max=W, mode="viterbi",
    )
    return float(obj[0]), np.asarray(bounds[0])


class SegmentalKMeansWordseg:
    """Segmental k-means word segmentation using acoustic word embeddings
    (constructor parity with ``kmeans_acoustic_wordseg.py:101-223``)."""

    def __init__(self, am_K, embedding_mats, vec_ids_dict, durations_dict,
                 landmarks_dict, seed_boundaries_dict=None,
                 seed_assignments_dict=None, n_slices_min=0, n_slices_max=20,
                 min_duration=0, p_boundary_init=0.5,
                 init_am_assignments="rand", wip=0.0,
                 batch_size: Optional[int] = None, seed: int = 0):
        logger.info("Initializing")
        assert seed_assignments_dict is None or seed_boundaries_dict is not None

        self.n_slices_min = int(n_slices_min)
        self.n_slices_max = int(n_slices_max)
        self.wip = float(wip)

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

        # Batched native segmentation query (falls back to the per-
        # utterance host loop; see Utterances.all_segmented_embeds).
        all_embeds = self.utterances.all_segmented_embeds()
        init_embeds = all_embeds[all_embeds >= 0]
        logger.info("No. initial embeddings: " + str(init_embeds.shape[0]))

        assignments = -1 * np.ones(N, dtype=int)
        if seed_assignments_dict is not None:
            raise NotImplementedError("seed assignments: reference asserts to-do "
                                      "(kmeans_acoustic_wordseg.py:149)")
        elif init_am_assignments == "rand":
            logger.info("Using random initial component assignments")
            assignments[init_embeds] = np.random.randint(0, am_K, len(init_embeds))
        elif init_am_assignments == "spread":
            logger.info("Spreading component assignments")
            n_init = len(init_embeds)
            lst = (list(range(am_K)) * int(np.ceil(float(n_init) / am_K)))[:n_init]
            np.random.shuffle(lst)
            assignments[init_embeds] = np.array(lst)
        else:
            raise ValueError(
                "invalid value for `init_am_assignments`: " + init_am_assignments
            )

        self.acoustic_model = KMeans(embeddings, am_K, assignments)
        self.batch_size = int(batch_size) if batch_size else min(
            64, self.utterances.D
        )
        self._boundaries_dev = self.utterances.boundaries_device()
        self._rng = np.random.RandomState(seed)
        self._key = jax.random.PRNGKey(seed)
        self._sweep_fn = None
        self._sweeps_since_resync = 0

    # ------------------------------------------------------------------ API

    def get_unsup_transcript_i(self, i: int):
        self._sync_boundaries_to_host()
        return list(
            self.acoustic_model.components.get_assignments(
                self.utterances.get_segmented_embeds_i(i)
            )
        )

    def get_max_unsup_transcript_i(self, i: int):
        """Best components for utterance i's segments
        (reference kmeans_acoustic_wordseg.py:436-442)."""
        self._sync_boundaries_to_host()
        return self.acoustic_model.get_max_assignments(
            self.utterances.get_segmented_embeds_i(i)
        )

    def get_vec_embed_neg_len_sqrd_norms(self, vec_ids, durations) -> np.ndarray:
        """Duration-scaled best-component distances in the triangular layout
        (reference kmeans_acoustic_wordseg.py:334-351)."""
        vec_ids = np.asarray(vec_ids)
        durations = np.asarray(durations, dtype=float)
        out = np.full(len(vec_ids), -np.inf)
        valid = vec_ids != -1
        if valid.any():
            ids = jnp.asarray(vec_ids[valid].astype(int))
            scores = neg_sqrd_norms(
                self.acoustic_model.X[ids], self.acoustic_model.means()
            )
            out[valid] = np.asarray(jnp.max(scores, axis=-1))
        nan_dur = np.isnan(durations)
        out[nan_dur & valid] = -np.inf
        ok = valid & ~nan_dur
        out[ok] = out[ok] * durations[ok]
        return out + self.wip

    def segment_i(self, i: int) -> float:
        """Segment one utterance (reference ``segment_i``,
        kmeans_acoustic_wordseg.py:225-332)."""
        order = np.full((self.batch_size,), -1, dtype=np.int64)
        order[0] = i
        return self._run_blocks(order.reshape(1, -1))

    def segment(self, n_iter: int, n_iter_inbetween_kmeans: int = 0,
                monitor_i=None, validate: bool = False,
                segment_debug_only: bool = False) -> dict:
        """Segment all utterances, optionally interleaving k-means iterations
        (reference ``segment``, kmeans_acoustic_wordseg.py:353-425).

        ``monitor_i`` / ``validate``: per-sweep deep trace of one utterance
        and opt-in invariant checks (the reference's ``i_debug_monitor`` /
        NaN asserts; see ``utils/debug.py``).  ``segment_debug_only``:
        segment ONLY the monitored utterance each sweep (the reference's
        standing flag, kmeans_acoustic_wordseg.py:20; requires
        ``monitor_i``)."""
        from ..utils import debug as dbg

        if segment_debug_only:
            assert monitor_i is not None, \
                "segment_debug_only requires monitor_i"

        logger.info("Segmenting for " + str(n_iter) + " iterations")
        record = {k: [] for k in (
            "sum_neg_sqrd_norm", "sum_neg_len_sqrd_norm", "components",
            "sample_time", "n_tokens")}
        # Asynchronous record loop (one batched fetch at the end) unless
        # in-between k-means iterations force a sync each sweep.  Full
        # _WORDSEG_CHUNK-sized runs fuse into one dispatch with device-side
        # permutations (see segmenters/unigram.py); chunk entries'
        # sample_time is the chunk average.
        from .unigram import _WORDSEG_CHUNK

        use_chunks = (
            n_iter_inbetween_kmeans == 0 and monitor_i is None
            and not validate and getattr(self, "_mesh", None) is None
            and not getattr(self, "_shard_map_mode", False)
        )
        pending = []  # (t_dispatched, n_sweeps, None)
        pending_dev = []  # aligned (objective, metrics) device values
        pending_monitor = []
        pending_validate = []
        start = time.time()
        i_iter = 0
        while i_iter < n_iter:
            if use_chunks and n_iter - i_iter >= _WORDSEG_CHUNK:
                chunk = self._get_chunk_fn()
                am = self.acoustic_model
                self._key, sub = jax.random.split(self._key)
                am.state, self._boundaries_dev, objs, ms = chunk(
                    am.state, am.random_means, self._boundaries_dev, sub,
                )
                self._sweeps_since_resync += _WORDSEG_CHUNK
                if self._sweeps_since_resync >= _RESYNC_EVERY:
                    self._resync_stats()
                pending.append((time.time(), _WORDSEG_CHUNK, None))
                pending_dev.append((objs, ms))
                i_iter += _WORDSEG_CHUNK
                continue
            if segment_debug_only:
                order = np.asarray([int(monitor_i)], dtype=np.int64)
            else:
                order = self._rng.permutation(self.utterances.D)
            blocks = pad_utterance_order(order, self.batch_size)
            obj_dev = self._run_blocks_async(blocks)
            self._sweeps_since_resync += 1
            if self._sweeps_since_resync >= _RESYNC_EVERY:
                self._resync_stats()
            pending.append((time.time(), 1, None))
            pending_dev.append((obj_dev,
                                self.acoustic_model.sweep_metrics_device()))
            if monitor_i is not None:
                pending_monitor.append(self._monitor_device(int(monitor_i)))
            if validate:
                pending_validate.append(self._validate_device())
            if n_iter_inbetween_kmeans > 0:
                self.acoustic_model.fit(
                    n_iter_inbetween_kmeans, consider_unassigned=False
                )
            i_iter += 1
        if monitor_i is not None:
            dbg.log_monitor(logger, int(monitor_i),
                            jax.device_get(pending_monitor))
        if validate:
            dbg.check_validation(jax.device_get(pending_validate),
                                 dbg.KMEANS_CHECKS)
        fetched = jax.device_get(pending_dev)

        def append_one(rec, _aux, j, f):
            obj, (snn, k_act, n_tok) = f
            rec["sum_neg_sqrd_norm"].append(float(snn))
            rec["sum_neg_len_sqrd_norm"].append(float(obj))
            rec["components"].append(int(k_act))
            rec["n_tokens"].append(int(n_tok))

        from .common import drain_pending_record

        return drain_pending_record(record, pending, fetched, start,
                                    append_one, logger)

    # ------------------------------------------------------------ internals

    def _sync_boundaries_to_host(self):
        self.utterances.set_boundaries_from_device(self._boundaries_dev)

    def _resync_stats(self):
        """Exact counts/sum_x rebuild from the assignment vector, bounding
        the delta-update drift (enqueued async; no host sync).  A pure
        function of the replicated state, so it is valid in both the
        single-device and the shard_map sweeps."""
        if getattr(self, "_resync_fn", None) is None:
            am = self.acoustic_model
            X, K_max = am.X, am.K_max

            @jax.jit
            def resync(state):
                return kmeans_state_from_assignments(
                    X, state.assignments, K_max
                )

            self._resync_fn = resync
        self.acoustic_model.state = self._resync_fn(self.acoustic_model.state)
        self._sweeps_since_resync = 0

    def _monitor_device(self, i: int):
        """Enqueue (candidate neg-length-scaled distances, boundaries,
        argmax transcript) of utterance ``i`` (reference i_debug_monitor,
        kmeans_acoustic_wordseg.py:19, :269-287)."""
        if getattr(self, "_monitor_fn", None) is None:
            am = self.acoustic_model
            X = am.X
            utt = self.utterances
            N_max, W_store = utt.N_max, utt.W
            W_dp = (min(self.n_slices_max, N_max)
                    if self.n_slices_max > 0 else N_max)
            seg_ids_all, seg_durs_all = utt.seg_ids, utt.seg_durations
            lengths_all = utt.lengths_dev
            wip = self.wip

            def dp_slice(a):
                if W_store >= W_dp:
                    return a[..., :W_dp]
                pad = [(0, 0)] * (a.ndim - 1) + [(0, W_dp - W_store)]
                fill = -1 if jnp.issubdtype(a.dtype, jnp.integer) else jnp.nan
                return jnp.pad(a, pad, constant_values=fill)

            @jax.jit
            def monitor(state, random_means, boundaries, idx):
                idx1 = idx[None]
                lengths_blk = lengths_all[idx1]
                seg_ids_blk = seg_ids_all[idx1]
                means = means_from_state(state, random_means)
                cand_ids = dp_slice(seg_ids_blk).reshape(-1)
                best = jnp.max(
                    neg_sqrd_norms(X[jnp.maximum(cand_ids, 0)], means),
                    axis=-1,
                ).reshape(1, N_max, W_dp)
                durs = dp_slice(seg_durs_all[idx1]).astype(best.dtype)
                scores = best * jnp.where(jnp.isnan(durs), 0.0, durs) + wip
                invalid = (dp_slice(seg_ids_blk) < 0) | jnp.isnan(durs)
                scores = jnp.where(invalid, NEG_INF, scores)
                embeds, _ = gather_block_segments(
                    boundaries[idx1], lengths_blk, seg_ids_blk
                )
                ks = jnp.where(
                    embeds >= 0,
                    state.assignments[jnp.maximum(embeds, 0)], -1,
                )
                return scores[0], boundaries[idx], ks[0]

            self._monitor_fn = monitor
        am = self.acoustic_model
        return self._monitor_fn(am.state, am.random_means,
                                self._boundaries_dev, jnp.int32(i))

    def _validate_device(self):
        if getattr(self, "_validate_fn", None) is None:
            from ..utils import debug as dbg

            lengths_all = self.utterances.lengths_dev

            @jax.jit
            def validate(state, boundaries):
                return dbg.kmeans_validation_flags(state, boundaries,
                                                   lengths_all)

            self._validate_fn = validate
        return self._validate_fn(self.acoustic_model.state,
                                 self._boundaries_dev)

    def _run_blocks(self, blocks: np.ndarray) -> float:
        return float(self._run_blocks_async(blocks))

    def _run_blocks_async(self, blocks: np.ndarray):
        am = self.acoustic_model
        sweep = self._get_sweep_fn()
        self._key, sub = jax.random.split(self._key)
        from .common import place_blocks

        blocks_dev = place_blocks(blocks, getattr(self, "_mesh", None))
        am.state, self._boundaries_dev, obj = sweep(
            am.state, am.random_means, self._boundaries_dev, blocks_dev, sub,
        )
        return obj

    def _get_sweep_fn(self):
        if self._sweep_fn is None:
            self._sweep_fn = self._build_sweep_fn()
        return self._sweep_fn

    def _cand_table(self):
        """Sweep-static candidate slab, X only (``common.cand_tables``)."""
        return cand_tables(self.utterances, self.n_slices_max,
                           self.acoustic_model.X)[0]

    def _get_chunk_fn(self):
        if getattr(self, "_chunk_fn", None) is None:
            self._chunk_fn = self._build_chunk_fn()
        return self._chunk_fn

    def _build_chunk_fn(self):
        """Fused multi-sweep dispatch with device-side permutations and
        per-sweep metrics (cf. ``UnigramAcousticWordseg._build_chunk_fn``)."""
        from ..models.kmeans import sum_neg_sqrd_norm
        from .unigram import _WORDSEG_CHUNK

        block_step = self._make_block_step(
            self.batch_size, pallas=True, reduce_fn=lambda t: t,
            assign_table=True,
        )
        utt = self.utterances
        seg_ids_all = utt.seg_ids
        seg_durs_all = utt.seg_durations
        lengths_all = utt.lengths_dev
        am = self.acoustic_model
        X = am.X
        dtype = X.dtype
        N = X.shape[0]
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

        @jax.jit
        def chunk(state, random_means, boundaries, key, cand_X_all=None):
            # Compact slot-table carry across the chunk; the [N] vector is
            # materialized once at the end (see segmenters/unigram.py).
            embeds0, segs0 = gather_block_segments(
                boundaries, lengths_all, seg_ids_all
            )
            ks0 = jnp.where(embeds0 >= 0,
                            state.assignments[jnp.maximum(embeds0, 0)], -1)
            a_dtype = state.assignments.dtype
            state_t = state._replace(assignments=assign_rows_from_segments(
                segs0, ks0, W_dp, N_max * W_dp))

            def one_sweep(carry, _):
                state, boundaries, key = carry
                key, k_perm = jax.random.split(key)
                perm = jax.random.permutation(k_perm, U).astype(jnp.int32)
                blocks = jnp.concatenate(
                    [perm, jnp.full((pad,), -1, jnp.int32)]
                ).reshape(n_blocks, B)

                def f(c, idx_blk):
                    return block_step(
                        c, idx_blk, seg_ids_all, seg_durs_all, lengths_all,
                        random_means, cand_X_all=cand_X_all,
                    )

                init = (state, boundaries, key, jnp.zeros((), dtype))
                (state, boundaries, key, obj), _ = jax.lax.scan(
                    f, init, blocks
                )
                # The objective metric wants the [N] vector: one
                # materialize scatter per sweep (vs four merge scatters
                # before; the table stays the carry).
                a_vec = materialize_assignments(
                    state.assignments, seg_flat, N, a_dtype)
                m = (
                    sum_neg_sqrd_norm(
                        X, state._replace(assignments=a_vec), random_means),
                    jnp.sum((state.counts > 0).astype(jnp.int32)),
                    jnp.sum((a_vec >= 0).astype(jnp.int32)),
                )
                return (state, boundaries, key), (obj, m)

            (state_t2, boundaries, key), (objs, ms) = jax.lax.scan(
                one_sweep, (state_t, boundaries, key),
                None, length=_WORDSEG_CHUNK,
            )
            state_out = state_t2._replace(assignments=materialize_assignments(
                state_t2.assignments, seg_flat, N, a_dtype))
            return state_out, boundaries, objs, ms

        cand_X_all = self._cand_table()
        return lambda *args: chunk(*args, cand_X_all=cand_X_all)

    def _make_block_step(self, B: int, pallas: bool, reduce_fn,
                         assign_table: bool = False):
        """Per-block segmental k-means update, shared by the single-device
        sweep (``reduce_fn`` = identity) and the shard_map sweep
        (``reduce_fn`` = ``psum``); see
        ``UnigramAcousticWordseg._make_block_step`` (incl. the deferred
        once-per-sweep assignment-merge contract: returns ``(carry,
        updates)``, and the ``assign_table`` fused-chunk mode where
        ``state.assignments`` carries the compact [U, M] slot table and
        ``updates`` is None).  The component state crosses shards as
        additive count/moment deltas; the [N] assignment vector needs
        agreement only at sweep end."""
        am = self.acoustic_model
        X = am.X
        K_max = am.K_max
        utt = self.utterances
        N_max = utt.N_max
        W_store = utt.W
        W_dp = min(self.n_slices_max, N_max) if self.n_slices_max > 0 else N_max
        n_min = self.n_slices_min
        wip = self.wip

        def dp_slice(a):
            if W_store >= W_dp:
                return a[..., :W_dp]
            pad = [(0, 0)] * (a.ndim - 1) + [(0, W_dp - W_store)]
            fill = -1 if jnp.issubdtype(a.dtype, jnp.integer) else jnp.nan
            return jnp.pad(a, pad, constant_values=fill)

        def block_step(carry, idx_blk, seg_ids_all, seg_durs_all, lengths_all,
                       random_means, cand_X_all=None):
            state, boundaries, key, obj_total = carry
            valid = idx_blk >= 0
            idx = jnp.maximum(idx_blk, 0)
            lengths_blk = jnp.where(valid, lengths_all[idx], 0)
            seg_ids_blk = seg_ids_all[idx]
            seg_durs_blk = seg_durs_all[idx]
            bounds_blk = boundaries[idx]

            means = means_from_state(state, random_means)

            # Old segments (deleted only after the DP, reference :310-320).
            old_embeds, segs_old = gather_block_segments(
                bounds_blk, lengths_blk, seg_ids_blk
            )

            # Candidate scores: best-component distance x duration + wip
            # (kmeans_acoustic_wordseg.py:334-351; note the reference does
            # NOT apply time_power_term here, :349).
            # Sweep-static candidate tensor indexed as per-utterance
            # slabs when precomputed (see segmenters/unigram.py).
            if cand_X_all is None:
                cand_ids = dp_slice(seg_ids_blk).reshape(B * N_max * W_dp)
                Xc = X[jnp.maximum(cand_ids, 0)]
            else:
                Xc = cand_X_all[idx].reshape(B * N_max * W_dp, -1)
            # Segment rows pulled from the candidate slab (one-hot MXU
            # contraction, see common.slab_segment_rows).
            slab_ok = W_store == W_dp
            Xc_slab = Xc.reshape(B, N_max * W_dp, -1)
            if slab_ok:
                Xe_old, _ = slab_segment_rows(Xc_slab, None, segs_old, W_dp)
            else:
                Xe_old = None
            best = jnp.max(neg_sqrd_norms(Xc, means), axis=-1)
            best = best.reshape(B, N_max, W_dp)
            durs = dp_slice(seg_durs_blk).astype(best.dtype)
            scores = best * jnp.where(jnp.isnan(durs), 0.0, durs) + wip
            invalid = (dp_slice(seg_ids_blk) < 0) | jnp.isnan(durs)
            scores = jnp.where(invalid, NEG_INF, scores)

            # Viterbi segmentation (forward_backward_kmeans_viterbi,
            # kmeans_acoustic_wordseg.py:449-555).
            key, k_dp = jax.random.split(key)
            obj, new_bounds = dp_ops.segment_dp(
                scores, lengths_blk, k_dp, 0.0, 1.0,
                n_slices_min=n_min, n_slices_max=W_dp, mode="viterbi",
                use_pallas=None if pallas else False,
            )

            # Argmax re-assignment with the frozen means (:436-442).
            new_embeds, segs_new = gather_block_segments(
                new_bounds, lengths_blk, seg_ids_blk
            )
            if slab_ok:
                Xe_new, _ = slab_segment_rows(Xc_slab, None, segs_new, W_dp)
                Xn = Xe_new.reshape(-1, Xe_new.shape[-1])
            else:
                Xe_new = None
                Xn = X[jnp.maximum(new_embeds.reshape(-1), 0)]
            new_ks = jnp.argmax(neg_sqrd_norms(Xn, means), axis=-1)
            new_ks = new_ks.reshape(new_embeds.shape).astype(jnp.int32)
            new_ks = jnp.where(new_embeds >= 0, new_ks, -1)

            # Delta statistics update (additive, so it psums across shards
            # exactly like the stat deltas of the Gibbs drivers): rebuilding
            # from the full [N] assignment vector cost two segment-sums over
            # the whole corpus per block and dominated the sweep.  The [N]
            # assignment vector itself is NOT touched here: the sweep
            # builders apply one deferred merge per sweep (see
            # ``common.merge_assignments``).
            if assign_table:
                old_ks = select_assign_slots(state.assignments[idx],
                                             segs_old, W_dp)
                old_ks = jnp.where(old_embeds >= 0, old_ks, -1)
            else:
                old_ks = jnp.where(
                    old_embeds >= 0,
                    state.assignments[jnp.maximum(old_embeds, 0)], -1,
                )
            old_c = flat_contrib(X, old_embeds, old_ks, K_max, False, valid,
                                 rows=Xe_old)
            new_c = flat_contrib(X, new_embeds, new_ks, K_max, False, valid,
                                 rows=Xe_new)
            d_counts, d_sum_x = reduce_fn((
                new_c.counts - old_c.counts, new_c.sum_x - old_c.sum_x,
            ))
            idx_w = jnp.where(valid, idx, boundaries.shape[0])
            assignments = state.assignments
            if assign_table:
                rows_a = assign_rows_from_segments(
                    segs_new, new_ks, W_dp, N_max * W_dp
                )
                assignments = assignments.at[idx_w].set(rows_a, mode="drop")
            state = KMeansState(
                assignments=assignments,
                counts=state.counts + d_counts,
                sum_x=state.sum_x + d_sum_x,
            )

            boundaries = boundaries.at[idx_w].set(new_bounds, mode="drop")
            obj_total = obj_total + reduce_fn(
                jnp.sum(jnp.where(valid, obj, 0.0))
            )
            return ((state, boundaries, key, obj_total),
                    None if assign_table
                    else (valid, old_embeds, new_embeds, new_ks))

        return block_step

    def _build_sweep_fn(self):
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
        def sweep(state, random_means, boundaries, blocks, key,
                  cand_X_all=None):
            def f(carry, idx_blk):
                return block_step(
                    carry, idx_blk, seg_ids_all, seg_durs_all, lengths_all,
                    random_means, cand_X_all=cand_X_all,
                )

            init = (state, boundaries, key, jnp.zeros((), dtype))
            (state, boundaries, key, obj_total), updates = jax.lax.scan(
                f, init, blocks
            )
            state = state._replace(assignments=merge_sweep_assignments(
                state.assignments, updates, lambda t: t))
            return state, boundaries, obj_total

        if on_mesh:
            return sweep
        # Candidate tensor as an ARGUMENT, not a closed-over constant.
        cand_X_all = self._cand_table()
        return lambda *args: sweep(*args, cand_X_all=cand_X_all)


if __name__ == "__main__":  # smoke demo (reference kmeans_acoustic_wordseg.py:558-658)
    from segmentalist_tpu.demos import demo_kmeans_seg

    demo_kmeans_seg()
