"""Shared machinery for the blocked-Gibbs segmentation sweeps.

The reference processes utterances strictly one at a time
(``unigram_acoustic_wordseg.py:449-455``): remove utterance i's embeddings
from the acoustic model, score all its candidate segments, run the DP, then
re-assign the new segments sequentially.  The TPU-native sweep processes
utterances in *blocks* of size B:

  1. leave-one-utterance-out sufficient statistics for every utterance in the
     block (exact: global stats minus the utterance's own contribution);
  2. one batched embeddings x components scoring kernel for all candidate
     segments of all utterances in the block;
  3. the batched DP (``ops/dp.py``) over the block;
  4. per-utterance sequential assignment chains (vmapped scan) that update the
     utterance's own statistics as segments are added -- matching the
     reference's ``gibbs_sample_inside_loop_i`` conditioning;
  5. merge: global stats += (new - old) utterance contributions.

With B = 1 this is semantically the reference chain; with B > 1 utterances
within a block condition on the same snapshot (blocked Gibbs), which is the
documented distributional-parity tradeoff (SURVEY.md section 7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.random import NEG_INF
from ..ops.stats import SuffStats, item_sq

Array = jnp.ndarray


def sym_pack_indices(D: int):
    """Static index maps for symmetric [D, D] <-> packed D(D+1)/2 layouts:
    ``(iu0, iu1)`` upper-triangle coordinates, plus the flat [D*D] gather map
    that unpacks (mirror-aware, a pure copy -- no arithmetic).  Second-moment
    tensors are symmetric with bitwise-equal triangles (the (d, e) and (e, d)
    sums contract identical commuted products in the same order), so packing
    their contractions to D(D+1)/2 lanes skips the redundant lower triangle:
    1.86x fewer MACs at D=13, exactly the same values."""
    iu0, iu1 = np.triu_indices(D)
    unpack = np.zeros((D, D), np.int32)
    unpack[iu0, iu1] = np.arange(iu0.size)
    unpack[iu1, iu0] = np.arange(iu0.size)
    return iu0, iu1, unpack.reshape(-1)


# ---------------------------------------------------------------------------#
#                  segmentation queries (device, batched)                     #
# ---------------------------------------------------------------------------#

class Segments(NamedTuple):
    """Compacted per-utterance segment lists (padded with -1 / 0).

    ends [B, S]   landmark index at which each segment ends (-1 pad)
    ws   [B, S]   segment length - 1
    n    [B]      number of segments
    """

    ends: Array
    ws: Array
    n: Array


def segments_from_boundaries(boundaries: Array, lengths: Array) -> Segments:
    """Decode the boundary matrix into ordered segment (end, length) pairs.

    Device equivalent of the reference ``get_segmented_landmark_indices``
    (``utterances.py:206-216``).  Fully parallel AND scatter-free: the
    position of the (s+1)-th boundary equals ``#{t : csum[t] <= s}``
    (``csum`` is nondecreasing), a comparison-sum over a [B, S, T] bool
    tensor.  TPU scatters serialize per index and this decode runs inside
    every block step's sweep scan, so the comparison-sum form is ~10x
    cheaper in-context (round-3 measurement, PERFORMANCE.md).
    """
    B, N_max = boundaries.shape
    t_grid = jnp.arange(N_max, dtype=jnp.int32)[None, :]
    is_b = boundaries & (t_grid < lengths[:, None])
    csum = jnp.cumsum(is_b.astype(jnp.int32), axis=1)
    n = csum[:, -1] if N_max > 0 else jnp.zeros((B,), jnp.int32)
    s_grid = jnp.arange(N_max, dtype=jnp.int32)
    # p[b, s] = #{t : csum[b, t] <= s} = position of the (s+1)-th boundary
    # (== N_max when there is none, masked to -1 below).
    p = jnp.sum(
        (csum[:, None, :] <= s_grid[None, :, None]).astype(jnp.int32),
        axis=2,
    )
    ends = jnp.where(s_grid[None, :] < n[:, None], p, -1)
    prev_ends = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), ends[:, :-1]], axis=1
    )
    ws = jnp.where(ends >= 0, ends - prev_ends - 1, 0)
    return Segments(ends=ends, ws=ws, n=n)


def gather_segment_embeds(segments: Segments, seg_ids: Array) -> Array:
    """[B, S] embedding row ids of the segments; -1 for pads and for spans
    longer than the stored window (the reference's 'pseudo-embeddings',
    ``unigram_acoustic_wordseg.py:339-342``)."""
    W = seg_ids.shape[-1]
    ends = jnp.maximum(segments.ends, 0)
    ws = jnp.minimum(segments.ws, W - 1)
    ids = _gather2(seg_ids, ends, ws)
    valid = (segments.ends >= 0) & (segments.ws < W)
    return jnp.where(valid, ids, -1)


def _gather2(seg_ids: Array, ends: Array, ws: Array) -> Array:
    """seg_ids[b, ends[b, s], ws[b, s]] for every (b, s).

    Ridden as a one-hot MXU contraction over the (small) landmark axis plus
    an elementwise one-hot sum over the window axis, not an element gather:
    TPU element gathers are latency-bound and this runs inside the sweep
    scan (round-3 measurement, PERFORMANCE.md).  HIGHEST precision keeps
    the f32 passes exact for integer ids (< 2^24); bf16 MXU passes would
    quantize them.
    """
    B, T, W = seg_ids.shape
    oh_t = jax.nn.one_hot(ends, T, dtype=jnp.float32)  # [B, S, T]
    rows = jax.lax.dot_general(
        oh_t, seg_ids.astype(jnp.float32),
        (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, S, W]
    oh_w = jax.nn.one_hot(ws, W, dtype=jnp.float32)  # [B, S, W]
    return jnp.sum(rows * oh_w, axis=2).astype(jnp.int32)


def gather_block_segments(boundaries_blk, lengths_blk, seg_ids_blk):
    """Current segmentation of a block: (embed ids [B, S], segments)."""
    segs = segments_from_boundaries(boundaries_blk, lengths_blk)
    embeds = gather_segment_embeds(segs, seg_ids_blk)
    return embeds, segs


def slab_segment_rows(cand_X: Array, cand_lp: Array, segs: Segments,
                      W_dp: int):
    """Embedding rows / prior log-densities of a block's segments, pulled
    from the slab-resident candidate tensors (``_cand_tables``) by one-hot
    MXU contraction instead of a tiny-row ``X[embeds]`` gather (such gathers
    are latency-bound inside the sweep scan; round-3 measurement,
    PERFORMANCE.md).

    Valid only when every stored segment fits the DP window (callers gate on
    ``W_store == W_dp``: the DP never samples a span longer than W_dp, and
    spans longer than W_store have no embedding row at all).  Rows of
    invalid slots (``segs.ends < 0`` or pads) are garbage exactly like the
    clamped-gather path's ``X[0]`` rows; every consumer masks on
    ``embeds >= 0``.  HIGHEST precision makes the f32 one-hot passes exact
    row copies.
    """
    B, M, D = cand_X.shape
    t = jnp.maximum(segs.ends, 0)
    w = jnp.clip(segs.ws, 0, W_dp - 1)
    oh = jax.nn.one_hot(t * W_dp + w, M, dtype=cand_X.dtype)  # [B, S, M]
    Xe = jax.lax.dot_general(
        oh, cand_X, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, S, D]
    if cand_lp is None:
        return Xe, None
    lpe = jnp.einsum("bsm,bm->bs", oh, cand_lp,
                     precision=jax.lax.Precision.HIGHEST)
    return Xe, lpe


# ---------------------------------------------------------------------------#
#                 per-utterance statistic contributions                       #
# ---------------------------------------------------------------------------#

def utterance_contrib(X: Array, embeds: Array, ks: Array, K_max: int,
                      full_cov: bool, rows: Array | None = None) -> SuffStats:
    """Per-utterance sufficient-statistic contribution [B, K, ...].

    ``embeds`` [B, S] (-1 pads) with component assignments ``ks`` [B, S]
    (entries with embed == -1 or k == -1 contribute nothing).  ``rows``
    ([B, S, D]) supplies the embedding rows directly (see ``flat_contrib``).

    The moment sums ride the SAME HIGHEST-precision ``bsd,bsk->bdk`` one-hot
    einsum as :func:`leave_out_moments_T` (transposed afterwards -- a pure
    relayout, no arithmetic), so the XLA-fallback/mesh path and the fused
    Pallas path build bit-identical leave-out statistics: a ``segment_sum``
    here would sum in a different order and could flip near-tied chain
    argmaxes across backends (round-4 advisor finding).  One-hot matmuls are
    also the faster form on TPU (scatter-adds serialize per index).
    """
    valid = (embeds >= 0) & (ks >= 0)
    x = X[jnp.maximum(embeds, 0)] if rows is None else rows
    x = jnp.where(valid[:, :, None], x, 0.0)
    oh = jnp.where(
        valid[:, :, None],
        jax.nn.one_hot(jnp.maximum(ks, 0), K_max, dtype=x.dtype),
        0.0,
    )  # [B, S, K]
    # Exact: <= S ones per (b, k) lane, integer-valued f32 sums.
    counts = jnp.sum(oh, axis=1).astype(jnp.int32)
    sum_x = jnp.swapaxes(
        jnp.einsum("bsd,bsk->bdk", x, oh,
                   precision=jax.lax.Precision.HIGHEST), 1, 2)
    if full_cov:
        # Symmetric-packed second moments (see sym_pack_indices).
        D = x.shape[-1]
        iu0, iu1, unpack = sym_pack_indices(D)
        sqp = x[..., iu0] * x[..., iu1]  # [B, S, D(D+1)/2]
        packed = jnp.einsum("bsk,bsf->bkf", oh, sqp,
                            precision=jax.lax.Precision.HIGHEST)
        sum_sq = packed[..., unpack].reshape(
            packed.shape[:2] + (D, D))
    else:
        sum_sq = jnp.swapaxes(
            jnp.einsum("bsd,bsk->bdk", x * x, oh,
                       precision=jax.lax.Precision.HIGHEST), 1, 2)
    return SuffStats(counts=counts, sum_x=sum_x, sum_sq=sum_sq)


def leave_out_stats(global_stats: SuffStats, contrib: SuffStats) -> SuffStats:
    """Global statistics with each utterance's own contribution removed."""
    return SuffStats(
        counts=global_stats.counts[None] - contrib.counts,
        sum_x=global_stats.sum_x[None] - contrib.sum_x,
        sum_sq=global_stats.sum_sq[None] - contrib.sum_sq,
    )


def leave_out_moments_T(stats: SuffStats, X: Array, embeds: Array, ks: Array,
                        K_max: int, with_sq: bool, rows: Array | None = None):
    """Leave-one-utterance-out moment sums in FEATURE-MAJOR layout:
    ``sum_xT`` (and optionally per-dim ``sum_sqT``) as [B, D, K].

    Same math as ``leave_out_stats(stats, utterance_contrib(...))`` restricted
    to the moment tensors, but contracted directly into the [D, K] orientation
    the fused scoring kernels' VMEM tables use (features on sublanes,
    components on lanes) -- deriving predictive parameters from THESE via
    ``predictive_params_T`` lets XLA skip the [B, K, D] -> [B, D, K] relayout
    copies a post-hoc ``swapaxes`` forces (~0.5 ms/sweep at flagship scale;
    the [B, K, ...] form is still built separately for the assignment-chain
    kernels, whose tables are component-major).

    HIGHEST precision: exact f32 sums, matching the scatter-free stat rule
    (CLAUDE.md) -- only the ADDITION ORDER differs from ``segment_sum``, so
    values may differ in the last ulp when an utterance has multiple segments
    in one component.
    """
    valid = (embeds >= 0) & (ks >= 0)
    x = X[jnp.maximum(embeds, 0)] if rows is None else rows
    x = jnp.where(valid[:, :, None], x, 0.0)
    oh = jnp.where(
        valid[:, :, None],
        jax.nn.one_hot(jnp.maximum(ks, 0), K_max, dtype=x.dtype),
        0.0,
    )  # [B, S, K]
    contrib_xT = jnp.einsum("bsd,bsk->bdk", x, oh,
                            precision=jax.lax.Precision.HIGHEST)
    sum_xT = stats.sum_x.T[None] - contrib_xT
    if not with_sq:
        return sum_xT, None
    contrib_sqT = jnp.einsum("bsd,bsk->bdk", x * x, oh,
                             precision=jax.lax.Precision.HIGHEST)
    sum_sqT = stats.sum_sq.T[None] - contrib_sqT
    return sum_xT, sum_sqT


def flat_contrib(X: Array, embeds: Array, ks: Array, K_max: int,
                 full_cov: bool, valid: Array,
                 rows: Array | None = None) -> SuffStats:
    """Summed sufficient-statistic contribution of all (utterance, segment)
    pairs in a block, as one-hot MXU matmuls: TPU scatter-adds serialize per
    index (~35 us each at block scale, 6 per block), while the [items, K]
    one-hot contraction is a trivial matmul.  HIGHEST precision: these sums
    feed the global statistics whose leave-out subtractions drive
    argmax-sensitive scores (see CLAUDE.md).

    ``rows`` ([B, S, D], e.g. from ``slab_segment_rows``) supplies the
    segment embedding rows directly, skipping the latency-bound tiny-row
    ``X[embeds]`` gather; values at masked slots are ignored either way.
    """
    ok = (embeds >= 0) & (ks >= 0) & valid[:, None]
    seg = jnp.where(ok, ks, K_max).reshape(-1)
    if rows is not None:
        x = rows.reshape(-1, rows.shape[-1])
    else:
        x = X[jnp.maximum(embeds, 0).reshape(-1)]
    x = jnp.where(ok.reshape(-1)[:, None], x, 0.0)
    oh = (seg[:, None] == jnp.arange(K_max, dtype=seg.dtype)[None, :]
          ).astype(x.dtype)  # [B*S, K]; pad rows (seg == K_max) are all-zero
    counts = jnp.sum(oh, axis=0).astype(jnp.int32)
    sum_x = jnp.matmul(oh.T, x, precision=jax.lax.Precision.HIGHEST)
    if full_cov:
        # Symmetric-packed second moments (see sym_pack_indices).
        D = x.shape[-1]
        iu0, iu1, unpack = sym_pack_indices(D)
        sqp = x[:, iu0] * x[:, iu1]  # [B*S, D(D+1)/2]
        packed = jnp.matmul(oh.T, sqp,
                            precision=jax.lax.Precision.HIGHEST)
        sum_sq = packed[:, unpack].reshape(K_max, D, D)
    else:
        sq = item_sq(x, full_cov)
        sum_sq = jnp.matmul(
            oh.T, sq.reshape(sq.shape[0], -1),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape((K_max,) + sq.shape[1:])
    return SuffStats(counts=counts, sum_x=sum_x, sum_sq=sum_sq)


def merge_flat(global_stats: SuffStats, old_flat: SuffStats,
               new_flat: SuffStats) -> SuffStats:
    """global += new_flat - old_flat (both flat [K, ...] block sums).

    Keeping both sides flat (``flat_contrib``) means the *per-utterance*
    [B, K, ...] contribution tensors feed only the leave-one-out statistics;
    components of those tensors that the covariance backend never reads
    (e.g. ``sum_sq`` for fixed-variance scoring) are then dead code that XLA
    eliminates entirely.
    """
    return SuffStats(
        counts=(global_stats.counts + new_flat.counts
                - old_flat.counts).astype(global_stats.counts.dtype),
        sum_x=global_stats.sum_x + new_flat.sum_x - old_flat.sum_x,
        sum_sq=global_stats.sum_sq + new_flat.sum_sq - old_flat.sum_sq,
    )


def merge_contribs(global_stats: SuffStats, old: SuffStats, new: SuffStats,
                   valid: Array) -> SuffStats:
    """global += sum_b valid_b * (new_b - old_b)."""
    v = valid.astype(global_stats.sum_x.dtype)
    vi = valid.astype(jnp.int32)

    def d(new_a, old_a, w):
        delta = (new_a - old_a) * w.reshape((-1,) + (1,) * (new_a.ndim - 1))
        return jnp.sum(delta, axis=0)

    # jnp.sum promotes int32 -> int64 under x64; pin the counts dtype.
    return SuffStats(
        counts=(global_stats.counts
                + d(new.counts, old.counts, vi)).astype(global_stats.counts.dtype),
        sum_x=global_stats.sum_x + d(new.sum_x, old.sum_x, v),
        sum_sq=global_stats.sum_sq + d(new.sum_sq, old.sum_sq, v),
    )


def merge_assignments(assignments: Array, valid: Array, old_embeds: Array,
                      new_embeds: Array, new_ks: Array, reduce_fn) -> Array:
    """Merge assignment updates into the global vector, ONCE PER SWEEP.

    Updates are disjoint across utterances (each embedding row belongs to
    exactly one), so a mask/value pair scattered with an out-of-bounds
    sentinel + ``mode="drop"`` merges exactly -- locally and, psum'ed by
    ``reduce_fn``, across shard_map shards (every shard ends the sweep
    with identical replicated state).  Old segments clear to -1 first;
    new segments overwrite, so same-utterance overlap resolves new-wins
    (the two scatters are applied in that order to the same value vector).

    Called once per SWEEP with every block's updates flattened together
    (round 5): within a sweep each utterance is resampled exactly once (the
    blocks partition a permutation), so no block ever reads an assignment
    row another block of the same sweep wrote -- deferring the merge is
    exact, removes four latency-bound [N] scatters per BLOCK (~0.5 ms/sweep
    at flagship scale, the largest residual item of the round-4 profile),
    and cuts the shard_map path's cross-chip [N] traffic from quadratic in
    corpus size to linear (PERFORMANCE.md, "Multi-chip communication
    budget").  Callers that sample one utterance repeatedly
    (``gibbs_sample_i``, ``debug_gibbs_only``) still merge every sweep.

    Re-implements the reference's per-utterance del/assign pairs
    (unigram_acoustic_wordseg.py:270-273, :339-349) as batched scatters.
    """
    vmask = valid[:, None]
    oob = assignments.shape[0]
    mask = jnp.zeros((oob,), jnp.int32)
    val = jnp.zeros((oob,), jnp.int32)
    old_flat = jnp.where(
        vmask & (old_embeds >= 0), old_embeds, oob
    ).reshape(-1)
    mask = mask.at[old_flat].set(1, mode="drop")
    val = val.at[old_flat].set(-1, mode="drop")
    new_flat = jnp.where(
        vmask & (new_embeds >= 0), new_embeds, oob
    ).reshape(-1)
    mask = mask.at[new_flat].set(1, mode="drop")
    val = val.at[new_flat].set(
        new_ks.reshape(-1).astype(jnp.int32), mode="drop"
    )
    mask, val = reduce_fn((mask, val))
    return jnp.where(mask > 0, val, assignments)


# ---------------------------------------------------------------------------#
#                         candidate segment scoring                           #
# ---------------------------------------------------------------------------#

def _slot_ids(segs: Segments, W_dp: int):
    """Candidate-slab slot index (end * W_dp + w) of each segment, plus its
    validity (real segment AND within the DP window -- slots for wider
    spans do not exist, matching ``gather_segment_embeds``)."""
    valid = (segs.ends >= 0) & (segs.ws < W_dp)
    slots = jnp.maximum(segs.ends, 0) * W_dp + jnp.clip(segs.ws, 0, W_dp - 1)
    return slots, valid


def assign_rows_from_segments(segs: Segments, ks: Array, W_dp: int,
                              M: int) -> Array:
    """[B, M] per-utterance slot-assignment rows (-1 = no segment at slot).

    The compact dual of the [N] assignment vector restricted to one
    utterance: row[slot(end, w)] = component of the segment ending at
    ``end`` with width ``w`` in the CURRENT segmentation, -1 elsewhere.
    Built scatter-free (one-hot einsum; values < 2^24 so HIGHEST f32
    passes are exact).  Rebuilding the row from scratch each update
    implicitly clears the old segmentation's slots -- the same semantics
    as ``merge_assignments``'s clear-then-set scatters without touching
    the [N] vector (TPU scatters are element-rate-bound, ~6 ns/element:
    the four [N] scatters cost ~0.5 ms/sweep at flagship scale).
    """
    slots, valid = _slot_ids(segs, W_dp)
    dtype = jnp.float32
    oh = jax.nn.one_hot(slots, M, dtype=dtype) * valid[..., None].astype(dtype)
    vals = jnp.where(valid, ks + 1, 0).astype(dtype)
    row = jnp.einsum("bsm,bs->bm", oh, vals,
                     precision=jax.lax.Precision.HIGHEST)
    return row.astype(jnp.int32) - 1


def select_assign_slots(rows: Array, segs: Segments, W_dp: int) -> Array:
    """[B, S] component of each segment, read from per-utterance slot rows
    (the compact inverse of ``assignments[gather_segment_embeds(...)]``)."""
    slots, valid = _slot_ids(segs, W_dp)
    dtype = jnp.float32
    oh = jax.nn.one_hot(slots, rows.shape[-1], dtype=dtype) \
        * valid[..., None].astype(dtype)
    sel = jnp.einsum("bsm,bm->bs", oh, (rows + 1).astype(dtype),
                     precision=jax.lax.Precision.HIGHEST)
    return sel.astype(jnp.int32) - 1


def materialize_assignments(A: Array, seg_ids_flat: Array, N: int,
                            dtype=jnp.int32) -> Array:
    """[N] assignment vector from the per-utterance slot table ``A``
    ([U, M], -1 = empty) and the matching flat candidate-id table
    ([U, M], -1 = no stored span).

    Exact under the sweep invariant the validators check
    (``utils/debug.py``): only embeddings of the CURRENT segmentation are
    assigned, so the vector IS "A's valid slots, -1 elsewhere".  One
    scatter per fused chunk instead of four per sweep."""
    ids = jnp.where(seg_ids_flat >= 0, seg_ids_flat, N).reshape(-1)
    return jnp.full((N,), -1, dtype).at[ids].set(
        A.reshape(-1).astype(dtype), mode="drop")


def merge_sweep_assignments(assignments: Array, updates, reduce_fn) -> Array:
    """Apply one sweep's stacked per-block assignment updates (the block-
    step scan's ys) in one :func:`merge_assignments` call.

    ``updates`` = (valid [nb, B], old_embeds / new_embeds / new_ks
    [nb, B, S]).  Blocks within a sweep touch disjoint utterances, so
    flattening them into one scatter pair is exact (see
    :func:`merge_assignments`).
    """
    valid, old_e, new_e, ks = updates
    S = old_e.shape[-1]
    return merge_assignments(
        assignments, valid.reshape(-1), old_e.reshape(-1, S),
        new_e.reshape(-1, S), ks.reshape(-1, S), reduce_fn)


def decollide_new_components(new_ks: Array, new_mask: Array,
                             lo_counts: Array, counts0: Array,
                             axis_name=None) -> Array:
    """Relabel cross-utterance collisions on NEWLY-CREATED components onto
    fresh empty slots.

    Blocked-mode semantics: every utterance in a block conditions on the
    block-start state; its chain treats any slot with leave-out count 0 as
    "a new component".  Because all chains draw from the SAME pool of empty
    slot labels, independent new-component choices collide at merge time
    and unrelated segments from different utterances get silently fused
    into one component.  At bench-like scale this is a merge trap: with
    fixed (non-adaptive) covariance the spurious fusions cannot dissolve
    and the sampler plateaus far from the sequential chain's posterior
    (B=125 on a 200-utterance corpus: log_marg -210k vs -20k, active
    components DECREASING; ``benchmarks/blocked_equivalence.py``).  The
    reference's sampler is purely sequential (one utterance at a time,
    ``unigram_acoustic_wordseg.py:449-455``) so it never faces this.

    Empty components are exchangeable — every empty slot enters the
    conditional with identical weight alpha/K (``fbgmm.py:256-286``) — so
    relabeling a chain's new-component group onto a different empty slot
    leaves its per-utterance conditional unchanged.  This post-pass picks,
    per slot k, at most ONE owner and moves every other creator's group to
    its own fresh slot (globally empty at block start and untouched this
    block), restoring the blocked conditioning's actual semantics: distinct
    "new" decisions produce distinct components.  Deterministic, O(B*K),
    no kernel changes — chains themselves are untouched.

    A slot k is "created" by row b when the row assigned segments to k and
    its leave-out count was 0.  Only one row can zero a non-empty slot (its
    own old segments were all of k), so creators of occupied slots never
    collide with each other — but they do collide with rows that JOINED the
    old k deliberately; in that case the creator moves and the joiners keep
    k.  If fresh slots run out (model near saturation, where the reference
    would also reuse components), the remaining groups stay merged.

    ``new_mask`` marks live (segment, row) entries; dead/padded rows must be
    masked out.  Under ``shard_map`` pass ``axis_name``: rows are sharded,
    and collisions across shards are resolved from an all-gathered [B, K]
    touch-code matrix (int8 — ~B*K bytes per block over ICI), every shard
    computing the identical global remap and slicing its own rows.
    """
    # Everything below is gathers-free by design: a naive [B*K]-element
    # table gather for the relocation targets measured 4.8 ms/sweep at
    # flagship scale (element-rate bound -- the standing tiny-gather trap,
    # PERFORMANCE.md); instead the per-(row, slot) tables stay [B, K]
    # VPU-elementwise + short cumsums, and the per-SEGMENT lookups ride
    # exact one-hot einsums (HIGHEST: integer values up to B*K must not
    # go through bf16 MXU passes).
    B_loc, K = new_ks.shape[0], lo_counts.shape[-1]
    hi = jax.lax.Precision.HIGHEST
    mask = new_mask & (new_ks >= 0)
    touch = (new_ks[..., None] == jnp.arange(K)) & mask[..., None]
    touched = jnp.any(touch, axis=1)                       # [B_loc, K]
    creator = touched & (lo_counts == 0)
    code = touched.astype(jnp.int8) + creator.astype(jnp.int8)
    if axis_name is not None:
        code_g = jax.lax.all_gather(code, axis_name)       # [n, B_loc, K]
        code_g = code_g.reshape(-1, K)
        row0 = jax.lax.axis_index(axis_name) * B_loc
    else:
        code_g = code
        row0 = 0
    touched_g, creator_g = code_g >= 1, code_g == 2
    joiner_any = jnp.any(touched_g & ~creator_g, axis=0)   # [K]
    crank = jnp.cumsum(creator_g, axis=0) - creator_g      # rank among creators
    keep = creator_g & (crank == 0) & ~joiner_any[None, :]
    need = creator_g & ~keep                               # relocate these
    fresh = (counts0 == 0) & ~jnp.any(touched_g, axis=0)   # [K]
    n_fresh = jnp.sum(fresh)
    # Global relocation rank: k-major (per-slot exclusive offsets + rank
    # among the slot's own needs) -- any fixed deterministic order works,
    # and this one needs only a [K] cumsum and the [B, K] column cumsum.
    offs = jnp.cumsum(need.sum(axis=0)) - need.sum(axis=0)     # [K]
    # Rank among the slot's needs = rank among its creators minus one when
    # the rank-0 creator kept the slot -- no second [B, K] column cumsum
    # (each costs ~0.08 ms/sweep as a reduce-window at flagship scale).
    kept_any = jnp.any(keep, axis=0)                           # [K]
    nrank = crank - kept_any[None, :].astype(crank.dtype)
    need_idx = offs[None, :] + nrank                           # [B, K]
    # j-th fresh slot id via one-hot contraction (argsort-free).
    fresh_rank = jnp.cumsum(fresh) - fresh                     # [K]
    oh_fresh = (fresh_rank[None, :] == jnp.arange(K)[:, None]) & fresh[None]
    fresh_order = jnp.einsum("jk,k->j", oh_fresh.astype(jnp.float32),
                             jnp.arange(K, dtype=jnp.float32), precision=hi)
    if axis_name is not None:
        sl = lambda t: jax.lax.dynamic_slice_in_dim(t, row0, B_loc, axis=0)
        need, need_idx = sl(need), sl(need_idx)
    # Per-segment lookups from the [B, K] tables: exact one-hot einsums on
    # the already-built [B, S, K] touch mask (no element gathers).
    tf = touch.astype(jnp.float32)
    need_bs = jnp.einsum("bsk,bk->bs", tf, need.astype(jnp.float32),
                         precision=hi) > 0.5
    idx_bs = jnp.einsum("bsk,bk->bs", tf, need_idx.astype(jnp.float32),
                        precision=hi)
    idx_i = jnp.minimum(idx_bs, float(K - 1)).astype(jnp.int32)
    oh_idx = (idx_i[..., None] == jnp.arange(K)).astype(jnp.float32)
    tgt_bs = jnp.einsum("bsk,k->bs", oh_idx, fresh_order, precision=hi)
    ok = need_bs & (idx_bs < n_fresh.astype(idx_bs.dtype)) & mask
    return jnp.where(ok, tgt_bs.astype(new_ks.dtype), new_ks)


def masked_candidate_scores(log_margs: Array, seg_ids_blk: Array,
                            seg_durs_blk: Array, time_power_term,
                            wip) -> Array:
    """Apply the reference's duration scaling and masking to raw candidate
    log marginals (``get_vec_embed_log_probs``,
    ``unigram_acoustic_wordseg.py:474-511``).

    scores = log_marg * duration ** time_power_term + wip, with -inf for
    missing embeddings and NaN (masked) durations.
    """
    durs = seg_durs_blk.astype(log_margs.dtype)
    scale = jnp.where(jnp.isnan(durs), 0.0, durs) ** time_power_term
    scores = log_margs * scale + wip
    invalid = (seg_ids_blk < 0) | jnp.isnan(durs)
    return jnp.where(invalid, NEG_INF, scores)


def place_blocks(blocks, mesh, axis_name: str = "data"):
    """Shard a [n_blocks, B] utterance-index array over the mesh's data axis
    (dimension 1), so each device owns B/n utterances of every block."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        return blocks  # numpy; the jitted sweep transfers it with its args
    return jax.device_put(jnp.asarray(blocks),
                          NamedSharding(mesh, P(None, axis_name)))


def seed_assignments_to_vector(utterances, ids_to_utterance_labels,
                               seed_assignments_dict, assignments,
                               am_K):
    """Map per-utterance seed assignment labels onto the global embedding-row
    assignment vector (host-side init protocol; semantics must match the
    reference exactly: ``unigram_acoustic_wordseg.py:176-204``, duplicated at
    ``bigram_acoustic_wordseg.py``'s init).

    Integer seed labels keep their value; other labels are numbered by first
    appearance.  Mutates ``assignments`` in place and returns
    ``(seed_to_cluster, am_K)`` with ``am_K`` defaulted/validated against the
    largest cluster id as the reference does.
    """
    import numpy as np

    seed_to_cluster = {}
    i_cluster = 0
    for i_utt, utt in enumerate(ids_to_utterance_labels):
        utt_init_embeds = np.array(
            utterances.get_segmented_embeds_i(i_utt), dtype=int
        )
        utt_init_assignments = np.array(seed_assignments_dict[utt][:])
        utt_init_assignments = utt_init_assignments[utt_init_embeds != -1]
        utt_init_embeds = utt_init_embeds[utt_init_embeds != -1]
        for s in utt_init_assignments:
            if s not in seed_to_cluster:
                if isinstance(s, (int, np.integer)):
                    seed_to_cluster[s] = int(s)
                else:
                    seed_to_cluster[s] = i_cluster
                    i_cluster += 1
        assignments[utt_init_embeds] = [
            seed_to_cluster[s] for s in utt_init_assignments
        ]
    if am_K is None:
        am_K = max(seed_to_cluster.values()) + 1
    else:
        assert am_K >= max(seed_to_cluster.values()) + 1
    return seed_to_cluster, am_K


def drain_pending_record(record, pending, fetched, start, append_one,
                         logger):
    """Fan the end-of-run batched metric fetch out into the record dict.

    Shared by all three drivers so the pending-tuple protocol and the
    timing semantics live in ONE place.  ``pending`` holds
    ``(t_dispatched, n_sweeps, aux)`` per dispatch (``aux``: host-side
    extras, e.g. the chunk's temperatures); ``fetched`` aligns with it and
    holds the dispatch's fetched device values — a pytree whose leaves gain
    a leading sweep axis when ``n_sweeps > 1`` (the fused-chunk case).
    ``append_one(record, aux, j, fetched_j)`` appends one sweep's
    driver-specific keys; ``sample_time`` is appended here: each sweep in a
    fused chunk reports the chunk wall time divided evenly (documented
    averaged semantics), and the total wall time is folded into the last
    entry so the sum stays honest even when dispatch-side timestamps
    under-measure a device running behind.
    """
    import time

    prev_t = start
    i_iter = 0
    for (t_disp, n, aux), f in zip(pending, fetched):
        dt = (t_disp - prev_t) / n
        prev_t = t_disp
        for j in range(n):
            f_j = jax.tree.map(lambda a: a[j], f) if n > 1 else f
            record["sample_time"].append(dt)
            append_one(record, aux, j, f_j)
            info = "iteration: " + str(i_iter)
            for k in sorted(record):
                info += ", " + k + ": " + str(record[k][-1])
            logger.info(info)
            i_iter += 1
    total = time.time() - start
    if record["sample_time"]:
        record["sample_time"][-1] += total - sum(record["sample_time"])
    return record


def cand_tables(utterances, n_slices_max: int, X, log_prior_vec=None):
    """Sweep-static candidate slab tensors ``X[seg_ids]`` (and, when given,
    ``log_prior_vec[seg_ids]``), shaped [U, N_max, W_dp, ...].

    Built once per sweep-builder and closed over / passed as jit arguments,
    so per-block candidate access is a contiguous slab index instead of a
    15k-tiny-row gather (round-3 stage attribution: ~2.5 ms/sweep of pure
    gather latency at flagship scale).  The stored window ``W_store`` is
    clamped to the DP window ``W_dp = min(n_slices_max, N_max)`` — spans the
    DP can never sample carry no slab rows — or -1-padded up to it when the
    data provides fewer stored spans than the DP may propose.  Rows at
    ``seg_ids == -1`` are clamped to row 0 (garbage); every consumer masks
    on the id sign, same convention as ``slab_segment_rows``.

    Shared by all three drivers (unigram / bigram / k-means) so the window
    clamp/pad logic cannot diverge between them.
    """
    N_max, W_store = utterances.N_max, utterances.W
    W_dp = min(n_slices_max, N_max) if n_slices_max > 0 else N_max
    seg = utterances.seg_ids
    if W_store >= W_dp:
        seg = seg[..., :W_dp]
    else:
        seg = jnp.pad(seg, ((0, 0), (0, 0), (0, W_dp - W_store)),
                      constant_values=-1)
    # Stored flat as [U, N_max * W_dp(, D)] -- the exact layout the scoring
    # kernels consume -- so the per-block pull is one row gather with NO
    # relayout/reshape copies behind it (the 4-D [U, N, W, D] form made XLA
    # pick a {1,3,2,0} table layout and pay two [B, M, D] copies per block,
    # ~0.15 ms/sweep at flagship scale; round-5 profile).
    ids = jnp.maximum(seg, 0)
    U = seg.shape[0]
    if log_prior_vec is None:
        return X[ids].reshape(U, N_max * W_dp, -1), None
    return (X[ids].reshape(U, N_max * W_dp, -1),
            log_prior_vec[ids].reshape(U, N_max * W_dp))


def pad_utterance_order(order, batch_size: int):
    """Pad a [U] permutation to a multiple of ``batch_size`` with -1.

    Pure numpy: this is per-sweep host-side prep, and eager device ops cost
    a full RPC round-trip each on a remote-attached TPU.
    """
    import numpy as np

    order = np.asarray(order)
    U = order.shape[0]
    n_blocks = -(-U // batch_size)
    pad = n_blocks * batch_size - U
    order = np.concatenate([order, np.full((pad,), -1, order.dtype)])
    return order.reshape(n_blocks, batch_size)
