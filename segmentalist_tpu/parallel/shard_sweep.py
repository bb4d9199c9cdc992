"""Explicit-collective (shard_map) multi-chip sweeps for ALL drivers.

The default multi-chip path (``parallel.mesh.shard_segmenter``) relies on
GSPMD: annotate shardings, let XLA insert the collectives.  That is exact
(bit-identical to single-device) but cannot partition ``pallas_call`` under
plain ``jit``, so the Pallas kernels fall back to XLA under a mesh.

This module provides the scale-out alternative for every segmenter family --
unigram FBGMM (fixed / diag / full-NIW covariance), bigram FBGMM + smooth LM,
and segmental k-means: the whole blocked-Gibbs block step runs *per shard*
under ``jax.shard_map`` -- Pallas kernels included -- and the cross-chip
interaction is a handful of ``psum`` collectives per block, riding ICI:

  * unigram:  flat sufficient-statistic deltas [K(,D[,D])] per block;
  * bigram:   the same, plus the LM count-table deltas ([K] + [K, K]) --
              counts are additive (reference leave-out/re-add semantics,
              ``bigram_acoustic_wordseg.py:410, :496``), so they ride the
              same reduction;
  * k-means:  additive count/moment deltas per block;
  * all:      ONE [N] assignment mask/value psum per SWEEP (deferred merge,
              ``common.merge_assignments`` -- within a sweep no shard reads
              a row another shard wrote, so per-block [N] psums were pure
              overhead and the quadratic-in-U traffic term).

The per-block math is the SAME code as the single-device sweep: each
segmenter's ``_make_block_step(B, pallas, reduce_fn)`` is instantiated here
with ``reduce_fn = psum`` and per-shard block size ``B/n``.

Semantics: each shard owns ``U/n`` utterances and resamples its own blocks
of ``B/n`` per step; utterances across shards condition on the same
statistics snapshot, exactly like utterances within a single-device block
(the documented blocked-Gibbs approximation, SURVEY.md section 7) -- so the
chain differs from the single-device one by block composition only, not by
model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..segmenters.common import merge_sweep_assignments


def shard_blocks(order: np.ndarray, n_shards: int, u_local: int,
                 batch_local: int) -> np.ndarray:
    """Per-shard block layout [n_blocks, n_shards, B/n] of LOCAL utterance
    indices (-1 pads), derived from a global permutation: each shard
    processes its own utterances in global-permutation order.

    Vectorised (this runs host-side EVERY sweep): a stable sort by shard id
    groups each shard's utterances in permutation order, and one scatter
    places them into the [n_blocks, n_shards, batch_local] grid."""
    order = np.asarray(order, dtype=np.int64).reshape(-1)
    order = order[order >= 0]  # -1 pads from pad_utterance_order
    shard = order // u_local
    local = order % u_local
    sort = np.argsort(shard, kind="stable")  # permutation order within shard
    shard, local = shard[sort], local[sort]
    # rank[i]: position of element i within its shard's list.
    first = np.r_[True, shard[1:] != shard[:-1]]
    start = np.maximum.accumulate(np.where(first, np.arange(len(shard)), 0))
    rank = np.arange(len(shard)) - start
    n_blocks = max(int(rank.max(initial=-1)) // batch_local + 1, 1)
    out = np.full((n_blocks, n_shards, batch_local), -1, dtype=np.int64)
    out[rank // batch_local, shard, rank % batch_local] = local
    return out


def _shard_map(body, mesh, in_specs, out_specs):
    try:
        smap = jax.shard_map
    except AttributeError:  # older jax
        from jax.experimental.shard_map import shard_map as smap
    # The DP/chain carries mix shard-invariant inits with varying updates;
    # replication checking would reject them.
    return jax.jit(smap(body, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False))


def _prep(seg, mesh):
    # shard_segmenter pads the utterance axis and rounds batch_size up to
    # mesh multiples, so both divide here by construction.
    n = mesh.devices.size
    U = seg.utterances.seg_ids.shape[0]
    assert U % n == 0 and seg.batch_size % n == 0, \
        "call parallel.mesh.shard_segmenter(seg, mesh) first"
    return n, U // n, seg.batch_size // n


def build_unigram_shard_sweep(seg, mesh: Mesh, axis: str = "data"):
    n, _, B_loc = _prep(seg, mesh)
    block_step = seg._make_block_step(
        B_loc, pallas=True, reduce_fn=lambda t: jax.lax.psum(t, axis),
        axis_name=axis,
    )
    dtype = seg.acoustic_model.X.dtype

    def shard_body(stats, assignments, boundaries_l, key, blocks_l,
                   seg_ids_l, seg_durs_l, lengths_l, anneal_temp,
                   assign_temp):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        blocks_l = blocks_l[:, 0, :]  # [n_blocks, 1, B/n] local view

        def f(carry, idx_blk):
            return block_step(carry, idx_blk, seg_ids_l, seg_durs_l,
                              lengths_l, anneal_temp, assign_temp)

        init = (stats, assignments, boundaries_l, key,
                jnp.zeros((), dtype))
        (stats, assignments, boundaries_l, key, lp), updates = jax.lax.scan(
            f, init, blocks_l
        )
        # Replicated outputs must be identical on every shard; the psum'ed
        # stats already are, the assignment updates merge here ONCE per
        # sweep (the [N] mask/value pair is the only per-[N] collective --
        # see PERFORMANCE.md "Multi-chip communication budget").
        assignments = merge_sweep_assignments(
            assignments, updates, lambda t: jax.lax.psum(t, axis)
        )
        key_out = jax.lax.all_gather(key, axis)[0]
        return stats, assignments, boundaries_l, key_out, lp

    sweep = _shard_map(
        shard_body, mesh,
        in_specs=(
            P(), P(), P(axis), P(),              # stats..key
            P(None, axis, None),                 # blocks [nb, n, B/n]
            P(axis), P(axis), P(axis),           # corpus tensors
            P(), P(),                            # scalars
        ),
        out_specs=(P(), P(), P(axis), P(), P()),
    )
    return sweep, n


def build_bigram_shard_sweep(seg, mesh: Mesh, assignments_only: bool,
                             axis: str = "data"):
    n, _, B_loc = _prep(seg, mesh)
    block_step = seg._make_block_step(
        B_loc, pallas=True, reduce_fn=lambda t: jax.lax.psum(t, axis),
        assignments_only=assignments_only, axis_name=axis,
    )
    dtype = seg.acoustic_model.X.dtype

    def shard_body(stats, assignments, boundaries_l, lm_state, key, blocks_l,
                   seg_ids_l, seg_durs_l, lengths_l, anneal_temp,
                   assign_temp):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        blocks_l = blocks_l[:, 0, :]

        def f(carry, idx_blk):
            return block_step(carry, idx_blk, seg_ids_l, seg_durs_l,
                              lengths_l, anneal_temp, assign_temp)

        init = (stats, assignments, boundaries_l, lm_state, key,
                jnp.zeros((), dtype))
        ((stats, assignments, boundaries_l, lm_state, key, lp),
         updates) = jax.lax.scan(f, init, blocks_l)
        assignments = merge_sweep_assignments(
            assignments, updates, lambda t: jax.lax.psum(t, axis)
        )
        key_out = jax.lax.all_gather(key, axis)[0]
        return stats, assignments, boundaries_l, lm_state, key_out, lp

    sweep = _shard_map(
        shard_body, mesh,
        in_specs=(
            P(), P(), P(axis), P(), P(),
            P(None, axis, None),
            P(axis), P(axis), P(axis),
            P(), P(),
        ),
        out_specs=(P(), P(), P(axis), P(), P(), P()),
    )
    return sweep, n


def build_kmeans_shard_sweep(seg, mesh: Mesh, axis: str = "data"):
    n, _, B_loc = _prep(seg, mesh)
    block_step = seg._make_block_step(
        B_loc, pallas=True, reduce_fn=lambda t: jax.lax.psum(t, axis)
    )
    dtype = seg.acoustic_model.X.dtype

    def shard_body(state, random_means, boundaries_l, blocks_l,
                   seg_ids_l, seg_durs_l, lengths_l, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        blocks_l = blocks_l[:, 0, :]

        def f(carry, idx_blk):
            return block_step(carry, idx_blk, seg_ids_l, seg_durs_l,
                              lengths_l, random_means)

        init = (state, boundaries_l, key, jnp.zeros((), dtype))
        (state, boundaries_l, key, obj), updates = jax.lax.scan(
            f, init, blocks_l)
        state = state._replace(assignments=merge_sweep_assignments(
            state.assignments, updates, lambda t: jax.lax.psum(t, axis)))
        return state, boundaries_l, obj

    sweep = _shard_map(
        shard_body, mesh,
        in_specs=(
            P(), P(), P(axis),
            P(None, axis, None),
            P(axis), P(axis), P(axis),
            P(),
        ),
        out_specs=(P(), P(axis), P()),
    )
    return sweep, n


def _place_blocks(blocks, mesh, axis):
    return jax.device_put(
        jnp.asarray(blocks), NamedSharding(mesh, P(None, axis, None))
    )


def use_shard_map_sweep(seg, mesh: Mesh, axis: str = "data"):
    """Switch a segmenter (unigram / bigram / k-means, any covariance type)
    to the explicit-collective shard_map sweep.  Complements
    ``shard_segmenter`` (which must be called first to place the corpus
    tensors on the mesh); mutates the segmenter in place and returns it."""
    from ..segmenters.bigram import BigramAcousticWordseg
    from ..segmenters.kmeans_seg import SegmentalKMeansWordseg
    from ..segmenters.unigram import UnigramAcousticWordseg

    utt = seg.utterances
    n = mesh.devices.size
    u_local = utt.seg_ids.shape[0] // n
    b_local = seg.batch_size // n

    if isinstance(seg, BigramAcousticWordseg):
        sweeps = {}

        def run_blocks_async(blocks_unused, anneal_temp, anneal_gibbs_am,
                             assignments_only):
            ao = bool(assignments_only)
            if ao not in sweeps:
                sweeps[ao], _ = build_bigram_shard_sweep(seg, mesh, ao, axis)
            am = seg.acoustic_model
            blocks = shard_blocks(
                np.asarray(blocks_unused).reshape(-1), n, u_local, b_local
            )
            assign_temp = anneal_temp if anneal_gibbs_am else 1.0
            (am.stats, am.assignments, seg._boundaries_dev, seg.lm.state,
             am.key, lp) = sweeps[ao](
                am.stats, am.assignments, seg._boundaries_dev, seg.lm.state,
                am.key, _place_blocks(blocks, mesh, axis),
                utt.seg_ids, utt.seg_durations, utt.lengths_dev,
                np.asarray(anneal_temp, am.X.dtype),
                np.asarray(assign_temp, am.X.dtype),
            )
            return lp

    elif isinstance(seg, SegmentalKMeansWordseg):
        sweep, _ = build_kmeans_shard_sweep(seg, mesh, axis)

        def run_blocks_async(blocks_unused):
            am = seg.acoustic_model
            blocks = shard_blocks(
                np.asarray(blocks_unused).reshape(-1), n, u_local, b_local
            )
            seg._key, sub = jax.random.split(seg._key)
            am.state, seg._boundaries_dev, obj = sweep(
                am.state, am.random_means, seg._boundaries_dev,
                _place_blocks(blocks, mesh, axis),
                utt.seg_ids, utt.seg_durations, utt.lengths_dev, sub,
            )
            return obj

    elif isinstance(seg, UnigramAcousticWordseg):
        sweep, _ = build_unigram_shard_sweep(seg, mesh, axis)

        def run_blocks_async(blocks_unused, anneal_temp, anneal_gibbs_am):
            am = seg.acoustic_model
            blocks = shard_blocks(
                np.asarray(blocks_unused).reshape(-1), n, u_local, b_local
            )
            assign_temp = anneal_temp if anneal_gibbs_am else 1.0
            (am.stats, am.assignments, seg._boundaries_dev, am.key, lp) = (
                sweep(
                    am.stats, am.assignments, seg._boundaries_dev, am.key,
                    _place_blocks(blocks, mesh, axis),
                    utt.seg_ids, utt.seg_durations, utt.lengths_dev,
                    np.asarray(anneal_temp, am.X.dtype),
                    np.asarray(assign_temp, am.X.dtype),
                )
            )
            return lp

    else:
        raise TypeError("unsupported segmenter type: %r" % type(seg))

    # The driver loop passes padded [n_blocks, B] blocks; we re-derive the
    # shard layout from the flattened permutation instead.
    seg._run_blocks_async = run_blocks_async
    seg._shard_map_mode = True
    return seg
