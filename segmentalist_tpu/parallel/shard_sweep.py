"""Explicit-collective (shard_map) multi-chip sweep for the unigram segmenter.

The default multi-chip path (``parallel.mesh.shard_segmenter``) relies on
GSPMD: annotate shardings, let XLA insert the collectives.  That is exact
(bit-identical to single-device) but cannot partition ``pallas_call`` under
plain ``jit``, so the Pallas kernels fall back to XLA under a mesh.

This module provides the scale-out alternative: the whole blocked-Gibbs
block step runs *per shard* under ``jax.shard_map`` — Pallas kernels
included — and the cross-chip interaction is exactly two collectives per
block, riding ICI:

  * ``psum`` of the flat sufficient-statistic deltas (the model update);
  * ``psum``-combination of the disjoint assignment-vector updates
    (each embedding row belongs to exactly one utterance, hence one shard).

Semantics: each shard owns ``U/n`` utterances and resamples its own blocks
of ``B/n`` per step; utterances across shards condition on the same
statistics snapshot, exactly like utterances within a single-device block
(the documented blocked-Gibbs approximation, SURVEY.md section 7) — so the
chain differs from the single-device one by block composition only, not by
model.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import dp as dp_ops
from ..ops.random import logsumexp
from ..segmenters.common import (
    flat_contrib,
    gather_block_segments,
    leave_out_stats,
    masked_candidate_scores,
    merge_flat,
)


def shard_blocks(order: np.ndarray, n_shards: int, u_local: int,
                 batch_local: int) -> np.ndarray:
    """Per-shard block layout [n_blocks, n_shards, B/n] of LOCAL utterance
    indices (-1 pads), derived from a global permutation: each shard
    processes its own utterances in global-permutation order."""
    per_shard = [[] for _ in range(n_shards)]
    for u in order:
        if int(u) < 0:
            continue  # -1 pads from pad_utterance_order
        per_shard[int(u) // u_local].append(int(u) % u_local)
    n_blocks = max(
        -(-len(lst) // batch_local) for lst in per_shard
    ) if per_shard else 1
    out = np.full((n_blocks, n_shards, batch_local), -1, dtype=np.int64)
    for s, lst in enumerate(per_shard):
        arr = np.asarray(lst, dtype=np.int64)
        for b in range(n_blocks):
            chunk = arr[b * batch_local:(b + 1) * batch_local]
            out[b, s, : len(chunk)] = chunk
    return out


def build_shard_map_sweep(seg, mesh: Mesh, axis: str = "data"):
    """A shard_map sweep function for a UnigramAcousticWordseg.

    Requires ``U % n == 0`` and ``batch_size % n == 0``.  Returns
    ``(sweep_fn, n_shards)``; the sweep takes the same state as the
    single-device sweep plus [n_blocks, n, B/n] local block indices.
    """
    am = seg.acoustic_model
    cov, prior = am.cov, am.prior
    X = am.X
    alpha, K_max, lms = am.alpha, am.K_max, am.lms
    log_prior_vec = am.log_prior_vec
    full_cov = cov.FULL_COV
    utt = seg.utterances
    n = mesh.devices.size
    U = utt.seg_ids.shape[0]
    assert U % n == 0, "corpus must divide the mesh for the shard_map sweep"
    N_max = utt.N_max
    W_store = utt.W
    W_dp = min(seg.n_slices_max, N_max) if seg.n_slices_max > 0 else N_max
    n_min = seg.n_slices_min
    tpt = seg.time_power_term
    wip = seg.wip
    dp_mode = seg._dp_mode
    viterbi_assign = seg.fb_type == "viterbi"
    cov_type = am.covariance_type
    B_loc = seg.batch_size // n
    assert B_loc * n == seg.batch_size
    use_pallas = jax.default_backend() == "tpu"
    interp = not use_pallas

    def dp_slice(a):
        if W_store >= W_dp:
            return a[..., :W_dp]
        pad = [(0, 0)] * (a.ndim - 1) + [(0, W_dp - W_store)]
        fill = -1 if jnp.issubdtype(a.dtype, jnp.integer) else jnp.nan
        return jnp.pad(a, pad, constant_values=fill)

    def run_chains(lo, params_b, new_embeds, k_assign, temp):
        gumbel = jax.random.gumbel(
            k_assign, new_embeds.shape + (K_max,), dtype=X.dtype
        )
        if cov_type == "fixed":
            from ..ops.pallas_chain import fixedvar_chain

            return fixedvar_chain(
                new_embeds, X[jnp.maximum(new_embeds, 0)],
                log_prior_vec[jnp.maximum(new_embeds, 0)], gumbel,
                lo.counts, lo.sum_x, prior.var, prior.var_0, prior.mu_0,
                temp, alpha=alpha, K=K_max,
                lms=1.0 if viterbi_assign else lms,
                use_argmax=viterbi_assign, interpret=interp,
            )
        if cov_type == "diag":
            from ..ops.pallas_chain import diag_chain

            return diag_chain(
                new_embeds, X[jnp.maximum(new_embeds, 0)],
                log_prior_vec[jnp.maximum(new_embeds, 0)], gumbel,
                lo.counts, lo.sum_x, lo.sum_sq,
                prior.m_0, float(prior.k_0), float(prior.v_0), prior.S_0,
                temp, alpha=alpha, K=K_max,
                lms=1.0 if viterbi_assign else lms,
                use_argmax=viterbi_assign, interpret=interp,
            )
        raise NotImplementedError(
            "shard_map sweep supports fixed/diag covariance"
        )

    from ..models.fbgmm import log_weights

    def shard_body(stats, assignments, boundaries_l, key, blocks_l,
                   seg_ids_l, seg_durs_l, lengths_l,
                   anneal_temp, assign_temp, log_p_continue):
        shard = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, shard)
        blocks_l = blocks_l[:, 0, :]  # [n_blocks, 1, B/n] local view

        def block_step(carry, idx_blk):
            stats, assignments, boundaries_l, key, lp_total = carry
            valid = idx_blk >= 0
            idx = jnp.maximum(idx_blk, 0)
            lengths_blk = jnp.where(valid, lengths_l[idx], 0)
            seg_ids_blk = seg_ids_l[idx]
            seg_durs_blk = seg_durs_l[idx]
            bounds_blk = boundaries_l[idx]

            old_embeds, _ = gather_block_segments(
                bounds_blk, lengths_blk, seg_ids_blk
            )
            old_ks = jnp.where(
                old_embeds >= 0, assignments[jnp.maximum(old_embeds, 0)], -1
            )
            from ..segmenters.common import utterance_contrib

            old_contrib = utterance_contrib(X, old_embeds, old_ks, K_max,
                                            full_cov)
            lo = leave_out_stats(stats, old_contrib)

            params_b = jax.vmap(lambda s: cov.predictive_params(prior, s))(lo)
            cand_ids = dp_slice(seg_ids_blk).reshape(B_loc, N_max * W_dp)
            Xc = X[jnp.maximum(cand_ids, 0)]
            post = jax.vmap(cov.log_post_pred_batch)(params_b, Xc)
            w_b = jax.vmap(
                lambda c: log_weights(c, alpha, K_max, lms, True, X.dtype)
            )(lo.counts)
            prior_c = log_prior_vec[jnp.maximum(cand_ids, 0)]
            logits = w_b[:, None, :] + jnp.where(
                (lo.counts > 0)[:, None, :], post, prior_c[..., None]
            )
            log_margs = logsumexp(logits, axis=-1).reshape(B_loc, N_max, W_dp)
            scores = masked_candidate_scores(
                log_margs, dp_slice(seg_ids_blk), dp_slice(seg_durs_blk),
                tpt, wip,
            )

            key, k_dp, k_assign = jax.random.split(key, 3)
            log_prob, new_bounds = dp_ops.segment_dp(
                scores, lengths_blk, k_dp, log_p_continue, anneal_temp,
                n_slices_min=n_min, n_slices_max=W_dp, mode=dp_mode,
                use_pallas=use_pallas if use_pallas else None,
            )
            new_embeds, _ = gather_block_segments(
                new_bounds, lengths_blk, seg_ids_blk
            )
            new_ks = run_chains(lo, params_b, new_embeds, k_assign,
                                assign_temp)

            # ---- collective 1: statistics update, psum over ICI -------- #
            old_flat = flat_contrib(X, old_embeds, old_ks, K_max, full_cov,
                                    valid)
            new_flat = flat_contrib(X, new_embeds, new_ks, K_max, full_cov,
                                    valid)
            delta = jax.tree.map(
                lambda a, b: jax.lax.psum(a - b, axis),
                new_flat, old_flat,
            )
            stats = jax.tree.map(
                lambda g, d: (g + d).astype(g.dtype), stats, delta
            )

            # ---- collective 2: disjoint assignment updates -------------- #
            oobN = assignments.shape[0]
            vmask = valid[:, None]
            mask = jnp.zeros((oobN,), jnp.int32)
            val = jnp.zeros((oobN,), jnp.int32)
            old_flat_idx = jnp.where(
                vmask & (old_embeds >= 0), old_embeds, oobN
            ).reshape(-1)
            mask = mask.at[old_flat_idx].set(1, mode="drop")
            val = val.at[old_flat_idx].set(-1, mode="drop")
            new_flat_idx = jnp.where(
                vmask & (new_embeds >= 0), new_embeds, oobN
            ).reshape(-1)
            mask = mask.at[new_flat_idx].set(1, mode="drop")
            val = val.at[new_flat_idx].set(new_ks.reshape(-1), mode="drop")
            mask = jax.lax.psum(mask, axis)
            val = jax.lax.psum(val, axis)
            assignments = jnp.where(mask > 0, val, assignments)

            # Boundaries stay shard-local.
            idx_w = jnp.where(valid, idx, boundaries_l.shape[0])
            boundaries_l = boundaries_l.at[idx_w].set(new_bounds, mode="drop")
            lp_total = lp_total + jax.lax.psum(
                jnp.sum(jnp.where(valid, log_prob, 0.0)), axis
            )
            return (stats, assignments, boundaries_l, key, lp_total), None

        init = (stats, assignments, boundaries_l, key,
                jnp.zeros((), X.dtype))
        (stats, assignments, boundaries_l, key, lp_total), _ = jax.lax.scan(
            block_step, init, blocks_l
        )
        # Replicated outputs must be identical on every shard; the psum'ed
        # state already is.  Return a common key stream continuation.
        key_out = jax.lax.all_gather(key, axis)[0]
        return stats, assignments, boundaries_l, key_out, lp_total

    try:
        smap = jax.shard_map
    except AttributeError:  # older jax
        from jax.experimental.shard_map import shard_map as smap
    sweep = jax.jit(
        smap(
            shard_body,
            mesh=mesh,
            in_specs=(
                P(), P(), P(axis), P(),              # stats..key
                P(None, axis, None),                 # blocks [nb, n, B/n]
                P(axis), P(axis), P(axis),           # corpus tensors
                P(), P(), P(),                       # scalars
            ),
            out_specs=(P(), P(), P(axis), P(), P()),
            # The DP/chain carries mix shard-invariant inits with varying
            # updates; replication checking would reject them.
            check_vma=False,
        )
    )
    return sweep, n


def use_shard_map_sweep(seg, mesh: Mesh, axis: str = "data"):
    """Switch a (fixed/diag) UnigramAcousticWordseg to the explicit-collective
    sweep.  Complements ``shard_segmenter`` (which must be called first to
    place the corpus tensors on the mesh)."""
    sweep, n = build_shard_map_sweep(seg, mesh, axis)
    utt = seg.utterances
    u_local = utt.seg_ids.shape[0] // n
    b_local = seg.batch_size // n

    def run_blocks_async(blocks_unused, anneal_temp, anneal_gibbs_am):
        am = seg.acoustic_model
        order = blocks_unused  # the global permutation, see gibbs_sample hook
        blocks = shard_blocks(np.asarray(order).reshape(-1), n, u_local,
                              b_local)
        lpc = math.log(seg.calc_p_continue())
        assign_temp = anneal_temp if anneal_gibbs_am else 1.0
        blocks_dev = jax.device_put(
            jnp.asarray(blocks),
            NamedSharding(mesh, P(None, axis, None)),
        )
        (am.stats, am.assignments, seg._boundaries_dev, am.key, lp) = sweep(
            am.stats, am.assignments, seg._boundaries_dev, am.key,
            blocks_dev, utt.seg_ids, utt.seg_durations, utt.lengths_dev,
            np.asarray(anneal_temp, am.X.dtype),
            np.asarray(assign_temp, am.X.dtype),
            np.asarray(lpc, am.X.dtype),
        )
        return lp

    # The driver loop passes padded [n_blocks, B] blocks; we re-derive the
    # shard layout from the flattened permutation instead.
    seg._run_blocks_async = run_blocks_async
    seg._shard_map_mode = True
    return seg
