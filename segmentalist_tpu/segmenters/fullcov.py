"""Touched-component machinery for the full-covariance (NIW) sweep.

The naive blocked full-covariance sweep materialises leave-one-utterance-out
sufficient statistics and predictive parameters for *every* (utterance, slot)
pair -- [B, K, D, D] tensors -- and factorises B*K tiny matrices per block.
At Buckeye scale that is ~10^6 Cholesky factorisations per sweep and hundreds
of MB of HBM traffic, 15x slower than the fixed-variance flagship
(PERFORMANCE.md).

This module implements the exact algebraic shortcut: a left-out utterance's
statistics differ from the global statistics only for the <= S components its
own segments are assigned to.  So

  1. derive predictive parameters ONCE per block from the *global* statistics
     ([K, D, D], one batched Cholesky of K matrices);
  2. score all candidates against them in one [B*M, D^2] x [D^2, K] MXU
     matmul (``components_full.log_post_pred_batch``);
  3. compute corrected parameters only for each utterance's own touched
     components ([B, S] Choleskys) and overwrite those <= S columns.

The assignment chain keeps the same sparse view: a per-utterance "touched
set" of at most S_old + S_new component slots carries live statistics and
predictive parameters through the scan; all other components keep their
block-global scores.  All conditionals are bit-for-bit the same math as the
dense path (each score is still the exact leave-one-utterance-out posterior
predictive), so the sampled chain's distribution is unchanged.

Reference math being scored: ``gaussian_components.py:228-251`` (Student-t
predictive), ``:161-167`` (posterior stats); removal-before-scoring semantics
``unigram_acoustic_wordseg.py:270-273``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.components_full import (
    PredParams,
    _chol_inv_logdet,
    _derive_covar,
    _student_t_from_maha,
)
from ..ops.pallas_chain import _lgamma_stirling
from ..models.fbgmm import log_weights
from ..ops.random import NEG_INF
from ..ops.stats import canonicalize_new_component
from .common import sym_pack_indices

Array = jnp.ndarray

# Every contraction in this module runs at full f32 precision: the TPU's
# default f32 matmul uses bf16 MXU passes whose error (measured ~3e-2
# relative, up to ~0.8 absolute on leave-out statistics at benchmark scale)
# is amplified by the global-minus-contribution cancellation and flips
# assignment-chain argmaxes; round-1's dense path was exact by construction
# (segment_sum statistics + delta-form Mahalanobis).
_HI = jax.lax.Precision.HIGHEST


def n_to_sv(k_0, v_0, D: int, n, dtype):
    """Predictive-parameter scalars from a member count ``n``:
    ``v = v_0 + n - D + 1``, ``s = (k_n + 1) / (k_n v)`` with ``k_n = k_0 + n``
    (NIW predictive, reference ``gaussian_components.py:228-251``)."""
    n = n.astype(dtype)
    k_n = k_0 + n
    v = v_0 + n - D + 1.0
    s = (k_n + 1.0) / (k_n * v)
    return s, v, k_n


def params_to_P(inv_covar, logdet_covar, n, k_0, v_0, D: int):
    """Predictive (inv_covar, logdet_covar) -> the UNSCALED scale-matrix
    factors (inv P, logdet P) the rank-1 chain updates evolve (P_n = S_0 +
    k_0 m_0 m_0^T + sum_sq - k_n m_n m_n^T; covar = s * P with s from
    :func:`n_to_sv`)."""
    s, _, _ = n_to_sv(k_0, v_0, D, n, inv_covar.dtype)
    return inv_covar * s[..., None, None], logdet_covar - D * jnp.log(s)


class Touched(NamedTuple):
    """Per-utterance touched-component view (all [B, S, ...]).

    tk      [B, S]        touched component ids; -1 for pads and duplicates
    counts  [B, S]        leave-one-utterance-out member counts
    params  PredParams    leave-out predictive parameters, [B, S, ...]

    (The leave-out moment sums are intermediates of ``touched_leave_out``
    only: the chain evolves (m, inv P, logdet P) by rank-1 updates and never
    needs raw statistics.)
    """

    tk: Array
    counts: Array
    params: PredParams


def touched_leave_out(prior, stats, X, old_embeds, old_ks,
                      rows=None) -> Touched:
    """Leave-one-utterance-out statistics restricted to the components each
    utterance actually touches (its old segments' assignments).

    Duplicate component ids within an utterance are collapsed to their first
    occurrence (later slots get tk = -1): each touched component's correction
    subtracts the utterance's FULL contribution to it, so one slot suffices.
    ``rows`` ([B, S, D]) supplies the old segments' embedding rows directly,
    skipping the tiny-row gather (see ``common.slab_segment_rows``).
    """
    B, S = old_ks.shape
    dtype = X.dtype
    valid = (old_embeds >= 0) & (old_ks >= 0)
    ks_safe = jnp.maximum(old_ks, 0)

    # same[b, j, s]: slot s holds the same (valid) component as slot j.
    same = (
        (old_ks[:, :, None] == old_ks[:, None, :])
        & valid[:, :, None]
        & valid[:, None, :]
    )
    earlier = jnp.tril(jnp.ones((S, S), bool), -1)
    is_dup = jnp.any(same & earlier[None], axis=-1)
    tk = jnp.where(valid & ~is_dup, old_ks, -1)

    x_old = X[jnp.maximum(old_embeds, 0)] if rows is None else rows
    x_old = jnp.where(valid[:, :, None], x_old, 0.0)
    same_f = same.astype(dtype)
    contrib_counts = jnp.sum(same, axis=-1).astype(stats.counts.dtype)
    contrib_sum_x = jnp.einsum("bjs,bsd->bjd", same_f, x_old,
                               precision=_HI)
    # Symmetric-packed second moments (common.sym_pack_indices): contract
    # and gather D(D+1)/2 unique-pair lanes instead of D^2, unpack the
    # leave-out difference once by a static mirror gather.  Two-step form of
    # einsum("bjs,bsd,bse->bjde"): the 3-operand einsum lowers poorly on TPU
    # (~1 ms/block); pair products + batched matmul is the same contraction.
    D = X.shape[-1]
    iu0, iu1, unpack = sym_pack_indices(D)
    xxp = x_old[..., iu0] * x_old[..., iu1]  # [B, S, D(D+1)/2]
    contrib_sum_sq_p = jnp.einsum("bjs,bsf->bjf", same_f, xxp,
                                  precision=_HI)

    # Row lookups of the [K, .] statistic tables as one-hot MXU matmuls:
    # a [B*S]-indexed row gather costs ~1 ms/block on TPU.  Exact at
    # HIGHEST precision (each output sums exactly one nonzero product).
    oh = (ks_safe.reshape(-1)[:, None]
          == jnp.arange(stats.counts.shape[0])[None, :]).astype(dtype)
    g_sum_x = jnp.matmul(oh, stats.sum_x, precision=_HI).reshape(
        B, S, D)
    g_sum_sq_p = jnp.matmul(
        oh, stats.sum_sq[:, iu0, iu1], precision=_HI
    ).reshape(B, S, -1)

    lo_counts = stats.counts[ks_safe] - contrib_counts
    lo_sum_x = g_sum_x - contrib_sum_x
    lo_sum_sq = (g_sum_sq_p - contrib_sum_sq_p)[..., unpack].reshape(
        B, S, D, D)

    m_n, covar, v = _derive_covar(prior, lo_counts, lo_sum_x, lo_sum_sq)
    inv, logdet = _chol_inv_logdet(covar)
    params = PredParams(mu=m_n, inv_covar=inv, logdet_covar=logdet, v=v)
    return Touched(tk=tk, counts=lo_counts, params=params)


def counts_contrib(old_ks, valid_mask, K_max: int) -> Array:
    """[B, K] per-utterance component-count contribution (counts only --
    the full-cov path never materialises [B, K, D(,D)] moment tensors)."""
    B, S = old_ks.shape
    ok = (old_ks >= 0) & valid_mask
    seg = jnp.where(ok, old_ks, K_max)
    onehot = jax.nn.one_hot(seg, K_max + 1, dtype=jnp.int32)
    return jnp.sum(onehot, axis=1)[:, :K_max]


def corrected_candidate_post(post, Xc, touched: Touched, K_max: int) -> Array:
    """Overwrite the touched columns of the [B, M, K] global-parameter scores
    with each utterance's exact leave-out scores (<= S columns per row)."""
    B, M, _ = post.shape
    D = Xc.shape[-1]
    t_inv = touched.params.inv_covar  # [B, S, D, D]
    t_mu = touched.params.mu
    xx = (Xc[:, :, :, None] * Xc[:, :, None, :]).reshape(B, M, D * D)
    xAx = jnp.einsum("bmf,btf->bmt", xx, t_inv.reshape(B, -1, D * D),
                     precision=_HI)
    Amu = jnp.einsum("btde,bte->btd", t_inv, t_mu, precision=_HI)
    xAmu = jnp.einsum("bmd,btd->bmt", Xc, Amu, precision=_HI)
    muAmu = jnp.sum(t_mu * Amu, axis=-1)  # [B, S]
    maha = xAx - 2.0 * xAmu + muAmu[:, None, :]
    c = _student_t_from_maha(
        maha, touched.params.logdet_covar[:, None, :],
        touched.params.v[:, None, :], D,
    )  # [B, M, S]
    col = jnp.where(touched.tk >= 0, touched.tk, K_max)  # [B, S]
    b_idx = jnp.arange(B)[:, None]
    return post.at[b_idx, :, col].set(jnp.swapaxes(c, 1, 2), mode="drop")


def fullcov_score_inputs(params_g, touched: Touched):
    """Student-t tables for ``ops.pallas_score.fullcov_log_margs``: the
    global-parameter tables (A2 = inverse predictive scale SYMMETRIC-PACKED
    -- upper triangle row-major, off-diagonals doubled, so
    x^T A x = xx_packed @ A2_packed with D*(D+1)/2 contraction lanes instead
    of D*D -- A1 = invC @ mu, the scalar constants with EXACT gammaln) and
    the same per-touched-slot, plus the slot one-hot scatter rows."""
    from jax.scipy.special import gammaln

    D = params_g.mu.shape[-1]
    iu = jnp.triu_indices(D)
    dbl = jnp.where(iu[0] == iu[1], 1.0, 2.0)

    def tables(p):
        A1 = jnp.einsum("...de,...e->...d", p.inv_covar, p.mu,
                        precision=_HI)
        a0 = jnp.sum(p.mu * A1, axis=-1)
        ck = (
            gammaln((p.v + D) / 2.0) - gammaln(p.v / 2.0)
            - 0.5 * D * (jnp.log(p.v) + jnp.log(jnp.pi))
            - 0.5 * p.logdet_covar
        )
        A2 = p.inv_covar[..., iu[0], iu[1]] * dbl.astype(p.inv_covar.dtype)
        return A2, A1, a0, ck, 1.0 / p.v, (p.v + D) / 2.0

    g = tables(params_g)
    t = tables(touched.params)
    K = params_g.mu.shape[0]
    oh = jnp.where(
        (touched.tk >= 0)[..., None],
        jax.nn.one_hot(jnp.maximum(touched.tk, 0), K,
                       dtype=params_g.mu.dtype),
        0.0,
    )
    tmask = jnp.sum(oh, axis=1)
    return g, t, oh, tmask


def pallas_chain_inputs(prior, stats_params, global_counts, touched: Touched):
    """P-form tables for :func:`ops.pallas_chain.fullcov_chain_pallas`:
    touched-slot (counts, m, invP, ldP, tk) plus the global component tables
    claimed slots pull from (untouched leave-out factors == global)."""
    D = stats_params.mu.shape[-1]
    invP0, ldP0 = params_to_P(
        touched.params.inv_covar, touched.params.logdet_covar,
        touched.counts, prior.k_0, prior.v_0, D,
    )
    g_invP, g_ldP = params_to_P(
        stats_params.inv_covar, stats_params.logdet_covar, global_counts,
        prior.k_0, prior.v_0, D,
    )
    return (touched.counts, touched.params.mu, invP0, ldP0, touched.tk,
            stats_params.mu, g_invP, g_ldP)


def fullcov_chain(prior, X, stats_params, global_counts, lo_counts,
                  touched: Touched, new_embeds, base_scores, gumbel,
                  log_prior_vec, alpha, K_max: int, lms, temp,
                  use_argmax: bool, weight_fn=None, aux_args=None) -> Array:
    """Sequential within-utterance assignment resampling for full covariance,
    carrying only the touched-component statistics (reference conditioning:
    ``fbgmm.py:422-463``; for the bigram driver pass ``weight_fn``).

    Arguments (per block):
      stats_params PredParams [K, ...] predictive parameters of the block's
                   GLOBAL statistics (the leave-out factors of components
                   untouched by an utterance equal the global ones)
      global_counts [K]       the block's global member counts
      lo_counts    [B, K]     leave-out counts (the chain updates its own copy)
      touched      Touched    initial touched set from ``touched_leave_out``
      new_embeds   [B, S_new] embedding ids of the new segments (-1 pads)
      base_scores  [B, S_new, K] global-parameter scores of the new embeds
      gumbel       [B, S_new, K]
      weight_fn    optional (counts, j_prev, aux_b) -> [K] mixture-weight
                   term; defaults to the unigram collapsed-Dirichlet term.
                   ``j_prev`` is the previous segment's sampled component
                   (int32, -1 before the first; the bigram LM conditions on
                   it) and ``aux_b`` the per-utterance slice of ``aux_args``.
      aux_args     optional pytree of per-utterance arrays (leading dim B)
                   passed through to ``weight_fn``.
    """
    B, S_new = new_embeds.shape
    D = X.shape[-1]
    S_old = touched.tk.shape[1]
    T = S_old + S_new
    dtype = X.dtype
    k_0, v_0 = prior.k_0, prior.v_0

    # The chain carries each touched slot's posterior mean m_n and the
    # inverse/log-determinant of the UNSCALED scale matrix
    # P_n = S_0 + k_0 m_0 m_0^T + sum_sq - k_n m_n m_n^T, because adding one
    # observation is a RANK-1 update of P:
    #     P' = P + (k_n / (k_n + 1)) (x - m_n)(x - m_n)^T,
    # so Sherman-Morrison + the matrix determinant lemma replace the O(D^3)
    # per-step re-factorisation with an O(D^2) update whose dependency chain
    # is one matvec -- the scan step's critical path shrinks ~2x.  The
    # predictive parameters follow from (counts, m, invP, logdetP):
    #     v = v_0 + n - D + 1,  s = (k_n + 1) / (k_n v),
    #     inv_covar = invP / s,  logdet_covar = D log s + logdetP.
    def _n_to_sv(n):
        return n_to_sv(k_0, v_0, D, n, dtype)

    def _params_to_P(inv_covar, logdet_covar, n):
        return params_to_P(inv_covar, logdet_covar, n, k_0, v_0, D)

    def pad_slots(a, fill=0.0):
        pad_shape = (B, S_new) + a.shape[2:]
        return jnp.concatenate(
            [a, jnp.full(pad_shape, fill, a.dtype)], axis=1
        )

    invP0, logdetP0 = _params_to_P(
        touched.params.inv_covar, touched.params.logdet_covar,
        touched.counts,
    )
    tk0 = pad_slots(touched.tk, -1)
    t_m0 = pad_slots(touched.params.mu)
    t_invP0 = pad_slots(invP0)
    t_ldP0 = pad_slots(logdetP0)
    # Global (untouched) components' P-factors, for slots claimed mid-chain.
    g_invP, g_ldP = _params_to_P(
        stats_params.inv_covar, stats_params.logdet_covar, global_counts
    )
    g_m = stats_params.mu

    # For the default (unigram) weight term, lms * log(alpha/K + counts)
    # changes in exactly one entry per step, so the chain carries the [K]
    # weight vector and updates one scalar instead of recomputing a K-wide
    # log every step (the scan's cost is K-wide ops, not the rank-1 algebra).
    incremental_w = weight_fn is None
    if weight_fn is None:
        def weight_fn(counts, j_prev, aux_b):  # noqa: ARG001
            return log_weights(counts, alpha, K_max, lms,
                               include_denominator=False, dtype=dtype)
    if aux_args is None:
        aux_args = jnp.zeros((B,), jnp.int32)  # placeholder pytree

    def one_chain(counts, tk, t_m, t_invP, t_ldP,
                  embeds, base_rows, gumb, lpr_rows, j_prev0, aux_b):
        w0 = log_weights(counts, alpha, K_max, lms,
                         include_denominator=False, dtype=dtype)

        def step(carry, inp):
            counts, w_carry, tk, t_m, t_invP, t_ldP, j_prev = carry
            e, base, g, lpr = inp
            ok = e >= 0
            x = X[jnp.maximum(e, 0)]

            # Exact leave-out scores: global columns + touched corrections.
            # Composition mirrors ops.pallas_chain.fullcov_chain_pallas
            # op-for-op (two-step contraction, maha clamp, Stirling lgamma,
            # same groupings) so the XLA fallback samples bit-identical
            # chains to the Pallas kernel; exact gammaln stays in the
            # log_marg metrics path.
            tk_safe = jnp.maximum(tk, 0)
            s_t, v_t, _ = _n_to_sv(counts[tk_safe])
            delta = x[None, :] - t_m  # [T, D]
            U = jnp.einsum("tde,te->td", t_invP, delta, precision=_HI)
            mahaP = jnp.maximum(jnp.sum(U * delta, axis=-1), 0.0)
            maha = mahaP / s_t
            ld_t = t_ldP + D * jnp.log(s_t)
            glr = (_lgamma_stirling((v_t + D) / 2.0)
                   - _lgamma_stirling(v_t / 2.0))
            c = (
                glr
                - 0.5 * D * (jnp.log(v_t) + math.log(math.pi))
                - 0.5 * ld_t
                - 0.5 * (v_t + D) * jnp.log1p(maha / v_t)
            )
            post = base.at[jnp.where(tk >= 0, tk, K_max)].set(c, mode="drop")

            if incremental_w:
                w = w_carry
            else:
                w = weight_fn(counts, j_prev, aux_b)
            logits = w + jnp.where(counts > 0, post, lpr)
            if use_argmax:
                k = jnp.argmax(logits)
            else:
                k = jnp.argmax(jnp.where(
                    jnp.isneginf(logits), NEG_INF, logits / temp + g
                ))
            k = canonicalize_new_component(counts, k)

            # Slot bookkeeping: reuse the component's slot or claim a free
            # one (T = S_old + S_new guarantees a free slot exists).
            # Untouched components' leave-out factors equal the global ones.
            match = tk == k
            has = jnp.any(match)
            slot = jnp.where(has, jnp.argmax(match), jnp.argmax(tk == -1))
            m = jnp.where(has, t_m[slot], g_m[k])
            invP = jnp.where(has, t_invP[slot], g_invP[k])
            ldP = jnp.where(has, t_ldP[slot], g_ldP[k])

            # Rank-1 Sherman-Morrison update of (invP, logdetP) and the
            # conjugate mean update m' = (k_n m + x) / (k_n + 1).
            _, _, k_n = _n_to_sv(counts[k])
            beta = k_n / (k_n + 1.0)
            d = x - m
            u = jnp.einsum("de,e->d", invP, d, precision=_HI)
            denom = 1.0 + beta * jnp.sum(u * d)
            denom = jnp.where(denom > 0.0, denom, 1.0)  # pad-step guard
            invP = invP - (beta / denom) * (u[:, None] * u[None, :])
            ldP = ldP + jnp.log(denom)
            m = (k_n * m + x) / (k_n + 1.0)

            counts = counts.at[k].add(ok.astype(counts.dtype))
            if incremental_w:
                w_carry = w_carry.at[jnp.where(ok, k, K_max)].set(
                    lms * jnp.log(alpha / K_max + counts[k].astype(dtype)),
                    mode="drop",
                )
            slot_w = jnp.where(ok, slot, T)
            tk = tk.at[slot_w].set(k.astype(tk.dtype), mode="drop")
            t_m = t_m.at[slot_w].set(m, mode="drop")
            t_invP = t_invP.at[slot_w].set(invP, mode="drop")
            t_ldP = t_ldP.at[slot_w].set(ldP, mode="drop")
            j_prev = jnp.where(ok, k.astype(jnp.int32), j_prev)
            carry = (counts, w_carry, tk, t_m, t_invP, t_ldP, j_prev)
            return carry, jnp.where(ok, k.astype(jnp.int32), -1)

        init = (counts, w0, tk, t_m, t_invP, t_ldP, j_prev0)
        # unroll: the scan body is many small ops, so the TPU's
        # per-iteration loop overhead dominates; unrolling amortises it.
        _, ks = jax.lax.scan(step, init, (embeds, base_rows, gumb, lpr_rows),
                             unroll=4)
        return ks

    j_prev0 = jnp.full((B,), -1, jnp.int32)
    lpr = log_prior_vec[jnp.maximum(new_embeds, 0)]
    return jax.vmap(one_chain)(
        lo_counts, tk0, t_m0, t_invP0, t_ldP0,
        new_embeds, base_scores, gumbel, lpr, j_prev0, aux_args,
    )
