"""Pallas TPU kernel for the within-utterance assignment chain.

The reference assigns each *new* segment of an utterance sequentially,
conditioning on the component counts/statistics updated by the previous
segments (``fbgmm.py:422-463`` via ``unigram_acoustic_wordseg.py:339-349``).
This is a true sequential dependency over the S = N_max segment positions,
but utterances are independent -- so the kernel processes a *tile* of
utterances per grid program, keeps every per-utterance quantity (counts,
sufficient statistics, predictive parameters) resident in VMEM, and walks
the S positions in a ``fori_loop``.  One sweep step therefore touches HBM
once, instead of the XLA scan's per-step round-trips of the [B, K, D]
parameter tensors.

Design notes:
  * layout [B_tile, D_pad, K_pad] -- features on sublanes, components on
    lanes; every per-step op is a batched VPU pass;
  * predictive mean/precision are updated *incrementally*: only the sampled
    component's column changes per step, extracted / re-derived / scattered
    with one-hot masks (no dynamic lane indexing, which Mosaic lacks);
  * the transcendental ``sum_d log prec_pred`` term is likewise maintained
    incrementally (a [D]-sized log per step instead of [D, K]);
  * "pick row s" indexing is one-hot multiply + reduce;
  * the categorical draw is Gumbel-max over lanes on pre-computed noise --
    the XLA fallback consumes the *same* noise tensor, so both paths sample
    identical chains.

Kernels: ``fixedvar_chain`` (flagship), ``diag_chain`` (normal-inverse-
chi-squared, in-kernel Stirling lgamma), ``bigram_fixedvar_chain`` (smoothed
bigram LM conditioning), ``fullcov_chain_pallas`` (NIW touched-slot chain,
rank-1 Sherman-Morrison updates; the XLA twin is
``segmenters/fullcov.fullcov_chain``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-jnp.inf)
_LOG_2PI = math.log(2.0 * math.pi)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_b_tile(per_utt_bytes: float, cap: int, B: int,
                 shared_bytes: float = 0.0,
                 budget: float = 12 * 2 ** 20,
                 strict_above: int = 16) -> int:
    """Largest utterances-per-program tile whose VMEM footprint (inputs +
    carries + temps, estimated per utterance) fits the scoped-VMEM budget.

    The chain kernels' static tile sizes OOM'ed scoped VMEM once utterances
    got long (S = 120 landmarks -> [B_tile, S, K_pad] blocks of ~8 MB each);
    the budget leaves headroom below the 16 MB limit for Mosaic's
    double-buffering of streamed inputs.

    Mosaic's scoped-VMEM footprint also STEPS UP with the grid size (input
    prefetch buffering): the fixedvar kernel's 32-utterance tiles compiled
    at <= 8 programs but blew the 16 MB limit by ~2 MB at 16 programs
    (B=512, measured round 3).  All five chain kernels share the failure
    mode, so when the grid exceeds ``strict_above`` programs the tile is
    picked under a 2.5 MB stricter budget.  The step SATURATES rather than
    growing with the grid: the flat reduction is hardware-validated out to
    32 programs (fixedvar B=500 -> 16-utterance tiles, grid 32, round 3),
    so the penalty is a constant, not per-doubling — a grid-proportional
    model would collapse tiles to 1 at large B for no measured reason.
    ``strict_above`` defaults to 16 — the largest grid the non-fixedvar
    kernels have been hardware-validated at (benchmark scale, B=125/cap=8)
    — so validated tile choices are unchanged; fixedvar passes its
    measured threshold of 8.

    Shrinking the tile under the stricter budget grows the grid, so the
    pick iterates to a FIXED POINT: the returned tile satisfies the budget
    implied by its own grid (with a flat penalty this converges in <= 2
    steps — once strict, re-picking can only shrink the tile, which keeps
    the grid above the threshold, so the budget assignment stays
    consistent)."""

    def pick(bud: float) -> int:
        bt = min(cap, _round_up(B, 8))
        while bt > 1 and shared_bytes + per_utt_bytes * bt > bud:
            bt //= 2
        return max(bt, 1)

    def penalty(bt: int) -> float:
        grid = _round_up(B, bt) // bt
        return 2.5 * 2 ** 20 if grid > strict_above else 0.0

    bt = pick(budget)
    while True:
        new = pick(budget - penalty(bt))
        if new == bt:
            return bt
        bt = new


def _segment_counts(embeds):
    """[B] valid-segment count per utterance (segments are packed from
    slot 0 by ``segmenters.common.segments_from_boundaries``)."""
    S = embeds.shape[1]
    return jnp.max(
        jnp.where(embeds >= 0,
                  jnp.arange(S, dtype=jnp.int32)[None, :] + 1, 0),
        axis=1,
    )


def _tile_step_bounds(embeds, S: int, B: int, B_pad: int, B_tile: int):
    """[n_tiles, 1] per-tile max valid-segment count: the sequential chain
    loop only needs the tile's actual max step count -- utterances average
    far fewer segments than the static S bound, and the kernels' cost is
    dominated by sequential step latency."""
    n_valid = _segment_counts(embeds)
    return jnp.max(
        jnp.pad(n_valid, (0, B_pad - B)).reshape(B_pad // B_tile, B_tile),
        axis=1,
    )[:, None]


def _length_sort(embeds, *arrays):
    """Sort utterances ascending by segment count; return the inverse
    permutation and every input array sorted along axis 0.

    The chain kernels run one sequential program per ``B_tile`` utterances,
    bounded by the tile's max segment count (``_tile_step_bounds``).  With
    utterances in corpus order every tile pays its own tail max, while
    sorted tiles are length-homogeneous, so the summed sequential step
    count approaches the corpus MEAN segment count instead of
    ``n_tiles x max``.  Chains are per-utterance independent, so sorting
    the inputs and unsorting the sampled assignments (``ks[inv]``) is
    exact.  EVERY per-utterance input (incl. the pre-drawn Gumbel noise)
    must ride through this call so its rows keep travelling with their
    utterances — permuting arrays at a call site by hand is the bug this
    helper exists to prevent."""
    perm = jnp.argsort(_segment_counts(embeds))
    inv = jnp.argsort(perm)
    return inv, tuple(a[perm] for a in (embeds,) + arrays)


@functools.partial(
    jax.jit,
    static_argnames=("alpha", "K", "lms", "use_argmax", "interpret",
                     "stats_T"),
)
def fixedvar_chain(embeds, Xe, log_prior_e, gumbel, counts, sum_x,
                   var, var_0, mu_0, temp,
                   alpha: float, K: int, lms: float = 1.0,
                   use_argmax: bool = False, interpret: bool = False,
                   stats_T: bool = False):
    """Sequential within-utterance assignment chains, batched over utterances.

    Parameters
    ----------
    embeds : [B, S] int32 segment embedding ids (-1 = pad).
    Xe : [B, S, D] the segments' embedding vectors.
    log_prior_e : [B, S] prior log-density of each segment's vector.
    gumbel : [B, S, K] pre-drawn Gumbel noise (ignored for ``use_argmax``).
    counts, sum_x : leave-one-utterance-out statistics [B, K] / [B, K, D].
    var, var_0, mu_0 : fixed-variance prior vectors [D].
    temp : scalar annealing temperature.
    stats_T : ``sum_x`` arrives FEATURE-MAJOR ([B, D, K], e.g. from
        ``segmenters.common.leave_out_moments_T``) -- the kernel's own VMEM
        layout, so the host-side swapaxes (an XLA relayout copy chain worth
        ~1 ms/sweep at flagship scale) is skipped.  Values must equal the
        component-major input's transpose; the kernel math is unchanged.

    Returns
    -------
    ks : [B, S] int32 sampled component of each segment (-1 pads).
    """
    B, S = embeds.shape
    D = Xe.shape[-1]
    D_pad = _round_up(max(D, 8), 8)
    K_pad = _round_up(K, 128)
    # Measured-accurate VMEM accounting (inputs gumb [S, K_pad] + sumx /
    # mu / pp carries [D_pad, K_pad] + vectors); 32-utterance tiles fit at
    # benchmark scale and halve the sequential program count (10.3 -> 10.0
    # ms/sweep, round 3); long utterances fall back to smaller tiles.
    per_utt = 4.0 * (S * K_pad + 3 * D_pad * K_pad + 2 * D_pad * S
                     + 2 * K_pad) * 1.3
    B_tile = _pick_b_tile(per_utt, 32, B, budget=13.5 * 2 ** 20,
                          strict_above=8)
    B_pad = _round_up(B, B_tile)
    inv = None
    if B_pad // B_tile > 1:
        inv, (embeds, Xe, log_prior_e, gumbel, counts, sum_x) = (
            _length_sort(embeds, Xe, log_prior_e, gumbel, counts, sum_x))
    dtype = Xe.dtype
    Kf = float(K)

    def bpad(a, fill=0):
        return jnp.pad(a, ((0, B_pad - B),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    # Host-side layout prep: features on sublanes, components on lanes.
    xeT = bpad(jnp.pad(
        jnp.swapaxes(Xe, 1, 2), ((0, 0), (0, D_pad - D), (0, 0))
    ))  # [B_pad, D_pad, S]
    gumb = bpad(jnp.pad(gumbel.astype(dtype),
                        ((0, 0), (0, 0), (0, K_pad - K))))
    okf = bpad((embeds >= 0).astype(dtype)[:, None, :])  # [B_pad, 1, S]
    logp = bpad(log_prior_e.astype(dtype)[:, None, :])   # [B_pad, 1, S]
    counts_f = bpad(
        jnp.pad(counts.astype(dtype), ((0, 0), (0, K_pad - K)))[:, None, :]
    )  # [B_pad, 1, K_pad]
    sum_xT = sum_x if stats_T else jnp.swapaxes(sum_x, 1, 2)
    sumx = bpad(jnp.pad(
        sum_xT.astype(dtype),
        ((0, 0), (0, D_pad - D), (0, K_pad - K)),
    ))  # [B_pad, D_pad, K_pad]

    def colpad(v, fill):
        v = jnp.asarray(v, dtype)
        return jnp.pad(v, (0, D_pad - D), constant_values=fill)[:, None]

    prec_c = 1.0 / colpad(var, 1.0)     # [D_pad, 1]
    prec0_c = 1.0 / colpad(var_0, 1.0)
    p0m0_c = prec0_c * colpad(mu_0, 0.0)

    def kernel(temp_ref, ns_ref, prec_ref, prec0_ref, p0m0_ref, okf_ref,
               logp_ref, xe_ref, gumb_ref, counts_ref, sumx_ref, ks_ref):
        temp = temp_ref[0, 0]
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K_pad), 2)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
        dmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, D_pad, 1), 1) < D
        ).astype(dtype)
        real = lane_k < K
        prec = prec_ref[:]      # [D_pad, 1], broadcasts over the batch dim
        prec0 = prec0_ref[:]
        p0m0 = p0m0_ref[:]

        def derive(cnt, sx):
            prec_n = prec0 + cnt * prec
            mu = (p0m0 + prec * sx) / prec_n
            pp = prec_n * prec / (prec_n + prec)
            return mu, pp

        def body(s, carry):
            counts_f, sumx, mu, pp, lpp = carry
            oh_lane = (lane_s == s).astype(dtype)   # [1, 1, S]
            x = jnp.sum(xe_ref[:] * oh_lane, axis=2, keepdims=True)
            # gumb has segment positions on sublanes: dynamic sublane
            # slice instead of a one-hot pass over [B_t, S, K_pad].
            g = gumb_ref[:, pl.ds(s, 1), :]
            ok = jnp.sum(okf_ref[:] * oh_lane, axis=2, keepdims=True)
            lp = jnp.sum(logp_ref[:] * oh_lane, axis=2, keepdims=True)

            delta = x - mu
            maha = jnp.sum(delta * delta * pp * dmask, axis=1, keepdims=True)
            post = -0.5 * D * _LOG_2PI + 0.5 * lpp - 0.5 * maha
            w = lms * jnp.log(alpha / Kf + counts_f)
            logits = w + jnp.where(counts_f > 0.0, post, lp)
            logits = jnp.where(real, logits, NEG_INF)
            if use_argmax:
                perturbed = logits
            else:
                perturbed = jnp.where(
                    jnp.isneginf(logits), NEG_INF, logits / temp + g
                )
            k_draw = jnp.argmax(perturbed, axis=2)[..., None]  # [B_t, 1, 1]

            # canonicalize_new_component: a draw on an empty slot births the
            # first empty slot (reference clamp, fbgmm.py:391-393).
            oh_draw = (lane_k == k_draw).astype(dtype)
            cnt_at = jnp.sum(oh_draw * counts_f, axis=2, keepdims=True)
            empty = jnp.where(jnp.logical_and(counts_f <= 0.0, real), 1.0, 0.0)
            any_empty = jnp.max(empty, axis=2, keepdims=True) > 0.0
            # First-empty via a tie-free min over lane indices: Mosaic's
            # native argmax breaks ties by LAST index (XLA: first), which
            # silently birthed the last empty slot on real TPUs.
            first_empty = jnp.min(
                jnp.where(empty > 0.0, lane_k, K_pad), axis=2, keepdims=True
            )
            k_new = jnp.where(
                cnt_at > 0.0, k_draw,
                jnp.where(any_empty, first_empty, K - 1),
            )

            # Masked one-hot update of the sampled column.
            oh = (lane_k == k_new).astype(dtype) * ok  # [B_t, 1, K_pad]
            new_counts = counts_f + oh
            new_sumx = sumx + oh * x
            # Incremental predictive-parameter update: derive the changed
            # column only and write it back with an exact SELECT.  An
            # add-of-difference scatter (`mu + oh*(new-old)`) rounds once per
            # write, drifting the carried tables away from the XLA twins'
            # exact `.at[k].set` rows (bigram-diag measured ~0.5% argmax
            # flips on length-10 chains, round 3); the select keeps every
            # lane exactly `derive(<integer statistics>)` on both compilers.
            sel = oh > 0.0
            cnt_row = jnp.sum(oh * new_counts, axis=2, keepdims=True)
            sx_row = jnp.sum(oh * new_sumx, axis=2, keepdims=True)
            mu_row_new, pp_row_new = derive(cnt_row, sx_row)
            new_mu = jnp.where(sel, mu_row_new, mu)
            new_pp = jnp.where(sel, pp_row_new, pp)
            safe = lambda r: jnp.where(  # noqa: E731  log(0) guard for pads
                jnp.logical_and(dmask > 0.0, r > 0.0), r, 1.0)
            t_new = jnp.sum(jnp.log(safe(pp_row_new)), axis=1, keepdims=True)
            new_lpp = jnp.where(sel, t_new, lpp)

            ks_ref[:, pl.ds(s, 1), :] = jnp.where(
                ok > 0.0, k_new, -1
            ).astype(jnp.int32).reshape(-1, 1, 1)
            return new_counts, new_sumx, new_mu, new_pp, new_lpp

        ks_ref[:] = jnp.full((B_tile, S, 1), -1, jnp.int32)
        counts0 = counts_ref[:]
        sumx0 = sumx_ref[:]
        mu0, pp0 = derive(counts0, sumx0)
        lpp0 = jnp.sum(
            jnp.log(jnp.where(dmask > 0.0, pp0, 1.0)), axis=1, keepdims=True
        )
        jax.lax.fori_loop(0, ns_ref[pl.program_id(0), 0], body,
                          (counts0, sumx0, mu0, pp0, lpp0))

    temp_in = jnp.asarray(temp, dtype=dtype).reshape(1, 1)
    shared2 = lambda i: (0, 0)  # noqa: E731
    own3 = lambda i: (i, 0, 0)  # noqa: E731
    ks = pl.pallas_call(
        kernel,
        grid=(B_pad // B_tile,),
        in_specs=[
            pl.BlockSpec((1, 1), shared2, memory_space=pltpu.SMEM),
            pl.BlockSpec((B_pad // B_tile, 1), shared2,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((D_pad, 1), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, 1), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, 1), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, S, K_pad), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, K_pad), own3,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_tile, S, 1), own3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, S, 1), jnp.int32),
        interpret=interpret,
    )(temp_in, _tile_step_bounds(embeds, S, B, B_pad, B_tile),
      prec_c, prec0_c, p0m0_c, okf, logp, xeT, gumb, counts_f, sumx)
    ks = ks[:B, :, 0]
    return ks if inv is None else ks[inv]


@functools.partial(
    jax.jit,
    static_argnames=("alpha_a", "intrp_lambda", "b_smooth", "K", "lms",
                     "interpret", "stats_T"),
)
def bigram_fixedvar_chain(embeds, Xe, log_prior_e, gumbel, counts, sum_x,
                          var, var_0, mu_0, temp,
                          uni_lo, big_table, corr_j, corr_i,
                          alpha_a: float, intrp_lambda: float,
                          b_smooth: float, K: int, lms: float = 1.0,
                          interpret: bool = False, stats_T: bool = False):
    """Bigram-conditioned assignment chains (reference
    ``gibbs_sample_inside_loop_i_embed``, bigram_acoustic_wordseg.py:332-384)
    as a Pallas kernel.

    Same structure as :func:`fixedvar_chain`, with the mixture-weight term
    replaced by the smoothed interpolated bigram LM conditioned on the
    previous segment's sampled component:

        w = lms * log( lam * uni_prob + (1-lam) * (row_j - corr + b/K)/(c_j + b) )

    where ``row_j`` is the global bigram-count row of the previous component
    and ``corr`` removes the utterance's own OLD pairs (``corr_j``/``corr_i``;
    the reference strips the utterance's LM counts before sampling,
    :410/:496).  The first segment of an utterance uses the unigram weights.

    Extra inputs: ``uni_lo`` [B, K] leave-one-utterance-out unigram counts,
    ``big_table`` [K, K] global bigram counts (shared), ``corr_j``/``corr_i``
    [B, S] the utterance's old (prev, cur) pairs.  Every valid pair must be
    counted in ``big_table`` or the logits go NaN, where Mosaic/XLA argmax
    semantics differ (see :func:`bigram_diag_chain`).  ``stats_T``: as in
    :func:`fixedvar_chain` (``sum_x`` arrives [B, D, K]).
    """
    B, S = embeds.shape
    D = Xe.shape[-1]
    D_pad = _round_up(max(D, 8), 8)
    K_pad = _round_up(K, 128)
    B_tile = _pick_b_tile(
        4.0 * (2 * S * K_pad + 6 * D_pad * K_pad + 2 * D_pad * S) * 1.5,
        8, B, shared_bytes=4.0 * K_pad * K_pad)
    B_pad = _round_up(B, B_tile)
    inv = None
    if B_pad // B_tile > 1:
        inv, (embeds, Xe, log_prior_e, gumbel, counts, sum_x, uni_lo,
              corr_j, corr_i) = _length_sort(
                  embeds, Xe, log_prior_e, gumbel, counts, sum_x, uni_lo,
                  corr_j, corr_i)
    dtype = Xe.dtype
    Kf = float(K)

    def bpad(a, fill=0):
        return jnp.pad(a, ((0, B_pad - B),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    xeT = bpad(jnp.pad(
        jnp.swapaxes(Xe, 1, 2), ((0, 0), (0, D_pad - D), (0, 0))
    ))  # [B_pad, D_pad, S]
    gumb = bpad(jnp.pad(gumbel.astype(dtype), ((0, 0), (0, 0), (0, K_pad - K))))
    okf = bpad((embeds >= 0).astype(dtype)[:, None, :])
    logp = bpad(log_prior_e.astype(dtype)[:, None, :])
    counts_f = bpad(
        jnp.pad(counts.astype(dtype), ((0, 0), (0, K_pad - K)))[:, None, :]
    )
    sumx = bpad(jnp.pad(
        (sum_x if stats_T else jnp.swapaxes(sum_x, 1, 2)).astype(dtype),
        ((0, 0), (0, D_pad - D), (0, K_pad - K)),
    ))
    uni = bpad(jnp.pad(uni_lo.astype(dtype),
                       ((0, 0), (0, K_pad - K)))[:, None, :])
    big = jnp.pad(big_table.astype(dtype),
                  ((0, K_pad - K), (0, K_pad - K)))
    # Utterance's own old-pair successors as a one-hot table [B, S, K_pad];
    # the per-step correction is then a masked reduce over S.
    oh_pi = (
        jax.nn.one_hot(jnp.maximum(corr_i, 0), K_pad, dtype=dtype)
        * ((corr_i >= 0) & (corr_j >= 0)).astype(dtype)[..., None]
    )
    oh_pi = bpad(oh_pi)
    cj = bpad(corr_j.astype(jnp.int32)[:, None, :])  # [B_pad, 1, S]

    def colpad(v, fill):
        v = jnp.asarray(v, dtype)
        return jnp.pad(v, (0, D_pad - D), constant_values=fill)[:, None]

    prec_c = 1.0 / colpad(var, 1.0)
    prec0_c = 1.0 / colpad(var_0, 1.0)
    p0m0_c = prec0_c * colpad(mu_0, 0.0)

    lam = float(intrp_lambda)
    a_s = float(alpha_a)
    b_s = float(b_smooth)
    lms_f = float(lms)

    def kernel(temp_ref, ns_ref, prec_ref, prec0_ref, p0m0_ref, big_ref,
               logp_ref, okf_ref, cj_ref, xe_ref, gumb_ref, counts_ref,
               sumx_ref, uni_ref, ohpi_ref, ks_ref):
        temp = temp_ref[0, 0]
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K_pad), 2)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
        dmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, D_pad, 1), 1) < D
        ).astype(dtype)
        real = lane_k < K
        realf = real.astype(dtype)
        prec = prec_ref[:]
        prec0 = prec0_ref[:]
        p0m0 = p0m0_ref[:]

        uni_c = uni_ref[:]  # [B_t, 1, K_pad] leave-out unigram counts
        n_uni = jnp.sum(uni_c * realf, axis=2, keepdims=True)
        uni_prob = (uni_c + a_s / Kf) / (n_uni + a_s)
        uni_w = lms_f * (jnp.log(uni_c + a_s / Kf) - jnp.log(n_uni + a_s))

        def derive(cnt, sx):
            prec_n = prec0 + cnt * prec
            mu = (p0m0 + prec * sx) / prec_n
            pp = prec_n * prec / (prec_n + prec)
            return mu, pp

        def body(s, carry):
            counts_f, sumx, mu, pp, lpp, j_prev = carry
            oh_lane = (lane_s == s).astype(dtype)
            x = jnp.sum(xe_ref[:] * oh_lane, axis=2, keepdims=True)
            # gumb has segment positions on sublanes: dynamic sublane
            # slice instead of a one-hot pass over [B_t, S, K_pad].
            g = gumb_ref[:, pl.ds(s, 1), :]
            ok = jnp.sum(okf_ref[:] * oh_lane, axis=2, keepdims=True)
            lp = jnp.sum(logp_ref[:] * oh_lane, axis=2, keepdims=True)

            # LM weights conditioned on the previous component.
            j_s = jnp.maximum(j_prev, 0)  # [B_t, 1, 1] int32
            oh_j = (lane_k == j_s).astype(dtype)  # [B_t, 1, K_pad]
            # row_j: one [B_t, K] x [K, K] matvec on the MXU.
            row = jax.lax.dot_general(
                oh_j[:, 0, :], big_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST,
            )[:, None, :]  # [B_t, 1, K_pad]
            sel = (cj_ref[:] == j_s).astype(dtype)  # [B_t, 1, S]
            corr = jnp.sum(
                ohpi_ref[:] * jnp.swapaxes(sel, 1, 2), axis=1, keepdims=True
            )  # [B_t, 1, K_pad]
            uni_j = jnp.sum(oh_j * uni_c, axis=2, keepdims=True)
            p_cond = lam * uni_prob + (1.0 - lam) * (
                (row - corr) + b_s / Kf
            ) / (uni_j + b_s)
            w_big = lms_f * jnp.log(p_cond)
            # Select (not blend): the unused branch can be NaN (log of the
            # j=0 fallback row) for the first segment of an utterance.
            w = jnp.where(j_prev >= 0, w_big, uni_w)

            mu_pred, prec_pred = mu, pp
            delta = x - mu_pred
            maha = jnp.sum(delta * delta * prec_pred * dmask, axis=1,
                           keepdims=True)
            post = -0.5 * D * _LOG_2PI + 0.5 * lpp - 0.5 * maha
            logits = w + jnp.where(counts_f > 0.0, post, lp)
            logits = jnp.where(real, logits, NEG_INF)
            perturbed = jnp.where(
                jnp.isneginf(logits), NEG_INF, logits / temp + g
            )
            k_draw = jnp.argmax(perturbed, axis=2)[..., None]

            oh_draw = (lane_k == k_draw).astype(dtype)
            cnt_at = jnp.sum(oh_draw * counts_f, axis=2, keepdims=True)
            empty = jnp.where(jnp.logical_and(counts_f <= 0.0, real), 1.0, 0.0)
            any_empty = jnp.max(empty, axis=2, keepdims=True) > 0.0
            # First-empty via a tie-free min over lane indices: Mosaic's
            # native argmax breaks ties by LAST index (XLA: first), which
            # silently birthed the last empty slot on real TPUs.
            first_empty = jnp.min(
                jnp.where(empty > 0.0, lane_k, K_pad), axis=2, keepdims=True
            )
            k_new = jnp.where(
                cnt_at > 0.0, k_draw,
                jnp.where(any_empty, first_empty, K - 1),
            )

            oh = (lane_k == k_new).astype(dtype) * ok
            new_counts = counts_f + oh
            new_sumx = sumx + oh * x
            # Exact SELECT write-back (not add-of-difference) so the carried
            # tables stay bit-identical to the XLA fallback's .at[k].set
            # rows; see fixedvar_chain for the drift mechanism.
            sel = oh > 0.0
            cnt_row = jnp.sum(oh * new_counts, axis=2, keepdims=True)
            sx_row = jnp.sum(oh * new_sumx, axis=2, keepdims=True)
            mu_row_new, pp_row_new = derive(cnt_row, sx_row)
            new_mu = jnp.where(sel, mu_row_new, mu)
            new_pp = jnp.where(sel, pp_row_new, pp)
            safe = lambda r: jnp.where(  # noqa: E731
                jnp.logical_and(dmask > 0.0, r > 0.0), r, 1.0)
            t_new = jnp.sum(jnp.log(safe(pp_row_new)), axis=1, keepdims=True)
            new_lpp = jnp.where(sel, t_new, lpp)

            okb = ok > 0.0
            ks_ref[:, pl.ds(s, 1), :] = jnp.where(
                okb, k_new, -1
            ).astype(jnp.int32).reshape(-1, 1, 1)
            j_next = jnp.where(okb, k_new.astype(jnp.int32), j_prev)
            return new_counts, new_sumx, new_mu, new_pp, new_lpp, j_next

        counts0 = counts_ref[:]
        sumx0 = sumx_ref[:]
        mu0, pp0 = derive(counts0, sumx0)
        lpp0 = jnp.sum(
            jnp.log(jnp.where(dmask > 0.0, pp0, 1.0)), axis=1, keepdims=True
        )
        j0 = jnp.full((B_tile, 1, 1), -1, jnp.int32)
        ks_ref[:] = jnp.full((B_tile, S, 1), -1, jnp.int32)
        jax.lax.fori_loop(0, ns_ref[pl.program_id(0), 0], body,
                          (counts0, sumx0, mu0, pp0, lpp0, j0))

    temp_in = jnp.asarray(temp, dtype=dtype).reshape(1, 1)
    shared2 = lambda i: (0, 0)  # noqa: E731
    own3 = lambda i: (i, 0, 0)  # noqa: E731
    ks = pl.pallas_call(
        kernel,
        grid=(B_pad // B_tile,),
        in_specs=[
            pl.BlockSpec((1, 1), shared2, memory_space=pltpu.SMEM),
            pl.BlockSpec((B_pad // B_tile, 1), shared2,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((D_pad, 1), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, 1), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, 1), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((K_pad, K_pad), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, S, K_pad), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, K_pad), own3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, S, K_pad), own3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_tile, S, 1), own3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, S, 1), jnp.int32),
        interpret=interpret,
    )(temp_in, _tile_step_bounds(embeds, S, B, B_pad, B_tile),
      prec_c, prec0_c, p0m0_c, big, logp, okf, cj, xeT, gumb, counts_f,
      sumx, uni, oh_pi)
    ks = ks[:B, :, 0]
    return ks if inv is None else ks[inv]


def _lgamma_stirling(z):
    """log Gamma(z) for z > 0 via recurrence-lifted Stirling series.

    Mosaic does not lower ``lax.lgamma``; this composition of log/divide is
    accurate to ~1e-7 (f32-exact) for the half-integer arguments the
    Student-t degrees of freedom produce.  Lift z by 6 then apply the series.
    """
    shift = 0.0
    for i in range(6):
        shift = shift + jnp.log(z + i)
    z6 = z + 6.0
    inv = 1.0 / z6
    inv2 = inv * inv
    series = (
        (z6 - 0.5) * jnp.log(z6) - z6 + 0.5 * math.log(2.0 * math.pi)
        + inv * (1.0 / 12.0)
        - (inv * inv2) * (1.0 / 360.0)
        + (inv * inv2 * inv2) * (1.0 / 1260.0)
    )
    return series - shift


@functools.partial(
    jax.jit,
    static_argnames=("k_0", "v_0", "alpha", "K", "lms", "use_argmax",
                     "interpret", "stats_T"),
)
def diag_chain(embeds, Xe, log_prior_e, gumbel, counts, sum_x, sum_sq,
               m_0, k_0, v_0, S_0, temp,
               alpha: float, K: int, lms: float = 1.0,
               use_argmax: bool = False, interpret: bool = False,
               stats_T: bool = False):
    """Within-utterance assignment chains for the diagonal-covariance
    (normal-inverse-chi-squared) backend (reference
    ``gaussian_components_diag.py:237-259`` scoring inside the
    ``fbgmm.py:422-463`` chain).

    Same tiling/one-hot design as :func:`fixedvar_chain`; differences:
    ``sum_sq`` rides along in the carry, the predictive is a product of
    univariate Student's t densities (per-step ``log1p`` over [D, K] is
    inherent -- the location/scale depend on the query vector), and the
    count-dependent ``gammaln`` ratio is maintained incrementally with an
    in-kernel Stirling ``lgamma``.  ``stats_T``: as in
    :func:`fixedvar_chain` (``sum_x``/``sum_sq`` arrive [B, D, K]).
    """
    B, S = embeds.shape
    D = Xe.shape[-1]
    D_pad = _round_up(max(D, 8), 8)
    K_pad = _round_up(K, 128)
    B_tile = _pick_b_tile(
        4.0 * (S * K_pad + 8 * D_pad * K_pad + 2 * D_pad * S) * 1.5,
        8, B)
    B_pad = _round_up(B, B_tile)
    inv = None
    if B_pad // B_tile > 1:
        inv, (embeds, Xe, log_prior_e, gumbel, counts, sum_x, sum_sq) = (
            _length_sort(embeds, Xe, log_prior_e, gumbel, counts, sum_x,
                         sum_sq))
    dtype = Xe.dtype
    Kf = float(K)
    k0 = float(k_0)
    v0 = float(v_0)

    def bpad(a, fill=0):
        return jnp.pad(a, ((0, B_pad - B),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    xeT = bpad(jnp.pad(
        jnp.swapaxes(Xe, 1, 2), ((0, 0), (0, D_pad - D), (0, 0))
    ))
    gumb = bpad(jnp.pad(gumbel.astype(dtype), ((0, 0), (0, 0), (0, K_pad - K))))
    okf = bpad((embeds >= 0).astype(dtype)[:, None, :])
    logp = bpad(log_prior_e.astype(dtype)[:, None, :])
    counts_f = bpad(
        jnp.pad(counts.astype(dtype), ((0, 0), (0, K_pad - K)))[:, None, :]
    )

    def statpad(a):
        return bpad(jnp.pad(
            (a if stats_T else jnp.swapaxes(a, 1, 2)).astype(dtype),
            ((0, 0), (0, D_pad - D), (0, K_pad - K)),
        ))

    sumx = statpad(sum_x)
    sumsq = statpad(sum_sq)

    def colpad(v, fill):
        v = jnp.asarray(v, dtype)
        return jnp.pad(v, (0, D_pad - D), constant_values=fill)[:, None]

    m0_c = colpad(m_0, 0.0)               # [D_pad, 1]
    s0_c = colpad(S_0, 1.0)
    snp0_c = s0_c + k0 * m0_c * m0_c      # S_0 + k_0 m_0^2 (prior part)

    def kernel(temp_ref, ns_ref, m0_ref, snp0_ref, logp_ref, okf_ref,
               xe_ref, gumb_ref, counts_ref, sumx_ref, sumsq_ref,
               ks_ref):
        temp = temp_ref[0, 0]
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K_pad), 2)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
        dmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, D_pad, 1), 1) < D
        ).astype(dtype)
        real = lane_k < K
        m0 = m0_ref[:]
        snp0 = snp0_ref[:]

        def derive(cnt, sx, ssq):
            """m_n, var, v_n (gaussian_components_diag.py:169-176, :332-345).
            ``cnt`` [B_t, 1, K]; ``sx``/``ssq`` [B_t, D_pad, K]."""
            k_n = k0 + cnt
            v_n = v0 + cnt
            m_n = (k0 * m0 + sx) / k_n
            var = (k_n + 1.0) / (k_n * v_n) * (snp0 + ssq - k_n * m_n * m_n)
            return m_n, var, v_n

        def glr(v_n):
            """gammaln((v+1)/2) - gammaln(v/2)."""
            return _lgamma_stirling((v_n + 1.0) / 2.0) - _lgamma_stirling(
                v_n / 2.0
            )

        def body(s, carry):
            counts_f, sumx, sumsq, mu, var, lpv, gr = carry
            oh_lane = (lane_s == s).astype(dtype)
            x = jnp.sum(xe_ref[:] * oh_lane, axis=2, keepdims=True)
            # gumb has segment positions on sublanes: dynamic sublane
            # slice instead of a one-hot pass over [B_t, S, K_pad].
            g = gumb_ref[:, pl.ds(s, 1), :]
            ok = jnp.sum(okf_ref[:] * oh_lane, axis=2, keepdims=True)
            lp = jnp.sum(logp_ref[:] * oh_lane, axis=2, keepdims=True)

            v_n = v0 + counts_f
            delta = x - mu
            # Student-t sum of per-dim log1p as logs of stride-4 sublane-
            # group products (factors >= 1; a 4-dim group cannot overflow
            # f32 for any plausible ratio): one transcendental per GROUP.
            # The XLA twin (_diag_chain_xla_core) uses the same grouping
            # and multiply order so chains stay bit-identical.
            ratio = 1.0 + delta * delta / (var * v_n) * dmask  # pads -> 1
            pgrp = ratio[:, 0:4, :]
            for _g in range(1, D_pad // 4):
                pgrp = pgrp * ratio[:, 4 * _g:4 * (_g + 1), :]
            t1 = jnp.sum(jnp.log(pgrp), axis=1, keepdims=True)
            post = (
                D * (gr - 0.5 * jnp.log(v_n) - 0.5 * math.log(math.pi))
                - 0.5 * lpv
                - (v_n + 1.0) / 2.0 * t1
            )
            w = lms * jnp.log(alpha / Kf + counts_f)
            logits = w + jnp.where(counts_f > 0.0, post, lp)
            logits = jnp.where(real, logits, NEG_INF)
            if use_argmax:
                perturbed = logits
            else:
                perturbed = jnp.where(
                    jnp.isneginf(logits), NEG_INF, logits / temp + g
                )
            k_draw = jnp.argmax(perturbed, axis=2)[..., None]

            oh_draw = (lane_k == k_draw).astype(dtype)
            cnt_at = jnp.sum(oh_draw * counts_f, axis=2, keepdims=True)
            empty = jnp.where(jnp.logical_and(counts_f <= 0.0, real), 1.0, 0.0)
            any_empty = jnp.max(empty, axis=2, keepdims=True) > 0.0
            # First-empty via a tie-free min over lane indices: Mosaic's
            # native argmax breaks ties by LAST index (XLA: first), which
            # silently birthed the last empty slot on real TPUs.
            first_empty = jnp.min(
                jnp.where(empty > 0.0, lane_k, K_pad), axis=2, keepdims=True
            )
            k_new = jnp.where(
                cnt_at > 0.0, k_draw,
                jnp.where(any_empty, first_empty, K - 1),
            )

            oh = (lane_k == k_new).astype(dtype) * ok
            new_counts = counts_f + oh
            new_sumx = sumx + oh * x
            new_sumsq = sumsq + oh * (x * x)
            # Exact SELECT write-back (not add-of-difference) so the carried
            # tables stay bit-identical to the XLA twin's .at[k].set rows;
            # see fixedvar_chain for the drift mechanism.
            sel = oh > 0.0
            cnt_row = jnp.sum(oh * new_counts, axis=2, keepdims=True)
            sx_row = jnp.sum(oh * new_sumx, axis=2, keepdims=True)
            ssq_row = jnp.sum(oh * new_sumsq, axis=2, keepdims=True)
            mu_row_new, var_row_new, vn_row_new = derive(
                cnt_row, sx_row, ssq_row
            )
            new_mu = jnp.where(sel, mu_row_new, mu)
            new_var = jnp.where(sel, var_row_new, var)
            safe = lambda r: jnp.where(  # noqa: E731
                jnp.logical_and(dmask > 0.0, r > 0.0), r, 1.0)
            t_new = jnp.sum(jnp.log(safe(var_row_new)), axis=1, keepdims=True)
            new_lpv = jnp.where(sel, t_new, lpv)
            gr_row_new = glr(v0 + cnt_row)
            new_gr = jnp.where(sel, gr_row_new, gr)

            ks_ref[:, pl.ds(s, 1), :] = jnp.where(
                ok > 0.0, k_new, -1
            ).astype(jnp.int32).reshape(-1, 1, 1)
            return (new_counts, new_sumx, new_sumsq, new_mu, new_var,
                    new_lpv, new_gr)

        counts0 = counts_ref[:]
        sumx0 = sumx_ref[:]
        sumsq0 = sumsq_ref[:]
        mu0, var0_, _ = derive(counts0, sumx0, sumsq0)
        lpv0 = jnp.sum(
            jnp.log(jnp.where(dmask > 0.0, var0_, 1.0)), axis=1, keepdims=True
        )
        gr0 = glr(v0 + counts0)
        ks_ref[:] = jnp.full((B_tile, S, 1), -1, jnp.int32)
        jax.lax.fori_loop(
            0, ns_ref[pl.program_id(0), 0], body,
            (counts0, sumx0, sumsq0, mu0, var0_, lpv0, gr0)
        )

    temp_in = jnp.asarray(temp, dtype=dtype).reshape(1, 1)
    shared2 = lambda i: (0, 0)  # noqa: E731
    own3 = lambda i: (i, 0, 0)  # noqa: E731
    ks = pl.pallas_call(
        kernel,
        grid=(B_pad // B_tile,),
        in_specs=[
            pl.BlockSpec((1, 1), shared2, memory_space=pltpu.SMEM),
            pl.BlockSpec((B_pad // B_tile, 1), shared2,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((D_pad, 1), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, 1), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, S, K_pad), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, K_pad), own3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, K_pad), own3,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_tile, S, 1), own3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, S, 1), jnp.int32),
        interpret=interpret,
    )(temp_in, _tile_step_bounds(embeds, S, B, B_pad, B_tile),
      m0_c, snp0_c, logp, okf, xeT, gumb, counts_f, sumx, sumsq)
    ks = ks[:B, :, 0]
    return ks if inv is None else ks[inv]


def _diag_chain_xla_core(m_0, k0: float, v0: float, S_0, temp, K: int,
                         D: int, dtype, weight_fn, use_argmax: bool):
    """Shared scan body of the diag XLA chain twins: per-utterance carried
    tables (mu, var, log-prod-var, Stirling gammaln ratio) maintained with
    the SAME arithmetic composition as the Pallas ``diag_chain`` kernel, so
    both paths sample bit-identical chains by construction (no near-tie
    carve-out; see CLAUDE.md invariants).  ``weight_fn(counts_f, j_prev) ->
    [K]`` supplies the mixture-weight term and j_prev threading."""
    m0 = jnp.asarray(m_0, dtype)
    snp0 = jnp.asarray(S_0, dtype) + k0 * m0 * m0

    def derive(cnt, sx, ssq):
        k_n = k0 + cnt
        v_n = v0 + cnt
        m_n = (k0 * m0 + sx) / k_n
        var = (k_n + 1.0) / (k_n * v_n) * (snp0 + ssq - k_n * m_n * m_n)
        return m_n, var, v_n

    def glr(v_n):
        return _lgamma_stirling((v_n + 1.0) / 2.0) - _lgamma_stirling(
            v_n / 2.0
        )

    def one_chain(embeds_b, Xe_b, lpr_b, gumb_b, counts_b, sumx_b, sumsq_b):
        counts_f = counts_b.astype(dtype)
        mu0, var0, _ = derive(counts_f[:, None], sumx_b, sumsq_b)
        lpv0 = jnp.sum(jnp.log(var0), axis=-1)
        gr0 = glr(v0 + counts_f)

        def step(carry, inp):
            counts_f, sumx, sumsq, mu, var, lpv, gr, j_prev = carry
            e, x, lp, g = inp
            ok = e >= 0
            v_n = v0 + counts_f
            delta = x[None, :] - mu
            # The kernel's stride-4 sublane-group product composition
            # (pads are exact 1.0 factors), same multiply order, so the
            # chains remain bit-identical on shared noise.
            Dp = -(-max(D, 8) // 8) * 8
            ratio = jnp.pad(
                1.0 + delta * delta / (var * v_n[:, None]),
                ((0, 0), (0, Dp - D)), constant_values=1.0,
            ).reshape(-1, Dp // 4, 4)
            pgrp = ratio[:, 0, :]
            for _g in range(1, Dp // 4):
                pgrp = pgrp * ratio[:, _g, :]
            t1 = jnp.sum(jnp.log(pgrp), axis=-1)
            post = (
                D * (gr - 0.5 * jnp.log(v_n) - 0.5 * math.log(math.pi))
                - 0.5 * lpv
                - (v_n + 1.0) / 2.0 * t1
            )
            w = weight_fn(counts_f, j_prev)
            logits = w + jnp.where(counts_f > 0.0, post, lp)
            if use_argmax:
                k = jnp.argmax(logits)
            else:
                k = jnp.argmax(jnp.where(
                    jnp.isneginf(logits), NEG_INF, logits / temp + g
                ))
            # canonicalize_new_component (fbgmm.py:391-393).
            empty = counts_f <= 0.0
            k = jnp.where(
                counts_f[k] > 0.0, k,
                jnp.where(jnp.any(empty), jnp.argmax(empty), K - 1),
            )
            okf = ok.astype(dtype)
            counts_f = counts_f.at[k].add(okf)
            sumx = sumx.at[k].add(okf * x)
            sumsq = sumsq.at[k].add(okf * x * x)
            mu_row, var_row, _ = derive(counts_f[k], sumx[k], sumsq[k])
            # Exact row set, matching the kernels' exact SELECT write-back
            # (both paths keep every lane exactly derive(<integer stats>)).
            mu = mu.at[k].set(jnp.where(ok, mu_row, mu[k]))
            var = var.at[k].set(jnp.where(ok, var_row, var[k]))
            lpv = lpv.at[k].set(jnp.where(
                ok, jnp.sum(jnp.log(var_row), axis=-1), lpv[k]))
            gr = gr.at[k].set(jnp.where(ok, glr(v0 + counts_f[k]), gr[k]))
            j_prev = jnp.where(ok, k.astype(jnp.int32), j_prev)
            carry = (counts_f, sumx, sumsq, mu, var, lpv, gr, j_prev)
            return carry, jnp.where(ok, k.astype(jnp.int32), -1)

        init = (counts_f, sumx_b, sumsq_b, mu0, var0, lpv0, gr0,
                jnp.int32(-1))
        _, ks = jax.lax.scan(
            step, init, (embeds_b, Xe_b, lpr_b, gumb_b))
        return ks

    return one_chain


@functools.partial(
    jax.jit,
    static_argnames=("k_0", "v_0", "alpha", "K", "lms", "use_argmax"),
)
def diag_chain_xla(embeds, Xe, log_prior_e, gumbel, counts, sum_x, sum_sq,
                   m_0, k_0, v_0, S_0, temp,
                   alpha: float, K: int, lms: float = 1.0,
                   use_argmax: bool = False):
    """XLA twin of :func:`diag_chain` (same signature minus ``interpret``):
    the production fallback under GSPMD meshes.  Uses the kernel's Stirling
    lgamma and arithmetic groupings so the sampled chains are bit-identical
    to the Pallas kernel's (tests/test_pallas_chain.py asserts exact
    equality on shared noise)."""
    B, S, D = Xe.shape
    dtype = Xe.dtype
    Kf = float(K)
    lms_eff = float(lms)

    def weight_fn(counts_f, j_prev):  # noqa: ARG001
        return lms_eff * jnp.log(alpha / Kf + counts_f)

    one_chain = _diag_chain_xla_core(
        m_0, float(k_0), float(v_0), S_0, temp, K, D, dtype, weight_fn,
        use_argmax)
    return jax.vmap(one_chain)(
        embeds, Xe, log_prior_e.astype(dtype), gumbel.astype(dtype),
        counts, sum_x.astype(dtype), sum_sq.astype(dtype))


@functools.partial(
    jax.jit,
    static_argnames=("k_0", "v_0", "alpha_a", "intrp_lambda", "b_smooth",
                     "K", "lms"),
)
def bigram_diag_chain_xla(embeds, Xe, log_prior_e, gumbel, counts, sum_x,
                          sum_sq, m_0, k_0, v_0, S_0, temp,
                          uni_lo, big_table, corr_j, corr_i,
                          alpha_a: float, intrp_lambda: float,
                          b_smooth: float, K: int, lms: float = 1.0):
    """XLA twin of :func:`bigram_diag_chain` (same signature minus
    ``interpret``): Stirling-lgamma scoring + the bigram-LM weight algebra
    of the kernel, for bit-identical chains under GSPMD meshes."""
    B, S, D = Xe.shape
    dtype = Xe.dtype
    Kf = float(K)
    lam = float(intrp_lambda)
    a_s = float(alpha_a)
    b_s = float(b_smooth)
    lms_f = float(lms)

    def one_chain(embeds_b, Xe_b, lpr_b, gumb_b, counts_b, sumx_b, sumsq_b,
                  uni_b, cj_b, ohpi_b):
        uni_c = uni_b.astype(dtype)
        n_uni = jnp.sum(uni_c)
        uni_prob = (uni_c + a_s / Kf) / (n_uni + a_s)
        uni_w = lms_f * (jnp.log(uni_c + a_s / Kf) - jnp.log(n_uni + a_s))

        def weight_fn(counts_f, j_prev):  # noqa: ARG001
            j_s = jnp.maximum(j_prev, 0)
            row = big_table[j_s].astype(dtype)
            sel = (cj_b == j_s).astype(dtype)
            row = row - sel @ ohpi_b
            uni_j = uni_c[j_s]
            p_cond = lam * uni_prob + (1.0 - lam) * (
                (row) + b_s / Kf
            ) / (uni_j + b_s)
            return jnp.where(j_prev >= 0, lms_f * jnp.log(p_cond), uni_w)

        core = _diag_chain_xla_core(
            m_0, float(k_0), float(v_0), S_0, temp, K, D, dtype, weight_fn,
            False)
        return core(embeds_b, Xe_b, lpr_b, gumb_b, counts_b, sumx_b,
                    sumsq_b)

    ohpi = (
        jax.nn.one_hot(jnp.maximum(corr_i, 0), K, dtype=dtype)
        * ((corr_i >= 0) & (corr_j >= 0)).astype(dtype)[..., None]
    )
    return jax.vmap(one_chain)(
        embeds, Xe, log_prior_e.astype(dtype), gumbel.astype(dtype),
        counts, sum_x.astype(dtype), sum_sq.astype(dtype),
        uni_lo, corr_j, ohpi)


@functools.partial(
    jax.jit,
    static_argnames=("k_0", "v_0", "alpha_a", "intrp_lambda", "b_smooth",
                     "K", "lms", "interpret", "stats_T"),
)
def bigram_diag_chain(embeds, Xe, log_prior_e, gumbel, counts, sum_x, sum_sq,
                      m_0, k_0, v_0, S_0, temp,
                      uni_lo, big_table, corr_j, corr_i,
                      alpha_a: float, intrp_lambda: float, b_smooth: float,
                      K: int, lms: float = 1.0, interpret: bool = False,
                      stats_T: bool = False):
    """Bigram-conditioned assignment chains for the diagonal-covariance
    backend: :func:`diag_chain`'s normal-inverse-chi-squared scoring/update
    machinery with :func:`bigram_fixedvar_chain`'s smoothed-bigram-LM
    mixture weights (reference ``gibbs_sample_inside_loop_i_embed``,
    bigram_acoustic_wordseg.py:332-384, scoring
    gaussian_components_diag.py:237-259).

    Inputs are the union of the two kernels': diag statistics/prior
    (``sum_sq``, ``m_0``/``k_0``/``v_0``/``S_0``) plus the LM tables
    (``uni_lo`` [B, K] leave-out unigram counts, ``big_table`` [K, K] global
    bigram counts, ``corr_j``/``corr_i`` [B, S] the utterance's own OLD
    bigram pairs, removed from the conditioned row on the fly).

    Input invariant: every valid ``(corr_j, corr_i)`` pair must be counted
    in ``big_table`` (the driver passes the utterance's own transcript
    pairs, which the global LM table counts by construction).  Otherwise
    ``row - corr`` goes negative and ``log`` turns the logit NaN -- and
    Mosaic's and XLA's argmax disagree on NaN lanes, so the kernel and the
    XLA twin would sample different chains (measured round 4: an
    inconsistent random-table harness read 0.896 agreement; consistent
    tables read 1.000).  ``stats_T``: as in :func:`fixedvar_chain`
    (``sum_x``/``sum_sq`` arrive [B, D, K]).
    """
    B, S = embeds.shape
    D = Xe.shape[-1]
    D_pad = _round_up(max(D, 8), 8)
    K_pad = _round_up(K, 128)
    # budget 13.5 MB (like the fixedvar kernel): the default 12 MB only
    # fits 4-utterance tiles once the [K, K] shared LM table (4.2 MB at
    # K=1000) is charged -- half a vector register of sublanes per step and
    # a 32-program grid.  8-utterance tiles cost the SAME per step (both
    # pad to one 8-sublane register) with half the sequential programs.
    B_tile = _pick_b_tile(
        4.0 * (2 * S * K_pad + 9 * D_pad * K_pad + 2 * D_pad * S) * 1.5,
        8, B, shared_bytes=4.0 * K_pad * K_pad,
        budget=13.5 * 2 ** 20)
    B_pad = _round_up(B, B_tile)
    inv = None
    if B_pad // B_tile > 1:
        inv, (embeds, Xe, log_prior_e, gumbel, counts, sum_x, sum_sq,
              uni_lo, corr_j, corr_i) = _length_sort(
                  embeds, Xe, log_prior_e, gumbel, counts, sum_x, sum_sq,
                  uni_lo, corr_j, corr_i)
    dtype = Xe.dtype
    Kf = float(K)
    k0 = float(k_0)
    v0 = float(v_0)
    lam = float(intrp_lambda)
    a_s = float(alpha_a)
    b_s = float(b_smooth)
    lms_f = float(lms)

    def bpad(a, fill=0):
        return jnp.pad(a, ((0, B_pad - B),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    xeT = bpad(jnp.pad(
        jnp.swapaxes(Xe, 1, 2), ((0, 0), (0, D_pad - D), (0, 0))
    ))
    gumb = bpad(jnp.pad(gumbel.astype(dtype), ((0, 0), (0, 0), (0, K_pad - K))))
    okf = bpad((embeds >= 0).astype(dtype)[:, None, :])
    logp = bpad(log_prior_e.astype(dtype)[:, None, :])
    counts_f = bpad(
        jnp.pad(counts.astype(dtype), ((0, 0), (0, K_pad - K)))[:, None, :]
    )

    def statpad(a):
        return bpad(jnp.pad(
            (a if stats_T else jnp.swapaxes(a, 1, 2)).astype(dtype),
            ((0, 0), (0, D_pad - D), (0, K_pad - K)),
        ))

    sumx = statpad(sum_x)
    sumsq = statpad(sum_sq)
    uni = bpad(jnp.pad(uni_lo.astype(dtype),
                       ((0, 0), (0, K_pad - K)))[:, None, :])
    big = jnp.pad(big_table.astype(dtype),
                  ((0, K_pad - K), (0, K_pad - K)))
    oh_pi = (
        jax.nn.one_hot(jnp.maximum(corr_i, 0), K_pad, dtype=dtype)
        * ((corr_i >= 0) & (corr_j >= 0)).astype(dtype)[..., None]
    )
    oh_pi = bpad(oh_pi)
    cj = bpad(corr_j.astype(jnp.int32)[:, None, :])  # [B_pad, 1, S]

    def colpad(v, fill):
        v = jnp.asarray(v, dtype)
        return jnp.pad(v, (0, D_pad - D), constant_values=fill)[:, None]

    m0_c = colpad(m_0, 0.0)               # [D_pad, 1]
    s0_c = colpad(S_0, 1.0)
    snp0_c = s0_c + k0 * m0_c * m0_c      # S_0 + k_0 m_0^2 (prior part)

    def kernel(temp_ref, ns_ref, m0_ref, snp0_ref, big_ref, logp_ref,
               okf_ref, cj_ref, xe_ref, gumb_ref, counts_ref, sumx_ref,
               sumsq_ref, uni_ref, ohpi_ref, ks_ref):
        temp = temp_ref[0, 0]
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K_pad), 2)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
        dmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, D_pad, 1), 1) < D
        ).astype(dtype)
        real = lane_k < K
        realf = real.astype(dtype)
        m0 = m0_ref[:]
        snp0 = snp0_ref[:]

        uni_c = uni_ref[:]  # [B_t, 1, K_pad] leave-out unigram counts
        n_uni = jnp.sum(uni_c * realf, axis=2, keepdims=True)
        uni_prob = (uni_c + a_s / Kf) / (n_uni + a_s)
        uni_w = lms_f * (jnp.log(uni_c + a_s / Kf) - jnp.log(n_uni + a_s))

        def derive(cnt, sx, ssq):
            """m_n, var, v_n (gaussian_components_diag.py:169-176, :332-345)."""
            k_n = k0 + cnt
            v_n = v0 + cnt
            m_n = (k0 * m0 + sx) / k_n
            var = (k_n + 1.0) / (k_n * v_n) * (snp0 + ssq - k_n * m_n * m_n)
            return m_n, var, v_n

        def glr(v_n):
            """gammaln((v+1)/2) - gammaln(v/2)."""
            return _lgamma_stirling((v_n + 1.0) / 2.0) - _lgamma_stirling(
                v_n / 2.0
            )

        def body(s, carry):
            counts_f, sumx, sumsq, mu, var, lpv, gr, j_prev = carry
            oh_lane = (lane_s == s).astype(dtype)
            x = jnp.sum(xe_ref[:] * oh_lane, axis=2, keepdims=True)
            # gumb has segment positions on sublanes: dynamic sublane
            # slice instead of a one-hot pass over [B_t, S, K_pad].
            g = gumb_ref[:, pl.ds(s, 1), :]
            ok = jnp.sum(okf_ref[:] * oh_lane, axis=2, keepdims=True)
            lp = jnp.sum(logp_ref[:] * oh_lane, axis=2, keepdims=True)

            # LM weights conditioned on the previous component (one
            # [B_t, K] x [K, K] matvec on the MXU; see
            # bigram_fixedvar_chain for the correction algebra).
            j_s = jnp.maximum(j_prev, 0)  # [B_t, 1, 1] int32
            oh_j = (lane_k == j_s).astype(dtype)
            row = jax.lax.dot_general(
                oh_j[:, 0, :], big_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST,
            )[:, None, :]
            sel = (cj_ref[:] == j_s).astype(dtype)  # [B_t, 1, S]
            corr = jnp.sum(
                ohpi_ref[:] * jnp.swapaxes(sel, 1, 2), axis=1, keepdims=True
            )
            uni_j = jnp.sum(oh_j * uni_c, axis=2, keepdims=True)
            p_cond = lam * uni_prob + (1.0 - lam) * (
                (row - corr) + b_s / Kf
            ) / (uni_j + b_s)
            w_big = lms_f * jnp.log(p_cond)
            # Select (not blend): the unused branch can be NaN for the
            # first segment of an utterance.
            w = jnp.where(j_prev >= 0, w_big, uni_w)

            v_n = v0 + counts_f
            delta = x - mu
            # Student-t sum of per-dim log1p as logs of stride-4 sublane-
            # group products (factors >= 1; a 4-dim group cannot overflow
            # f32 for any plausible ratio): one transcendental per GROUP.
            # The XLA twin (_diag_chain_xla_core) uses the same grouping
            # and multiply order so chains stay bit-identical.
            ratio = 1.0 + delta * delta / (var * v_n) * dmask  # pads -> 1
            pgrp = ratio[:, 0:4, :]
            for _g in range(1, D_pad // 4):
                pgrp = pgrp * ratio[:, 4 * _g:4 * (_g + 1), :]
            t1 = jnp.sum(jnp.log(pgrp), axis=1, keepdims=True)
            post = (
                D * (gr - 0.5 * jnp.log(v_n) - 0.5 * math.log(math.pi))
                - 0.5 * lpv
                - (v_n + 1.0) / 2.0 * t1
            )
            logits = w + jnp.where(counts_f > 0.0, post, lp)
            logits = jnp.where(real, logits, NEG_INF)
            perturbed = jnp.where(
                jnp.isneginf(logits), NEG_INF, logits / temp + g
            )
            k_draw = jnp.argmax(perturbed, axis=2)[..., None]

            oh_draw = (lane_k == k_draw).astype(dtype)
            cnt_at = jnp.sum(oh_draw * counts_f, axis=2, keepdims=True)
            empty = jnp.where(jnp.logical_and(counts_f <= 0.0, real), 1.0, 0.0)
            any_empty = jnp.max(empty, axis=2, keepdims=True) > 0.0
            # First-empty via a tie-free min over lane indices: Mosaic's
            # native argmax breaks ties by LAST index (XLA: first).
            first_empty = jnp.min(
                jnp.where(empty > 0.0, lane_k, K_pad), axis=2, keepdims=True
            )
            k_new = jnp.where(
                cnt_at > 0.0, k_draw,
                jnp.where(any_empty, first_empty, K - 1),
            )

            oh = (lane_k == k_new).astype(dtype) * ok
            new_counts = counts_f + oh
            new_sumx = sumx + oh * x
            new_sumsq = sumsq + oh * (x * x)
            # Exact SELECT write-back (not add-of-difference) so the carried
            # tables stay bit-identical to the XLA twin's .at[k].set rows;
            # see fixedvar_chain for the drift mechanism.
            sel = oh > 0.0
            cnt_row = jnp.sum(oh * new_counts, axis=2, keepdims=True)
            sx_row = jnp.sum(oh * new_sumx, axis=2, keepdims=True)
            ssq_row = jnp.sum(oh * new_sumsq, axis=2, keepdims=True)
            mu_row_new, var_row_new, _ = derive(cnt_row, sx_row, ssq_row)
            new_mu = jnp.where(sel, mu_row_new, mu)
            new_var = jnp.where(sel, var_row_new, var)
            safe = lambda r: jnp.where(  # noqa: E731
                jnp.logical_and(dmask > 0.0, r > 0.0), r, 1.0)
            t_new = jnp.sum(jnp.log(safe(var_row_new)), axis=1, keepdims=True)
            new_lpv = jnp.where(sel, t_new, lpv)
            gr_row_new = glr(v0 + cnt_row)
            new_gr = jnp.where(sel, gr_row_new, gr)

            okb = ok > 0.0
            ks_ref[:, pl.ds(s, 1), :] = jnp.where(
                okb, k_new, -1
            ).astype(jnp.int32).reshape(-1, 1, 1)
            j_next = jnp.where(okb, k_new.astype(jnp.int32), j_prev)
            return (new_counts, new_sumx, new_sumsq, new_mu, new_var,
                    new_lpv, new_gr, j_next)

        counts0 = counts_ref[:]
        sumx0 = sumx_ref[:]
        sumsq0 = sumsq_ref[:]
        mu0, var0_, _ = derive(counts0, sumx0, sumsq0)
        lpv0 = jnp.sum(
            jnp.log(jnp.where(dmask > 0.0, var0_, 1.0)), axis=1, keepdims=True
        )
        gr0 = glr(v0 + counts0)
        j0 = jnp.full((B_tile, 1, 1), -1, jnp.int32)
        ks_ref[:] = jnp.full((B_tile, S, 1), -1, jnp.int32)
        jax.lax.fori_loop(
            0, ns_ref[pl.program_id(0), 0], body,
            (counts0, sumx0, sumsq0, mu0, var0_, lpv0, gr0, j0)
        )

    temp_in = jnp.asarray(temp, dtype=dtype).reshape(1, 1)
    shared2 = lambda i: (0, 0)  # noqa: E731
    own3 = lambda i: (i, 0, 0)  # noqa: E731
    ks = pl.pallas_call(
        kernel,
        grid=(B_pad // B_tile,),
        in_specs=[
            pl.BlockSpec((1, 1), shared2, memory_space=pltpu.SMEM),
            pl.BlockSpec((B_pad // B_tile, 1), shared2,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((D_pad, 1), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D_pad, 1), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((K_pad, K_pad), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, S), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, S, K_pad), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, K_pad), own3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, K_pad), own3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, S, K_pad), own3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_tile, S, 1), own3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, S, 1), jnp.int32),
        interpret=interpret,
    )(temp_in, _tile_step_bounds(embeds, S, B, B_pad, B_tile),
      m0_c, snp0_c, big, logp, okf, cj, xeT, gumb, counts_f, sumx,
      sumsq, uni, oh_pi)
    ks = ks[:B, :, 0]
    return ks if inv is None else ks[inv]


@functools.partial(
    jax.jit,
    static_argnames=("k_0", "v_0", "alpha", "K", "lms", "use_argmax",
                     "interpret", "lm_params"),
)
def fullcov_chain_pallas(embeds, Xe, log_prior_e, gumbel, base_scores,
                         lo_counts, slot_cnt0, t_m0, t_invP0, t_ldP0,
                         tk0, g_m, g_invP, g_ldP, k_0, v_0, temp,
                         alpha: float, K: int, lms: float = 1.0,
                         use_argmax: bool = False, interpret: bool = False,
                         uni_lo=None, big_table=None, corr_j=None,
                         corr_i=None, lm_params=None):
    """Within-utterance assignment chains for the full-covariance (NIW)
    backend: the Pallas twin of ``segmenters.fullcov.fullcov_chain``
    (reference conditioning ``fbgmm.py:422-463``; predictive math
    ``gaussian_components.py:228-251``).

    Layout differs from the fixed/diag kernels: the chain's live state is the
    per-utterance TOUCHED-SLOT table (T = S_old + S_new slots), kept with
    slots on *sublanes* and the feature dimension on lanes:

      * ``t_m``    [B_t, T, D]      slot posterior means
      * ``t_invP`` [B_t, T, D*D]    slot inverse UNSCALED scale matrices,
                                    flattened row-major (static lane blocks)
      * ``t_ldP``  [B_t, T, 1]      slot log-determinants of P
      * ``OH``     [B_t, T, K_pad]  slot -> component one-hot rows; the
                                    per-step correction scatter is one
                                    sublane-reduction of ``OH * c``

    Per step: the slot corrections need one ``invP @ (x - m)`` matvec per
    slot (D static-lane-block fused multiply-reduces); the Sherman-Morrison
    rank-1 update runs in ROW form on the chosen slot's extracted factors
    (claimed slots pull their global P-factors with one-hot matmuls against
    the [K_pad, .] tables on the MXU), so each slot table sees exactly one
    masked write pass.  Scores of untouched components come from the
    precomputed ``base_scores`` (global predictive parameters), exactly like
    the XLA chain.  The chain loop runs to the tile's actual max segment
    count (SMEM scalar), not the static S bound.

    The count-dependent ``gammaln`` ratio uses the in-kernel Stirling
    composition (see ``_lgamma_stirling``), which the XLA fallback
    (``segmenters.fullcov.fullcov_chain``) shares op-for-op, so both paths
    sample bit-identical chains on hardware (benchmarks/kernel_parity_tpu.py;
    exact gammaln stays in the log_marg metrics path).

    Parameters
    ----------
    embeds : [B, S] int32 new-segment embedding ids (-1 pads).
    Xe : [B, S, D]; log_prior_e : [B, S]; gumbel / base_scores : [B, S, K].
    lo_counts : [B, K] leave-one-utterance-out counts.
    slot_cnt0 / t_m0 / t_invP0 / t_ldP0 / tk0 : [B, T0, ...] touched-slot
        tables in P-form (T0 = S_old; ``segmenters.fullcov.params_to_P``).
    g_m / g_invP / g_ldP : [K, D] / [K, D, D] / [K] global P-form tables.
    k_0, v_0 : static NIW prior scalars.

    Bigram mode (``lm_params`` given): the collapsed-Dirichlet mixture-weight
    term is replaced by the smoothed interpolated bigram LM conditioned on
    the previous segment's sampled component, exactly as in
    :func:`bigram_fixedvar_chain` (reference
    ``gibbs_sample_inside_loop_i_embed``, bigram_acoustic_wordseg.py:332-384).
    ``lm_params = (alpha_a, intrp_lambda, b_smooth)`` static scalars;
    ``uni_lo`` [B, K] leave-out unigram counts, ``big_table`` [K, K] global
    bigram counts, ``corr_j``/``corr_i`` [B, S] the utterance's own OLD
    pairs (removed from the conditioned row on the fly); ``alpha`` is unused.
    Every valid pair must be counted in ``big_table`` or the logits go NaN,
    where Mosaic/XLA argmax semantics differ (see :func:`bigram_diag_chain`).
    """
    B, S, D = Xe.shape
    DD = D * D
    T0 = tk0.shape[1]
    T = _round_up(T0 + S, 8)
    K_pad = _round_up(K, 128)
    bigram = lm_params is not None
    # Per-utterance VMEM: gumbel+base [S, K_pad] x2 (+ohpi in bigram mode),
    # ONE slot one-hot table [T, K_pad], the slot factor tables
    # [T, DD+D+3], and [K_pad]-vectors -- measured-accurate accounting (the
    # old 3*T*K_pad estimate triple-counted OH and pinned B_tile at 8; the
    # chain is sequential-program-latency bound, so halving the program
    # count by fitting 16 utterances/tile cut the full-NIW sweep ~25%).
    # cap 16: 24-utterance tiles FIT the budget at benchmark scale (grid
    # 8 -> 6 programs) but measured SLOWER (4.73 -> 5.74 ms/sweep, round 5)
    # -- the wider tile's per-step vector work grows faster than the
    # program count shrinks, so 16 is the measured fixed point, not a
    # VMEM bound.
    B_tile = _pick_b_tile(
        4.0 * ((2 + bigram) * S * K_pad + T * K_pad
               + T * (DD + D + 3) + 4 * K_pad) * 1.3,
        16, B,
        shared_bytes=4.0 * K_pad * (256 + 128 + 1 + bigram * K_pad))
    B_pad = _round_up(B, B_tile)
    inv = None
    if B_pad // B_tile > 1:
        per_utt = (embeds, Xe, log_prior_e, gumbel, base_scores, lo_counts,
                   slot_cnt0, t_m0, t_invP0, t_ldP0, tk0)
        if bigram:
            per_utt += (uni_lo, corr_j, corr_i)
        inv, per_utt = _length_sort(*per_utt)
        (embeds, Xe, log_prior_e, gumbel, base_scores, lo_counts,
         slot_cnt0, t_m0, t_invP0, t_ldP0, tk0) = per_utt[:11]
        if bigram:
            uni_lo, corr_j, corr_i = per_utt[11:]
    dtype = Xe.dtype
    Kf = float(K)
    k0 = float(k_0)
    v0 = float(v_0)

    def bpad(a, fill=0):
        return jnp.pad(a, ((0, B_pad - B),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    def tpad(a, fill=0.0):
        return jnp.pad(a, ((0, 0), (0, T - T0)) + ((0, 0),) * (a.ndim - 2),
                       constant_values=fill)

    # Per-step tensors: segment positions on sublanes.
    xe = bpad(Xe.astype(dtype))                                # [B, S, D]
    okf = bpad((embeds >= 0).astype(dtype)[:, :, None])        # [B, S, 1]
    logp = bpad(log_prior_e.astype(dtype)[:, :, None])         # [B, S, 1]
    gumb = bpad(jnp.pad(gumbel.astype(dtype),
                        ((0, 0), (0, 0), (0, K_pad - K))))     # [B, S, K_pad]
    base = bpad(jnp.pad(base_scores.astype(dtype),
                        ((0, 0), (0, 0), (0, K_pad - K))))
    counts_f = bpad(jnp.pad(lo_counts.astype(dtype),
                            ((0, 0), (0, K_pad - K)))[:, None, :])

    # Touched-slot tables, padded to T slots (extra slots free).
    slot_cnt = bpad(tpad(slot_cnt0.astype(dtype)[:, :, None]))  # [B, T, 1]
    t_m = bpad(tpad(t_m0.astype(dtype)))                        # [B, T, D]
    t_invP = bpad(tpad(t_invP0.astype(dtype).reshape(B, T0, DD)))
    t_ldP = bpad(tpad(t_ldP0.astype(dtype)[:, :, None]))
    live0 = (tk0 >= 0)
    slot_free = bpad(tpad((~live0).astype(dtype)[:, :, None], fill=1.0))
    oh0 = jax.nn.one_hot(
        jnp.where(live0, tk0, K_pad), K_pad, dtype=dtype
    )  # dead slots -> all-zero rows
    OH = bpad(tpad(oh0))                                        # [B, T, K_pad]
    tmask = jnp.sum(OH, axis=1, keepdims=True)                  # [B, 1, K_pad]

    # Global P-form tables (shared across the grid).
    g_m_in = jnp.pad(g_m.astype(dtype), ((0, K_pad - K), (0, 0)))
    g_invP_in = jnp.pad(g_invP.astype(dtype).reshape(K, DD),
                        ((0, K_pad - K), (0, 0)))
    g_ldP_in = jnp.pad(g_ldP.astype(dtype), (0, K_pad - K))[None, :]

    ns_in = _tile_step_bounds(embeds, S, B, B_pad, B_tile)

    # Bigram-LM conditioning tables (see the docstring; segment positions
    # on sublanes to match this kernel's layout).  The old-pair tables have
    # their OWN slot count S_c (= S_old, which equals S in the driver but
    # not necessarily in general).
    if bigram:
        a_s, lam, b_s = (float(p) for p in lm_params)
        S_c = corr_j.shape[1]
        uni_in = bpad(jnp.pad(uni_lo.astype(dtype),
                              ((0, 0), (0, K_pad - K)))[:, None, :])
        big_in = jnp.pad(big_table.astype(dtype),
                         ((0, K_pad - K), (0, K_pad - K)))
        ohpi_in = bpad(
            jax.nn.one_hot(jnp.maximum(corr_i, 0), K_pad, dtype=dtype)
            * ((corr_i >= 0) & (corr_j >= 0)).astype(dtype)[..., None]
        )                                                   # [B, S_c, K_pad]
        cj_in = bpad(corr_j.astype(jnp.int32)[:, :, None])  # [B, S_c, 1]

    def kernel(temp_ref, ns_ref, g_m_ref, g_invP_ref, g_ld_ref, xe_ref,
               okf_ref, logp_ref, gumb_ref, base_ref, counts_ref, scnt_ref,
               tm_ref, tiP_ref, tld_ref, free_ref, oh_ref, tmask_ref,
               *rest):
        if bigram:
            uni_ref, big_ref, cj_ref, ohpi_ref, ks_ref = rest
        else:
            (ks_ref,) = rest
        temp = temp_ref[0, 0]
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K_pad), 2)
        sub_t = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
        real = lane_k < K
        if bigram:
            uni_c = uni_ref[:]  # [B_t, 1, K_pad] leave-out unigram counts
            realf = real.astype(dtype)
            n_uni = jnp.sum(uni_c * realf, axis=2, keepdims=True)
            uni_prob = (uni_c + a_s / Kf) / (n_uni + a_s)
            uni_w = lms * (jnp.log(uni_c + a_s / Kf) - jnp.log(n_uni + a_s))

        def glr(v):
            """gammaln((v + D) / 2) - gammaln(v / 2), Stirling."""
            return _lgamma_stirling((v + D) / 2.0) - _lgamma_stirling(v / 2.0)

        def matvec_slots(tiP, delta):
            """U[t, d] = sum_e invP[t, d, e] delta[t, e] over all slots:
            D static lane-block multiply-reduces."""
            cols = []
            for d in range(D):
                blk = tiP[:, :, d * D:(d + 1) * D]       # [B_t, T, D]
                cols.append(jnp.sum(blk * delta, axis=2, keepdims=True))
            return jnp.concatenate(cols, axis=2)          # [B_t, T, D]

        def body(s, carry):
            if bigram:
                (counts_f, scnt, t_m, t_invP, t_ldP, free, OH, tmask,
                 j_prev) = carry
            else:
                counts_f, scnt, t_m, t_invP, t_ldP, free, OH, tmask = carry
            # This kernel's layout puts segment positions on SUBLANES, so
            # the current step's rows are dynamic sublane slices -- no
            # per-step one-hot multiply-reduce passes over the full
            # [B_t, S, K_pad] tensors (worth ~10% of the full-NIW sweep).
            x = xe_ref[:, pl.ds(s, 1), :]                 # [B_t, 1, D]
            ok = okf_ref[:, pl.ds(s, 1), :]               # [B_t, 1, 1]
            lp = logp_ref[:, pl.ds(s, 1), :]
            g = gumb_ref[:, pl.ds(s, 1), :]               # [B_t, 1, K_pad]
            b_row = base_ref[:, pl.ds(s, 1), :]

            # --- exact leave-out corrections for the touched slots -------- #
            delta = x - t_m                               # [B_t, T, D]
            U = matvec_slots(t_invP, delta)
            mahaP = jnp.maximum(
                jnp.sum(U * delta, axis=2, keepdims=True), 0.0
            )                                             # [B_t, T, 1]
            k_n = k0 + scnt
            v_t = v0 + scnt - D + 1.0
            s_t = (k_n + 1.0) / (k_n * v_t)
            maha = mahaP / s_t
            ld_t = t_ldP + D * jnp.log(s_t)
            c = (
                glr(v_t)
                - 0.5 * D * (jnp.log(v_t) + math.log(math.pi))
                - 0.5 * ld_t
                - 0.5 * (v_t + D) * jnp.log1p(maha / v_t)
            )                                             # [B_t, T, 1]
            corr = jnp.sum(OH * c, axis=1, keepdims=True)  # [B_t, 1, K_pad]
            post = jnp.where(tmask > 0.0, corr, b_row)

            if bigram:
                # Smoothed interpolated bigram conditional given the previous
                # sampled component (see bigram_fixedvar_chain).
                j_s = jnp.maximum(j_prev, 0)              # [B_t, 1, 1]
                oh_j = (lane_k == j_s).astype(dtype)      # [B_t, 1, K_pad]
                row = jax.lax.dot_general(
                    oh_j[:, 0, :], big_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )[:, None, :]
                sel = (cj_ref[:] == j_s).astype(dtype)    # [B_t, S, 1]
                corr_lm = jnp.sum(ohpi_ref[:] * sel, axis=1, keepdims=True)
                uni_j = jnp.sum(oh_j * uni_c, axis=2, keepdims=True)
                p_cond = lam * uni_prob + (1.0 - lam) * (
                    (row - corr_lm) + b_s / Kf
                ) / (uni_j + b_s)
                # Select (not blend): the unused branch can be NaN for the
                # first segment of an utterance.
                w = jnp.where(j_prev >= 0, lms * jnp.log(p_cond), uni_w)
            else:
                w = lms * jnp.log(alpha / Kf + counts_f)
            logits = w + jnp.where(counts_f > 0.0, post, lp)
            logits = jnp.where(real, logits, NEG_INF)
            if use_argmax:
                perturbed = logits
            else:
                perturbed = jnp.where(
                    jnp.isneginf(logits), NEG_INF, logits / temp + g
                )
            k_draw = jnp.argmax(perturbed, axis=2)[..., None]

            oh_draw = (lane_k == k_draw).astype(dtype)
            cnt_at = jnp.sum(oh_draw * counts_f, axis=2, keepdims=True)
            empty = jnp.where(jnp.logical_and(counts_f <= 0.0, real), 1.0, 0.0)
            any_empty = jnp.max(empty, axis=2, keepdims=True) > 0.0
            # First-empty via a tie-free min over lane indices: Mosaic's
            # native argmax breaks ties by LAST index (XLA: first), which
            # silently birthed the last empty slot on real TPUs.
            first_empty = jnp.min(
                jnp.where(empty > 0.0, lane_k, K_pad), axis=2, keepdims=True
            )
            k_new = jnp.where(
                cnt_at > 0.0, k_draw,
                jnp.where(any_empty, first_empty, K - 1),
            )
            oh_k = (lane_k == k_new).astype(dtype)        # [B_t, 1, K_pad]

            # --- slot choice: reuse the component's slot or claim a free -- #
            have = jnp.sum(oh_k * tmask, axis=2, keepdims=True)  # [B_t,1,1]
            oh_exist = jnp.sum(OH * oh_k, axis=2, keepdims=True)  # [B_t,T,1]
            free_idx = jnp.min(
                jnp.where(free > 0.0, sub_t, T + 1), axis=1, keepdims=True
            )
            oh_new = (sub_t == free_idx).astype(dtype)
            oh_slot = jnp.where(have > 0.0, oh_exist, oh_new) * ok

            # Row extraction: the chosen slot's live factors, or -- for a
            # slot claimed this step -- the component's GLOBAL P-factors
            # (untouched leave-out == global), pulled with one-hot MXU
            # lookups.  All the update algebra then runs on [B_t, 1, .]
            # rows; the tables see exactly one masked write pass each.
            # HIGHEST: a one-hot row pull is then exact; Mosaic's default
            # bf16 pass quantized the pulled float factors (~1e-2 rel),
            # which is what made claimed-slot chains diverge from the XLA
            # twin on hardware.
            oh_k2 = oh_k[:, 0, :]                         # [B_t, K_pad]
            gm_row = jax.lax.dot_general(
                oh_k2, g_m_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST,
            )[:, None, :]                                 # [B_t, 1, D]
            giP_row = jax.lax.dot_general(
                oh_k2, g_invP_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST,
            )[:, None, :]                                 # [B_t, 1, DD]
            gld_row = jnp.sum(oh_k * g_ld_ref[:], axis=2, keepdims=True)
            cnt_row = jnp.sum(oh_k * counts_f, axis=2, keepdims=True)
            hav = have > 0.0
            m_row = jnp.where(
                hav, jnp.sum(oh_slot * t_m, axis=1, keepdims=True), gm_row)
            iP_row = jnp.where(
                hav, jnp.sum(oh_slot * t_invP, axis=1, keepdims=True),
                giP_row)
            ld_row = jnp.where(
                hav, jnp.sum(oh_slot * t_ldP, axis=1, keepdims=True),
                gld_row)

            # Rank-1 Sherman-Morrison on the extracted row (adding one
            # observation: P' = P + beta d d^T with beta = k_n/(k_n+1)).
            d_vec = x - m_row                             # [B_t, 1, D]
            u_cols = []
            for d in range(D):
                blk = iP_row[:, :, d * D:(d + 1) * D]
                u_cols.append(jnp.sum(blk * d_vec, axis=2, keepdims=True))
            u_vec = jnp.concatenate(u_cols, axis=2)       # [B_t, 1, D]
            dU = jnp.sum(u_vec * d_vec, axis=2, keepdims=True)
            k_n2 = k0 + cnt_row
            beta = k_n2 / (k_n2 + 1.0)
            denom = 1.0 + beta * dU
            denom = jnp.where(denom > 0.0, denom, 1.0)  # pad-step guard
            u_rep = jnp.concatenate([u_vec] * D, axis=2)  # lane d*D+e = u[e]
            u_tiled = jnp.concatenate(
                [jnp.broadcast_to(u_vec[:, :, d:d + 1],
                                  u_vec.shape[:2] + (D,))
                 for d in range(D)], axis=2,
            )                                             # lane d*D+e = u[d]
            iP_new = iP_row - (beta / denom) * (u_tiled * u_rep)
            ld_new = ld_row + jnp.log(denom)
            m_new = (k_n2 * m_row + x) / (k_n2 + 1.0)

            # One masked write pass per table (claim + update combined).
            not_slot = 1.0 - oh_slot
            t_m = t_m * not_slot + oh_slot * m_new
            t_invP = t_invP * not_slot + oh_slot * iP_new
            t_ldP = t_ldP * not_slot + oh_slot * ld_new
            scnt = scnt * not_slot + oh_slot * (cnt_row + 1.0)
            OH = OH * not_slot + oh_slot * oh_k
            tmask = jnp.maximum(tmask, oh_k * ok)
            free = free * not_slot
            counts_f = counts_f + oh_k * ok

            ks_ref[:, pl.ds(s, 1), :] = jnp.where(
                ok > 0.0, k_new, -1
            ).astype(jnp.int32).reshape(-1, 1, 1)
            if bigram:
                j_next = jnp.where(ok > 0.0, k_new.astype(jnp.int32), j_prev)
                return (counts_f, scnt, t_m, t_invP, t_ldP, free, OH, tmask,
                        j_next)
            return counts_f, scnt, t_m, t_invP, t_ldP, free, OH, tmask

        # Pad steps beyond the tile's longest segment list are skipped
        # entirely (utterances average far fewer segments than the static
        # S bound); their outputs are the -1 pre-fill.
        ks_ref[:] = jnp.full((B_tile, S, 1), -1, jnp.int32)
        init = (counts_ref[:], scnt_ref[:], tm_ref[:], tiP_ref[:],
                tld_ref[:], free_ref[:], oh_ref[:], tmask_ref[:])
        if bigram:
            init = init + (jnp.full((B_tile, 1, 1), -1, jnp.int32),)
        jax.lax.fori_loop(0, ns_ref[pl.program_id(0), 0], body, init)

    temp_in = jnp.asarray(temp, dtype=dtype).reshape(1, 1)
    shared2 = lambda i: (0, 0)  # noqa: E731
    own3 = lambda i: (i, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 1), shared2, memory_space=pltpu.SMEM),
        pl.BlockSpec((B_pad // B_tile, 1), shared2,
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((K_pad, D), shared2, memory_space=pltpu.VMEM),
        pl.BlockSpec((K_pad, DD), shared2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K_pad), shared2, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, S, D), own3, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, S, 1), own3, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, S, 1), own3, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, S, K_pad), own3, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, S, K_pad), own3, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, 1, K_pad), own3, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, T, 1), own3, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, T, D), own3, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, T, DD), own3, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, T, 1), own3, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, T, 1), own3, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, T, K_pad), own3, memory_space=pltpu.VMEM),
        pl.BlockSpec((B_tile, 1, K_pad), own3, memory_space=pltpu.VMEM),
    ]
    inputs = (temp_in, ns_in, g_m_in, g_invP_in, g_ldP_in, xe, okf, logp,
              gumb, base, counts_f, slot_cnt, t_m, t_invP, t_ldP, slot_free,
              OH, tmask)
    if bigram:
        in_specs += [
            pl.BlockSpec((B_tile, 1, K_pad), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K_pad, K_pad), shared2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, S_c, 1), own3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, S_c, K_pad), own3, memory_space=pltpu.VMEM),
        ]
        inputs = inputs + (uni_in, big_in, cj_in, ohpi_in)
    ks = pl.pallas_call(
        kernel,
        grid=(B_pad // B_tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B_tile, S, 1), own3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, S, 1), jnp.int32),
        interpret=interpret,
    )(*inputs)
    ks = ks[:B, :, 0]
    return ks if inv is None else ks[inv]
