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

Fixed-variance backend only (the flagship configuration); diag/full use the
XLA scan fallback in ``segmenters/unigram.py``.
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
_B_TILE = 16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("alpha", "K", "lms", "use_argmax", "interpret"),
)
def fixedvar_chain(embeds, Xe, log_prior_e, gumbel, counts, sum_x,
                   var, var_0, mu_0, temp,
                   alpha: float, K: int, lms: float = 1.0,
                   use_argmax: bool = False, interpret: bool = False):
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

    Returns
    -------
    ks : [B, S] int32 sampled component of each segment (-1 pads).
    """
    B, S, D = Xe.shape
    D_pad = _round_up(max(D, 8), 8)
    K_pad = _round_up(K, 128)
    B_tile = min(_B_TILE, _round_up(B, 8))
    B_pad = _round_up(B, B_tile)
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
    sumx = bpad(jnp.pad(
        jnp.swapaxes(sum_x, 1, 2).astype(dtype),
        ((0, 0), (0, D_pad - D), (0, K_pad - K)),
    ))  # [B_pad, D_pad, K_pad]

    def colpad(v, fill):
        v = jnp.asarray(v, dtype)
        return jnp.pad(v, (0, D_pad - D), constant_values=fill)[:, None]

    prec_c = 1.0 / colpad(var, 1.0)     # [D_pad, 1]
    prec0_c = 1.0 / colpad(var_0, 1.0)
    p0m0_c = prec0_c * colpad(mu_0, 0.0)

    def kernel(temp_ref, prec_ref, prec0_ref, p0m0_ref, okf_ref,
               logp_ref, xe_ref, gumb_ref, counts_ref, sumx_ref, ks_ref):
        temp = temp_ref[0, 0]
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K_pad), 2)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
        sub_s = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1)
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
            oh_sub = (sub_s == s).astype(dtype)     # [1, S, 1]
            x = jnp.sum(xe_ref[:] * oh_lane, axis=2, keepdims=True)
            g = jnp.sum(gumb_ref[:] * oh_sub, axis=1, keepdims=True)
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
            first_empty = jnp.argmax(empty, axis=2)[..., None]
            k_new = jnp.where(
                cnt_at > 0.0, k_draw,
                jnp.where(any_empty, first_empty, K - 1),
            )

            # Masked one-hot update of the sampled column.
            oh = (lane_k == k_new).astype(dtype) * ok  # [B_t, 1, K_pad]
            new_counts = counts_f + oh
            new_sumx = sumx + oh * x
            # Incremental predictive-parameter update: derive the changed
            # column only, scatter it back, and adjust the log-det term.
            cnt_row = jnp.sum(oh * new_counts, axis=2, keepdims=True)
            sx_row = jnp.sum(oh * new_sumx, axis=2, keepdims=True)
            mu_row_new, pp_row_new = derive(cnt_row, sx_row)
            mu_row_old = jnp.sum(oh * mu, axis=2, keepdims=True)
            pp_row_old = jnp.sum(oh * pp, axis=2, keepdims=True)
            new_mu = mu + oh * (mu_row_new - mu_row_old)
            new_pp = pp + oh * (pp_row_new - pp_row_old)
            safe = lambda r: jnp.where(  # noqa: E731  log(0) guard for pads
                jnp.logical_and(dmask > 0.0, r > 0.0), r, 1.0)
            t_new = jnp.sum(jnp.log(safe(pp_row_new)), axis=1, keepdims=True)
            t_old = jnp.sum(jnp.log(safe(pp_row_old)), axis=1, keepdims=True)
            new_lpp = lpp + oh * (t_new - t_old)

            ks_ref[:, pl.ds(s, 1), :] = jnp.where(
                ok > 0.0, k_new, -1
            ).astype(jnp.int32).reshape(-1, 1, 1)
            return new_counts, new_sumx, new_mu, new_pp, new_lpp

        counts0 = counts_ref[:]
        sumx0 = sumx_ref[:]
        mu0, pp0 = derive(counts0, sumx0)
        lpp0 = jnp.sum(
            jnp.log(jnp.where(dmask > 0.0, pp0, 1.0)), axis=1, keepdims=True
        )
        jax.lax.fori_loop(0, S, body, (counts0, sumx0, mu0, pp0, lpp0))

    temp_in = jnp.asarray(temp, dtype=dtype).reshape(1, 1)
    shared2 = lambda i: (0, 0)  # noqa: E731
    own3 = lambda i: (i, 0, 0)  # noqa: E731
    ks = pl.pallas_call(
        kernel,
        grid=(B_pad // B_tile,),
        in_specs=[
            pl.BlockSpec((1, 1), shared2, memory_space=pltpu.SMEM),
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
    )(temp_in, prec_c, prec0_c, p0m0_c, okf, logp, xeT, gumb,
      counts_f, sumx)
    return ks[:B, :, 0]
