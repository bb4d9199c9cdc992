"""Fused candidate-marginal scoring kernel (fixed-variance backend).

The unigram/bigram block step's hottest tensor is the [B, M, K] candidate
logits (B utterances x M = N_max*W candidate spans x K components): the
XLA path materialises it in HBM and walks it several times (predictive
matmul output, mixture-weight add, counts>0 select, logsumexp) -- ~60 MB
per pass at benchmark scale, ~40% of the sweep (PERFORMANCE.md stage
attribution).  This kernel computes

    log_margs[b, m] = logsumexp_k( w[b, k] + where(counts[b, k] > 0,
                          log_post_pred[b, m, k], prior_c[b, m]) )

with the [M, K] tile VMEM-resident per utterance: two MXU matmuls build the
Mahalanobis form ((x^2) @ prec^T - 2 x @ (mu prec)^T + const), the
mixture-weight/select/-inf-safe-logsumexp chain runs on the VPU, and only
the [B, M] result ever reaches HBM.  (Reference math: fbgmm.py:256-286 +
gaussian_components_fixedvar.py:242-253; the XLA twin is
``components_fixedvar.log_post_pred_batch`` + ``ops.random.logsumexp``.)

The reduction order over K differs from the XLA fallback's, so scores can
differ by f32 rounding (~1e-6): the DP's Gumbel-max draws may flip
near-ties vs the fallback.  Identical in distribution; same caveat class
as the diag chain kernel's Stirling lgamma (CLAUDE.md).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-jnp.inf)
_LOG_2PI = math.log(2.0 * math.pi)

# Candidate-tile size when a valid-prefix bound is supplied (see
# ``_prefix_plan``); env override for hardware tile sweeps.
_SCORE_M_TILE = int(os.environ.get("SEGTPU_SCORE_MT", "40"))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _prefix_plan(valid_m, B: int, M: int, M_tile: int, M_pad: int,
                 B_tile: int, B_pad: int, arrays):
    """Length-sorted utterance tiles + per-tile candidate-prefix bounds.

    The drivers lay candidates out as ``m = t * W + w`` with slot (t, w)
    valid only for ``t < N_u``, so an utterance's valid candidates are a
    PREFIX of length ``valid_m[u] = N_u * W``.  Utterances average about
    half the static ``N_max`` bound, so with corpus-ordered tiles every
    (utterance-tile, candidate-tile) program pays the block's tail max.
    Sorting utterances by prefix length (exact: each utterance's scores are
    independent) makes tiles length-homogeneous, and the kernels skip
    candidate tiles past the tile's own bound (the same trick as the chain
    kernels' dynamic step bounds, ``pallas_chain._tile_step_bounds``).

    Returns ``(inv, tile_max, arrays)``: the inverse permutation to unsort
    the [B, M] output rows, the [n_btiles, 1] int32 per-tile bound (SMEM
    scalars), and every [B, ...] input sorted along axis 0.  With
    ``valid_m=None`` the plan is a no-op bound of ``M`` on every tile.
    """
    n_bt = B_pad // B_tile
    if valid_m is None:
        return None, jnp.full((n_bt, 1), M, jnp.int32), arrays
    vm = jnp.minimum(valid_m.astype(jnp.int32), M)
    perm = jnp.argsort(-vm)
    inv = jnp.argsort(perm)
    arrays = tuple(a[perm] for a in arrays)
    vm_pad = jnp.pad(vm[perm], (0, B_pad - B))
    tile_max = jnp.max(vm_pad.reshape(n_bt, B_tile), axis=1)[:, None]
    return inv, tile_max, arrays


def _score_tiling(M: int, B: int, n_k_temps: int, D_pad: int, K_pad: int,
                  prefix: bool = False):
    """(M_tile, M_pad, B_tile, B_pad) such that the per-program footprint
    (the [M_t, K_pad] working tiles, which Mosaic does not reuse across the
    utterance loop's iterations, plus per-utterance inputs) stays within a
    ~12 MB scoped-VMEM budget: long utterances make M = N_max * W large
    enough that an untiled candidate axis OOMs the 16 MB limit.

    ``prefix=True`` (a ``valid_m`` bound was supplied) picks a finer
    candidate tile so whole tiles past each utterance tile's valid prefix
    can be skipped (``_prefix_plan``)."""
    if prefix:
        M_t = min(_round_up(M, 8), _round_up(_SCORE_M_TILE, 8))
    else:
        M_t = _round_up(M, 8) if M <= 256 else 128
    M_pad = _round_up(_round_up(M, 8), M_t)
    budget = 12 * 2 ** 20
    tile_fixed = 4.0 * n_k_temps * M_t * K_pad * 2.2
    per_utt = 4.0 * (2 * D_pad * K_pad + M_t * (D_pad + 2) + 4 * K_pad) * 2.2
    bt = min(16, _round_up(B, 8))
    while bt > 1 and tile_fixed + per_utt * bt > budget:
        bt //= 2
    return M_t, M_pad, max(bt, 1), _round_up(B, max(bt, 1))


def _fixedvar_dispatch(Xc, prior_c, precT_u, mpT_u, const_u, log_prod,
                       wvec, counts, K: int, interpret: bool,
                       valid_m=None):
    """Shared pallas_call for the fixed-variance scorer; parameter tables
    arrive already feature-major (``precT_u``/``mpT_u`` [B, D, K],
    ``const_u`` [B, K])."""
    B, M, D = Xc.shape
    dtype = Xc.dtype
    D_pad = _round_up(max(D, 8), 8)
    K_pad = _round_up(K, 128)
    M_tile, M_pad, B_tile, B_pad = _score_tiling(
        M, B, 2, D_pad, K_pad, prefix=valid_m is not None)
    inv_b, tile_max, (Xc, prior_c, precT_u, mpT_u, const_u, log_prod,
                      wvec, counts) = _prefix_plan(
        valid_m, B, M, M_tile, M_pad, B_tile, B_pad,
        (Xc, prior_c, precT_u, mpT_u, const_u, log_prod, wvec, counts))

    def bpad(a, fill=0):
        return jnp.pad(a, ((0, B_pad - B),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    xq = bpad(jnp.pad(Xc.astype(dtype),
                      ((0, 0), (0, M_pad - M), (0, D_pad - D))))
    pc_in = bpad(jnp.pad(prior_c.astype(dtype),
                         ((0, 0), (0, M_pad - M)))[:, :, None])
    precT = bpad(jnp.pad(precT_u.astype(dtype),
                         ((0, 0), (0, D_pad - D), (0, K_pad - K))))
    mpT = bpad(jnp.pad(mpT_u.astype(dtype),
                       ((0, 0), (0, D_pad - D), (0, K_pad - K))))
    const = bpad(jnp.pad(const_u.astype(dtype),
                         ((0, 0), (0, K_pad - K)))[:, None, :])
    w_in = bpad(jnp.pad(wvec.astype(dtype),
                        ((0, 0), (0, K_pad - K)))[:, None, :])
    cnt_in = bpad(jnp.pad(counts.astype(dtype),
                          ((0, 0), (0, K_pad - K)))[:, None, :])
    lp_in = bpad(jnp.pad(log_prod.astype(dtype),
                         ((0, 0), (0, K_pad - K)))[:, None, :])

    def kernel(mm_ref, xq_ref, pc_ref, precT_ref, mpT_ref, const_ref,
               w_ref, cnt_ref, lp_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j * M_tile < mm_ref[pl.program_id(0), 0])
        def _compute():
            lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, K_pad), 1)
            real = lane_k < K
            for u in range(B_tile):
                x = xq_ref[u]                      # [M_tile, D_pad]
                maha = (
                    jax.lax.dot_general(
                        x * x, precT_ref[u], (((1,), (0,)), ((), ())),
                        preferred_element_type=dtype,
                    )
                    - 2.0 * jax.lax.dot_general(
                        x, mpT_ref[u], (((1,), (0,)), ((), ())),
                        preferred_element_type=dtype,
                    )
                    + const_ref[u]
                )                                  # [M_tile, K_pad]
                post = -0.5 * D * _LOG_2PI + 0.5 * lp_ref[u] - 0.5 * maha
                logits = w_ref[u] + jnp.where(
                    cnt_ref[u] > 0.0, post, pc_ref[u]
                )
                logits = jnp.where(real, logits, NEG_INF)
                m = jnp.max(logits, axis=1, keepdims=True)
                m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
                s = jnp.sum(jnp.exp(logits - m_safe), axis=1, keepdims=True)
                out_ref[u] = jnp.where(
                    jnp.isneginf(m), NEG_INF, jnp.log(s) + m_safe
                )

        @pl.when(j * M_tile >= mm_ref[pl.program_id(0), 0])
        def _skip():  # dead prefix tail: every slot is masked downstream
            out_ref[...] = jnp.full((B_tile, M_tile, 1), NEG_INF, dtype)

    # Grid: utterance tiles (slow axis) x candidate tiles (fast axis); the
    # parameter blocks index only the utterance axis, so Mosaic keeps them
    # resident across the candidate tiles of the same utterances.
    bm = lambda i, j: (i, j, 0)  # noqa: E731
    bu = lambda i, j: (i, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B_pad // B_tile, M_pad // M_tile),
        in_specs=[
            pl.BlockSpec((B_pad // B_tile, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B_tile, M_tile, D_pad), bm,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, M_tile, 1), bm, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, K_pad), bu,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, K_pad), bu,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), bu, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), bu, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), bu, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), bu, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_tile, M_tile, 1), bm,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, M_pad, 1), dtype),
        interpret=interpret,
    )(tile_max, xq, pc_in, precT, mpT, const, w_in, cnt_in, lp_in)
    out = out[:B, :M, 0]
    return out if inv_b is None else out[inv_b]


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def fixedvar_log_margs(Xc, prior_c, mu_pred, prec_pred, log_prod, wvec,
                       counts, K: int, interpret: bool = False,
                       valid_m=None):
    """[B, M] collapsed candidate log marginals.

    Parameters
    ----------
    Xc : [B, M, D] candidate embedding vectors (garbage rows fine -- the
        caller masks invalid candidates afterwards).
    prior_c : [B, M] prior log-density of each candidate (empty-component
        branch).
    mu_pred, prec_pred : [B, K, D] per-utterance (leave-one-out) predictive
        parameters.
    log_prod : [B, K] sum_d log prec_pred.
    wvec : [B, K] mixture-weight term incl. denominator (log_weights).
    counts : [B, K] leave-one-out member counts.
    valid_m : optional [B] int32 -- each utterance's valid-candidate PREFIX
        length (``N_u * W``); candidate tiles past it are skipped and
        return NEG_INF (``_prefix_plan``).  Valid-slot scores are
        bit-identical to the unbounded call.
    """
    mp = mu_pred * prec_pred
    return _fixedvar_dispatch(
        Xc, prior_c, jnp.swapaxes(prec_pred, 1, 2), jnp.swapaxes(mp, 1, 2),
        jnp.sum(mu_pred * mp, -1), log_prod, wvec, counts, K, interpret,
        valid_m,
    )


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def fixedvar_log_margs_T(Xc, prior_c, mu_predT, prec_predT, wvec, counts,
                         K: int, interpret: bool = False, valid_m=None):
    """:func:`fixedvar_log_margs` with feature-major parameter tables
    (``mu_predT``/``prec_predT`` [B, D, K], e.g. from
    ``components_fixedvar.predictive_params_T``): the derived tables the
    kernel wants (prec^T, (mu prec)^T, sum_d mu^2 prec, sum_d log prec) are
    computed in the kernel's own layout, so XLA emits no [K, D] -> [D, K]
    relayout copies (~0.5 ms/sweep at flagship scale)."""
    mpT = mu_predT * prec_predT
    return _fixedvar_dispatch(
        Xc, prior_c, prec_predT, mpT, jnp.sum(mu_predT * mpT, axis=-2),
        jnp.sum(jnp.log(prec_predT), axis=-2), wvec, counts, K, interpret,
        valid_m,
    )


def _diag_dispatch(Xc, prior_c, muT_u, ivvT_u, log_prod_var, v, wvec,
                   counts, K: int, interpret: bool, valid_m=None):
    """Shared pallas_call for the diag scorer; parameter tables arrive
    already feature-major (``muT_u``/``ivvT_u`` [B, D, K], with ``ivvT_u``
    = inv_var / v)."""
    from jax.scipy.special import gammaln

    B, M, D = Xc.shape
    dtype = Xc.dtype
    D_pad = _round_up(max(D, 8), 8)
    K_pad = _round_up(K, 128)
    M_tile, M_pad, B_tile, B_pad = _score_tiling(
        M, B, 3, D_pad, K_pad, prefix=valid_m is not None)
    inv_b, tile_max, (Xc, prior_c, muT_u, ivvT_u, log_prod_var, v, wvec,
                      counts) = _prefix_plan(
        valid_m, B, M, M_tile, M_pad, B_tile, B_pad,
        (Xc, prior_c, muT_u, ivvT_u, log_prod_var, v, wvec, counts))

    def bpad(a, fill=0):
        return jnp.pad(a, ((0, B_pad - B),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    def vecpad(a):
        return bpad(jnp.pad(a.astype(dtype),
                            ((0, 0), (0, K_pad - K)))[:, None, :])

    xq = bpad(jnp.pad(Xc.astype(dtype),
                      ((0, 0), (0, M_pad - M), (0, D_pad - D))))
    pc_in = bpad(jnp.pad(prior_c.astype(dtype),
                         ((0, 0), (0, M_pad - M)))[:, :, None])
    muT = bpad(jnp.pad(muT_u.astype(dtype),
                       ((0, 0), (0, D_pad - D), (0, K_pad - K))))
    ivvT = bpad(jnp.pad(ivvT_u.astype(dtype),
                        ((0, 0), (0, D_pad - D), (0, K_pad - K))))
    # Count-dependent constants, exact gammaln (outside the kernel).
    const = vecpad(
        D * (gammaln((v + 1.0) / 2.0) - gammaln(v / 2.0)
             - 0.5 * jnp.log(v) - 0.5 * math.log(math.pi))
        - 0.5 * log_prod_var
    )
    vh = vecpad((v + 1.0) / 2.0)
    w_in = vecpad(wvec)
    cnt_in = vecpad(counts)

    def kernel(mm_ref, xq_ref, pc_ref, muT_ref, ivvT_ref, const_ref, vh_ref,
               w_ref, cnt_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j * M_tile < mm_ref[pl.program_id(0), 0])
        def _compute():
            lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, K_pad), 1)
            real = lane_k < K
            for u in range(B_tile):
                x = xq_ref[u]                          # [M_tile, D_pad]
                # Sum of per-dimension log1p as a log of grouped products:
                # each factor 1 + delta^2 * ivv >= 1, so a 4-dim group
                # product stays in f32 range unless a single dim reaches
                # ~1e9 (3e4 sigma); one transcendental per GROUP instead of
                # per dim cuts the kernel's dominant cost ~3x (log1p over
                # [M, K] x D was ~1.6G evaluations per flagship-scale
                # sweep).  Hardware deviation vs the exact composition is
                # ~3.3e-3 (Mosaic log error amplified by (v+1)/2 at large
                # counts): fine for the logsumexp'ed sampled marginals, but
                # deterministic-argmax consumers must not use this kernel
                # -- the unigram driver gates it off in Viterbi mode.
                acc = jnp.zeros((M_tile, K_pad), dtype)
                for d0 in range(0, D, 4):
                    prod = jnp.ones((M_tile, K_pad), dtype)
                    for d in range(d0, min(d0 + 4, D)):
                        xd = x[:, d:d + 1]             # [M_pad, 1]
                        mud = muT_ref[u][d:d + 1, :]   # [1, K_pad]
                        ivvd = ivvT_ref[u][d:d + 1, :]
                        delta = xd - mud
                        prod = prod * (1.0 + delta * delta * ivvd)
                    acc = acc + jnp.log(prod)
                post = const_ref[u] - vh_ref[u] * acc
                logits = w_ref[u] + jnp.where(
                    cnt_ref[u] > 0.0, post, pc_ref[u]
                )
                logits = jnp.where(real, logits, NEG_INF)
                m = jnp.max(logits, axis=1, keepdims=True)
                m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
                s = jnp.sum(jnp.exp(logits - m_safe), axis=1, keepdims=True)
                out_ref[u] = jnp.where(
                    jnp.isneginf(m), NEG_INF, jnp.log(s) + m_safe
                )

        @pl.when(j * M_tile >= mm_ref[pl.program_id(0), 0])
        def _skip():  # dead prefix tail: every slot is masked downstream
            out_ref[...] = jnp.full((B_tile, M_tile, 1), NEG_INF, dtype)

    bm = lambda i, j: (i, j, 0)  # noqa: E731
    bu = lambda i, j: (i, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B_pad // B_tile, M_pad // M_tile),
        in_specs=[
            pl.BlockSpec((B_pad // B_tile, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B_tile, M_tile, D_pad), bm,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, M_tile, 1), bm, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, K_pad), bu,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, D_pad, K_pad), bu,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), bu, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), bu, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), bu, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_tile, 1, K_pad), bu, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_tile, M_tile, 1), bm,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, M_pad, 1), dtype),
        interpret=interpret,
    )(tile_max, xq, pc_in, muT, ivvT, const, vh, w_in, cnt_in)
    out = out[:B, :M, 0]
    return out if inv_b is None else out[inv_b]


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def diag_log_margs(Xc, prior_c, mu, inv_var, log_prod_var, v, wvec,
                   counts, K: int, interpret: bool = False, valid_m=None):
    """[B, M] collapsed candidate log marginals, diagonal-covariance backend.

    The product-of-univariate-Student-t predictive
    (``components_diag._log_prod_students_t``; reference
    ``gaussian_components_diag.py:237-259, :347-360``) couples dimensions
    through a per-dimension ``log1p``, so the XLA path's [B, M, K, D]
    contraction is transcendental- and traffic-heavy.  Here the [M, K]
    accumulator stays VMEM-resident and the D-loop runs as static lane/
    sublane slices; the count-dependent gammaln constants are folded into a
    [B, K] vector OUTSIDE the kernel (exact gammaln -- unlike the diag
    *chain* kernel, no Stirling approximation is involved).

    Parameters: as :func:`fixedvar_log_margs`, with the diag predictive
    parameters (``mu`` / ``inv_var`` [B, K, D], ``log_prod_var`` / ``v``
    [B, K]).
    """
    return _diag_dispatch(
        Xc, prior_c, jnp.swapaxes(mu, 1, 2),
        jnp.swapaxes(inv_var / v[..., None], 1, 2),
        log_prod_var, v, wvec, counts, K, interpret, valid_m,
    )


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def diag_log_margs_T(Xc, prior_c, muT, inv_varT, log_prod_var, v, wvec,
                     counts, K: int, interpret: bool = False, valid_m=None):
    """:func:`diag_log_margs` with feature-major parameter tables
    (``muT``/``inv_varT`` [B, D, K], e.g. from
    ``components_diag.predictive_params_T``); the v-scaled inverse variance
    is derived in the kernel's own layout so XLA emits no [K, D] -> [D, K]
    relayout copies.  ``log_prod_var`` must come from
    ``predictive_params_T`` (computed from ``var``, not the rounded
    reciprocal) so the constant bit-matches the non-T path."""
    return _diag_dispatch(
        Xc, prior_c, muT, inv_varT / v[:, None, :],
        log_prod_var, v, wvec, counts, K, interpret, valid_m,
    )


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def fullcov_log_margs(Xc, prior_c, g_A2, g_A1, g_a0, g_ck, g_vinv, g_vh,
                      t_A2, t_A1, t_a0, t_ck, t_vinv, t_vh, t_oh, tmask,
                      wvec, counts, K: int, interpret: bool = False,
                      valid_m=None):
    """[B, M] collapsed candidate log marginals, full-covariance backend,
    with the exact touched-column corrections applied in-kernel.

    The XLA path materialises the [B, M, K] logits (global Student-t scores,
    then the per-utterance leave-out corrections scattered over <= S columns,
    then weights/select/logsumexp) -- ~6 ms/sweep of HBM traffic at benchmark
    scale.  Here everything runs per (utterance-tile, candidate-tile) with
    the [M_t, K] tile VMEM-resident:

      maha_g[m, k] = xx[m] @ A2[k] - 2 x[m] @ A1[k] + a0[k]
      post_g       = ck - vh * log1p(maha_g * vinv)          (Student-t)
      maha_t[m, t] = the same vs the <= S touched-slot tables
      post         = where(tmask, c_t scattered by the slot one-hot OH, post_g)
      out[m]       = logsumexp_k(w + where(counts > 0, post, prior_c))

    All Student-t constants (exact gammaln) are precomputed outside; the
    xx = x (x) x outer-product lanes are built in-kernel from static lane
    blocks; scatters ride one [M_t, S] x [S, K] one-hot MXU matmul.
    (Reference math: gaussian_components.py:228-251; the XLA twin is
    ``components_full.log_post_pred_batch`` +
    ``segmenters.fullcov.corrected_candidate_post``.)

    Parameters
    ----------
    g_* : global-parameter tables -- A2 [K, D*D] (inverse predictive scale)
        or SYMMETRIC-PACKED [K, D*(D+1)/2] (upper triangle row-major with
        off-diagonals doubled, ``segmenters.fullcov.fullcov_score_inputs``:
        x^T A x == xx_packed @ A2_packed since A is symmetric -- 169 -> 91
        contraction lanes at D=13, ~1.8x off the dominant HIGHEST matmul),
        A1 [K, D] (invC @ mu), a0/ck/vinv/vh [K] (constant, Student-t
        constant, 1/v, (v+D)/2).
    t_* : per-utterance touched-slot tables, [B, S, ...] / [B, S].
    t_oh : [B, S, K] slot -> component one-hot rows (dead slots all-zero).
    tmask : [B, K] union of the one-hot rows.
    """
    B, M, D = Xc.shape
    DD = g_A2.shape[-1]
    packed = DD == D * (D + 1) // 2
    assert packed or DD == D * D, (DD, D)
    S = t_A1.shape[1]
    dtype = Xc.dtype
    D_pad = _round_up(max(D, 8), 8)
    DD_pad = _round_up(DD, 8)
    S_pad = _round_up(S, 8)
    K_pad = _round_up(K, 128)
    # Own tiling accounting: unlike the fixed/diag kernels, the [DD, K]
    # parameter tables here are GLOBAL (one copy shared across the grid);
    # per-utterance state is only the touched-slot tables ([DD_pad, S_pad]
    # etc.) plus the slot one-hot [S_pad, K_pad] and a few [K_pad] vectors.
    # The generic ``_score_tiling`` charged the shared tables per utterance
    # and pinned B_tile at 2 -> ~63 sequential grid programs per block, each
    # paying its pipeline prologue (round-5 profile: the kernel ran at ~25%
    # of its HIGHEST-matmul floor).
    if valid_m is not None:
        M_tile = min(_round_up(M, 8), _round_up(_SCORE_M_TILE, 8))
    else:
        M_tile = _round_up(M, 8) if M <= 256 else 128
    M_pad = _round_up(_round_up(M, 8), M_tile)
    budget = 12 * 2 ** 20
    shared = 4.0 * ((DD_pad + D_pad) * K_pad + 6 * K_pad) * 1.2
    tile_fixed = 4.0 * 3 * M_tile * K_pad * 2.2
    per_utt = 4.0 * (M_tile * (D_pad + 2)
                     + (DD_pad + D_pad + 4) * S_pad
                     + S_pad * K_pad + 4 * K_pad) * 2.2
    B_tile = min(16, _round_up(B, 8))
    while B_tile > 1 and shared + tile_fixed + per_utt * B_tile > budget:
        B_tile //= 2
    B_tile = max(B_tile, 1)
    import os as _os  # tuning hook for benchmarks/kernel experiments

    B_tile = int(_os.environ.get("SEGTPU_FULLCOV_SCORE_BT", B_tile))
    B_pad = _round_up(B, B_tile)
    inv_b, tile_max, (Xc, prior_c, t_A2, t_A1, t_a0, t_ck, t_vinv, t_vh,
                      t_oh, tmask, wvec, counts) = _prefix_plan(
        valid_m, B, M, M_tile, M_pad, B_tile, B_pad,
        (Xc, prior_c, t_A2, t_A1, t_a0, t_ck, t_vinv, t_vh, t_oh, tmask,
         wvec, counts))

    def bpad(a, fill=0):
        return jnp.pad(a, ((0, B_pad - B),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    def kvec(a):
        return jnp.pad(a.astype(dtype), (0, K_pad - K))[None, :]

    xq = bpad(jnp.pad(Xc.astype(dtype),
                      ((0, 0), (0, M_pad - M), (0, D_pad - D))))
    pc_in = bpad(jnp.pad(prior_c.astype(dtype),
                         ((0, 0), (0, M_pad - M)))[:, :, None])
    # Global tables, transposed for the MXU (contraction dim on sublanes).
    gA2T = jnp.pad(g_A2.astype(dtype).T, ((0, DD_pad - DD), (0, K_pad - K)))
    gA1T = jnp.pad(g_A1.astype(dtype).T, ((0, D_pad - D), (0, K_pad - K)))
    ga0 = kvec(g_a0)
    gck = kvec(g_ck)
    gvinv = kvec(g_vinv)
    gvh = kvec(g_vh)
    # Touched tables: contraction dim on sublanes, slots on lanes.
    tA2T = bpad(jnp.pad(jnp.swapaxes(t_A2.astype(dtype), 1, 2),
                        ((0, 0), (0, DD_pad - DD), (0, S_pad - S))))
    tA1T = bpad(jnp.pad(jnp.swapaxes(t_A1.astype(dtype), 1, 2),
                        ((0, 0), (0, D_pad - D), (0, S_pad - S))))

    def svec(a):
        return bpad(jnp.pad(a.astype(dtype),
                            ((0, 0), (0, S_pad - S)))[:, None, :])

    ta0 = svec(t_a0)
    tck = svec(t_ck)
    tvinv = svec(t_vinv)
    tvh = svec(t_vh)
    oh_in = bpad(jnp.pad(t_oh.astype(dtype),
                         ((0, 0), (0, S_pad - S), (0, K_pad - K))))
    tm_in = bpad(jnp.pad(tmask.astype(dtype),
                         ((0, 0), (0, K_pad - K)))[:, None, :])
    w_in = bpad(jnp.pad(wvec.astype(dtype),
                        ((0, 0), (0, K_pad - K)))[:, None, :])
    cnt_in = bpad(jnp.pad(counts.astype(dtype),
                          ((0, 0), (0, K_pad - K)))[:, None, :])

    def kernel(mm_ref, xq_ref, pc_ref, gA2_ref, gA1_ref, ga0_ref, gck_ref,
               gvinv_ref, gvh_ref, tA2_ref, tA1_ref, ta0_ref, tck_ref,
               tvinv_ref, tvh_ref, oh_ref, tm_ref, w_ref, cnt_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j * M_tile >= mm_ref[pl.program_id(0), 0])
        def _skip():  # dead prefix tail: every slot is masked downstream
            out_ref[...] = jnp.full((B_tile, M_tile, 1), NEG_INF, dtype)

        @pl.when(j * M_tile < mm_ref[pl.program_id(0), 0])
        def _compute():
            _kernel_body(xq_ref, pc_ref, gA2_ref, gA1_ref, ga0_ref, gck_ref,
                         gvinv_ref, gvh_ref, tA2_ref, tA1_ref, ta0_ref,
                         tck_ref, tvinv_ref, tvh_ref, oh_ref, tm_ref, w_ref,
                         cnt_ref, out_ref)

    def _kernel_body(xq_ref, pc_ref, gA2_ref, gA1_ref, ga0_ref, gck_ref,
                     gvinv_ref, gvh_ref, tA2_ref, tA1_ref, ta0_ref, tck_ref,
                     tvinv_ref, tvh_ref, oh_ref, tm_ref, w_ref, cnt_ref,
                     out_ref):
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, K_pad), 1)
        real = lane_k < K
        for u in range(B_tile):
            x = xq_ref[u]                              # [M_t, D_pad]
            # Outer-product lanes from static lane blocks: full layout
            # xx[m, d*D+e] = x[m, d] x[m, e]; packed layout keeps only
            # e >= d (the tables carry the off-diagonal 2x).
            if packed:
                xx = jnp.concatenate(
                    [x[:, d:d + 1] * x[:, d:D] for d in range(D)], axis=1)
            else:
                xx = jnp.concatenate(
                    [x[:, d:d + 1] * x[:, :D] for d in range(D)], axis=1)
            xx = jnp.pad(xx, ((0, 0), (0, DD_pad - DD)))

            def maha_of(A2T, A1T, a0, prec):
                return (
                    jax.lax.dot_general(
                        xx, A2T, (((1,), (0,)), ((), ())),
                        preferred_element_type=dtype, precision=prec)
                    - 2.0 * jax.lax.dot_general(
                        x, A1T, (((1,), (0,)), ((), ())),
                        preferred_element_type=dtype, precision=prec)
                    + a0
                )

            # HIGHEST precision on both Mahalanobis dots: Mosaic's
            # default dot is a single bf16 pass (XLA's default on the same
            # contraction is effectively multi-pass; Mosaic supports only
            # DEFAULT and HIGHEST), and the quadratic xx terms are
            # cancellation-prone -- kernel-default precision measurably
            # degraded the sampled boundaries (F1 0.752 -> 0.723 with both
            # at default, -> 0.745 with only the touched corrections at
            # HIGHEST; 0.751 with both).
            maha_g = jnp.maximum(
                maha_of(gA2_ref[:], gA1_ref[:], ga0_ref[:],
                        jax.lax.Precision.HIGHEST), 0.0)
            post_g = gck_ref[:] - gvh_ref[:] * jnp.log1p(maha_g * gvinv_ref[:])
            maha_t = jnp.maximum(
                maha_of(tA2_ref[u], tA1_ref[u], ta0_ref[u],
                        jax.lax.Precision.HIGHEST), 0.0)
            c_t = tck_ref[u] - tvh_ref[u] * jnp.log1p(maha_t * tvinv_ref[u])
            # HIGHEST here too: a one-hot contraction is then exact (one
            # nonzero per output lane), whereas Mosaic's default bf16 pass
            # would quantize the touched-column corrections (~0.4% rel)
            # before the logsumexp; the [M_t, S_pad] x [S_pad, K_pad]
            # matmul is cheap so exactness is free.
            corr = jax.lax.dot_general(
                c_t, oh_ref[u], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST)  # [M_t, K_pad]
            post = jnp.where(tm_ref[u] > 0.0, corr, post_g)
            logits = w_ref[u] + jnp.where(cnt_ref[u] > 0.0, post, pc_ref[u])
            logits = jnp.where(real, logits, NEG_INF)
            m = jnp.max(logits, axis=1, keepdims=True)
            m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
            s = jnp.sum(jnp.exp(logits - m_safe), axis=1, keepdims=True)
            out_ref[u] = jnp.where(
                jnp.isneginf(m), NEG_INF, jnp.log(s) + m_safe
            )

    bm = lambda i, j: (i, j, 0)  # noqa: E731
    bu = lambda i, j: (i, 0, 0)  # noqa: E731
    sh = lambda i, j: (0, 0)  # noqa: E731
    vm = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(B_pad // B_tile, M_pad // M_tile),
        in_specs=[
            pl.BlockSpec((B_pad // B_tile, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B_tile, M_tile, D_pad), bm, memory_space=vm),
            pl.BlockSpec((B_tile, M_tile, 1), bm, memory_space=vm),
            pl.BlockSpec((DD_pad, K_pad), sh, memory_space=vm),
            pl.BlockSpec((D_pad, K_pad), sh, memory_space=vm),
            pl.BlockSpec((1, K_pad), sh, memory_space=vm),
            pl.BlockSpec((1, K_pad), sh, memory_space=vm),
            pl.BlockSpec((1, K_pad), sh, memory_space=vm),
            pl.BlockSpec((1, K_pad), sh, memory_space=vm),
            pl.BlockSpec((B_tile, DD_pad, S_pad), bu, memory_space=vm),
            pl.BlockSpec((B_tile, D_pad, S_pad), bu, memory_space=vm),
            pl.BlockSpec((B_tile, 1, S_pad), bu, memory_space=vm),
            pl.BlockSpec((B_tile, 1, S_pad), bu, memory_space=vm),
            pl.BlockSpec((B_tile, 1, S_pad), bu, memory_space=vm),
            pl.BlockSpec((B_tile, 1, S_pad), bu, memory_space=vm),
            pl.BlockSpec((B_tile, S_pad, K_pad), bu, memory_space=vm),
            pl.BlockSpec((B_tile, 1, K_pad), bu, memory_space=vm),
            pl.BlockSpec((B_tile, 1, K_pad), bu, memory_space=vm),
            pl.BlockSpec((B_tile, 1, K_pad), bu, memory_space=vm),
        ],
        out_specs=pl.BlockSpec((B_tile, M_tile, 1), bm, memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((B_pad, M_pad, 1), dtype),
        interpret=interpret,
    )(tile_max, xq, pc_in, gA2T, gA1T, ga0, gck, gvinv, gvh, tA2T, tA1T,
      ta0, tck, tvinv, tvh, oh_in, tm_in, w_in, cnt_in)
    out = out[:B, :M, 0]
    return out if inv_b is None else out[inv_b]
