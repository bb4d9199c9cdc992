"""Pallas TPU kernel for the segmentation-DP forward recursion.

The forward filter

    alpha[t] = logsumexp_j( rev_scores[t-1, j] + alpha[t - W + j] ) + lpc

is the only truly sequential piece of the segmentation DP (the backward pass
is sampled per-node in parallel, see ``ops/dp.py``).  Run as an XLA
``fori_loop`` it costs ~5 small kernels per landmark; here the whole
recursion runs inside ONE Pallas kernel with the alpha buffer resident in
VMEM, vectorised across utterances on the lane dimension.

Layout: time-major ``rev_scores [N, W, B]`` so each step reads a contiguous
``[W, B_tile]`` tile; utterances are tiled over lanes in blocks of 128.

Replaces the reference's per-landmark Cython ``logsumexp`` forward loop
(``unigram_acoustic_wordseg.py:691-703``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -jnp.inf

_LANES = 128

# Static-unroll bound for the forward recursion (steps, = N - 1).  This
# covers every current workload incl. the N=120 scaling benchmark; only
# longer utterances fall back to the dynamic fori_loop form, which bounds
# Mosaic compile time.
_UNROLL_MAX_STEPS = 127


def _forward_kernel(lpc_ref, sc_ref, len_ref, out_ref, *, N, W, use_max):
    # sc_ref  [N, W, LANES]  reversed, n_min-masked candidate scores
    # len_ref [1, LANES]     utterance lengths (int32)
    # out_ref [W + N, LANES] alpha, front-padded with W rows of -inf
    lengths = len_ref[0, :]
    lpc = lpc_ref[0, 0]

    def step_val(t, window):
        # window [W, LANES] = alpha[t-W .. t-1]
        logits = sc_ref[t - 1] + window
        m = jnp.max(logits, axis=0)
        if use_max:
            val = m
        else:
            m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
            val = (
                jnp.log(jnp.sum(jnp.exp(logits - m_safe[None, :]), axis=0))
                + m_safe
            )
            val = jnp.where(jnp.isneginf(m), NEG_INF, val) + lpc
        return jnp.where(t < lengths, val, NEG_INF)

    if N - 1 <= _UNROLL_MAX_STEPS:
        # Static unroll: every slice index is a compile-time constant, the
        # sliding alpha window lives in registers, and the whole alpha table
        # is written back in ONE store.  The dynamic fori_loop form below
        # measured ~14 us per step at [N=20, W=6, B=128] (dynamic sublane
        # slices + per-step row stores); the unrolled register form runs the
        # whole recursion in a few such steps.
        window = jnp.concatenate(
            [
                jnp.full((W - 1, _LANES), NEG_INF, dtype=out_ref.dtype),
                jnp.zeros((1, _LANES), dtype=out_ref.dtype),
            ]
        )
        rows = [jnp.zeros((_LANES,), dtype=out_ref.dtype)]  # alpha[0] = 0
        for t in range(1, N):
            val = step_val(t, window)
            rows.append(val)
            window = jnp.concatenate([window[1:], val[None, :]])
        out_ref[:] = jnp.concatenate(
            [jnp.full((W, _LANES), NEG_INF, dtype=out_ref.dtype),
             jnp.stack(rows)]
        )
    else:
        out_ref[:] = jnp.full((W + N, _LANES), NEG_INF, dtype=out_ref.dtype)
        out_ref[W, :] = jnp.zeros((_LANES,), dtype=out_ref.dtype)  # alpha[0]=0

        def body(t, _):
            window = out_ref[pl.ds(t, W), :]          # alpha[t-W .. t-1]
            val = step_val(t, window)
            out_ref[pl.ds(W + t, 1), :] = val[None, :]
            return 0

        jax.lax.fori_loop(1, N, body, 0)


@functools.partial(jax.jit, static_argnames=("use_max", "interpret"))
def forward_alphas(rev_scores, lengths, log_p_continue, use_max: bool = False,
                   interpret: bool = False):
    """Batched forward filter.

    Parameters
    ----------
    rev_scores : [B, N, W] reversed (+ n_min masked) scores:
        ``rev_scores[b, t, j] = scores[b, t, W - 1 - j] (+ mask)``.
    lengths : [B] int32.
    log_p_continue : scalar (ignored for ``use_max``).

    Returns
    -------
    alphas_pad : [B, W + N] with ``alphas_pad[:, W + t] = log alpha_t``.
    """
    B, N, W = rev_scores.shape
    dtype = rev_scores.dtype
    B_pad = -(-B // _LANES) * _LANES
    sc = jnp.transpose(rev_scores, (1, 2, 0))  # [N, W, B]
    sc = jnp.pad(sc, ((0, 0), (0, 0), (0, B_pad - B)), constant_values=NEG_INF)
    lens = jnp.pad(lengths.astype(jnp.int32), (0, B_pad - B))[None, :]
    lpc = jnp.asarray(log_p_continue, dtype=dtype).reshape(1, 1)

    grid = (B_pad // _LANES,)
    out = pl.pallas_call(
        functools.partial(_forward_kernel, N=N, W=W, use_max=use_max),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((N, W, _LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W + N, _LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W + N, B_pad), dtype),
        interpret=interpret,
    )(lpc, sc, lens)
    return out[:, :B].T  # [B, W + N]
