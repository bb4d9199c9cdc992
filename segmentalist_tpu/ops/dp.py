"""Forward-filtering backward-sampling / Viterbi segmentation DP.

TPU-native re-design of the reference module-level DP functions
(``unigram_acoustic_wordseg.py:653-864`` and
``kmeans_acoustic_wordseg.py:449-555``).  The reference walks a packed
triangular score vector with Python loops and per-step Cython ``logsumexp`` /
``draw`` calls; here the recursion is a ``lax.scan`` over landmark positions
with a static ``W = n_slices_max``-wide gather window, vmapped over a padded
batch of utterances.

Score layout (see ``segmentalist_tpu.corpus``):
    scores[b, t, w] = score of the candidate segment that ends at landmark
                      ``t`` (0-based) and covers ``w + 1`` slices.
    -inf marks invalid candidates (missing embeddings, masked durations,
    positions beyond the utterance length).

Semantics matched to the reference:
  * forward recursion over prefix lengths with the asymmetric
    ``[-n_slices_max : -(n_slices_min - 1)]`` window
    (``unigram_acoustic_wordseg.py:683, :693-699``);
  * backward sampling of segment lengths from the annealed, normalised window
    distribution (``:709-751``) -- Gumbel-max replaces the Cython ``draw``;
  * the backtracking fallback that force-inserts a boundary when every
    candidate continuation is -inf (``:718-730``).  (The reference's fallback
    re-check ignores the ``n_slices_min`` cut and then mis-offsets the drawn
    index by ``n_slices_min - 1``; we apply the cut consistently instead.)
  * the Viterbi twins replace logsumexp/draw with max/argmax and omit
    ``log_p_continue`` in the forward pass (``:801-815``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .random import NEG_INF, logsumexp

Array = jnp.ndarray


def _window_logits(scores_b, alphas_pad, t, W, n_slices_min):
    """Window of (segment score + predecessor alpha) at prefix length ``t``.

    Returns [W] vector ordered by predecessor index ascending: entry j
    corresponds to segment length ``len = W - j`` (segment [t-len : t]).
    """
    # alphas_pad[W + i] = alpha[i]; front padding is -inf so len > t masks out.
    window_alphas = jax.lax.dynamic_slice(alphas_pad, (t,), (W,))  # alpha[t-W .. t-1]
    # scores row for segments ending at landmark t-1: w = len - 1 = W - 1 - j.
    row = scores_b[t - 1]  # [W]; w index = length - 1
    window_scores = row[::-1]  # j -> w = W - 1 - j
    lens = (W - jnp.arange(W)).astype(jnp.int32)
    logits = window_scores + window_alphas
    logits = jnp.where(lens >= n_slices_min, logits, NEG_INF)
    return logits, lens


def _forward(scores_b, length, log_p_continue, n_slices_min, use_max):
    """Forward pass for one utterance.

    Returns alpha_pad [W + N_max]: alpha_pad[W + t] = log alpha at prefix
    length t (reference ``forward_backward`` forward loop,
    unigram_acoustic_wordseg.py:691-703).
    """
    N_max, W = scores_b.shape
    alphas_pad = jnp.full((W + N_max,), NEG_INF, dtype=scores_b.dtype)
    alphas_pad = alphas_pad.at[W].set(0.0)

    def body(t, alphas_pad):
        logits, _ = _window_logits(scores_b, alphas_pad, t, W, n_slices_min)
        if use_max:
            val = jnp.max(logits)
        else:
            val = logsumexp(logits) + log_p_continue
        val = jnp.where(t < length, val, NEG_INF)
        return alphas_pad.at[W + t].set(val)

    # Reference computes alpha[1 .. N-1]; alpha[N] is folded into backward.
    return jax.lax.fori_loop(1, N_max, body, alphas_pad)


def _backward(scores_b, alphas_pad, length, key, n_slices_min, anneal_temp,
              sample: bool):
    """Backward sampling / decoding for one utterance.

    Returns (log_prob, boundaries [N_max]).  Mirrors the reference backward
    loop (unigram_acoustic_wordseg.py:709-751) including the backtracking
    fallback.  Each scan step either consumes one sampled segment (t -= k) or
    backtracks one landmark (t -= 1), so N_max steps always suffice.
    """
    N_max, W = scores_b.shape
    boundaries = jnp.zeros((N_max,), dtype=bool)
    boundaries = boundaries.at[length - 1].set(True)

    def step(carry, key_t):
        t, pending, log_prob, boundaries = carry
        active = t > 0
        t_safe = jnp.maximum(t, 1)
        logits, lens = _window_logits(scores_b, alphas_pad, t_safe, W, n_slices_min)
        samplable = jnp.any(jnp.isfinite(logits))

        # Branch A: no valid continuation -> backtrack one landmark and
        # remember to insert a boundary at the first samplable point.
        do_backtrack = active & ~samplable

        # Branch B: sample / argmax a segment length k.
        if sample:
            scaled = jnp.where(jnp.isneginf(logits), NEG_INF, logits / anneal_temp)
            g = jax.random.gumbel(key_t, scaled.shape, dtype=scaled.dtype)
            pick = jnp.argmax(jnp.where(jnp.isneginf(scaled), NEG_INF, scaled + g))
        else:
            # Reference Viterbi argmaxes the *reversed* window and breaks ties
            # toward shorter segments (np.argmax on p_k[::-1],
            # unigram_acoustic_wordseg.py:843-844).
            rev = logits[::-1]
            pick_rev = jnp.argmax(rev)
            pick = W - 1 - pick_rev
        k = lens[pick]
        seg_score = scores_b[t_safe - 1, k - 1]

        do_sample = active & samplable
        # Pending boundary insertion from an earlier backtrack
        # (reference :730: boundaries[t - 1] = True at the samplable t).
        boundaries = boundaries.at[t_safe - 1].set(
            jnp.where(do_sample & pending, True, boundaries[t_safe - 1])
        )
        new_pending = jnp.where(do_backtrack, True,
                                jnp.where(do_sample, False, pending))
        log_prob = log_prob + jnp.where(do_sample, seg_score, 0.0)
        # Boundary at the segment start (reference :750) unless it is 0.
        start_idx = t_safe - k - 1
        put_boundary = do_sample & (start_idx >= 0)
        boundaries = boundaries.at[jnp.maximum(start_idx, 0)].set(
            jnp.where(put_boundary, True, boundaries[jnp.maximum(start_idx, 0)])
        )
        t_next = jnp.where(do_sample, t - k, jnp.where(do_backtrack, t - 1, t))
        return (t_next.astype(t.dtype), new_pending, log_prob, boundaries), None

    keys = jax.random.split(key, N_max)
    init = (length, jnp.bool_(False), jnp.zeros((), scores_b.dtype), boundaries)
    (t, _, log_prob, boundaries), _ = jax.lax.scan(step, init, keys)
    return log_prob, boundaries


@functools.partial(
    jax.jit, static_argnames=("n_slices_min", "n_slices_max", "mode")
)
def segment_dp(scores: Array, lengths: Array, key: jax.Array,
               log_p_continue=0.0, anneal_temp=1.0,
               n_slices_min: int = 0, n_slices_max: int = 0,
               mode: str = "sample") -> Tuple[Array, Array]:
    """Batched segmentation DP.

    Parameters
    ----------
    scores : [B, N_max, W] candidate segment scores (see module docstring).
        W must equal ``n_slices_max`` (or the full N_max when 0).
    lengths : [B] utterance lengths in landmarks.
    key : PRNG key (ignored for mode="viterbi").
    mode : "sample" (FFBS, reference ``forward_backward``) or "viterbi"
        (reference ``forward_backward_viterbi`` / the k-means variant).

    Returns
    -------
    (log_prob [B], boundaries [B, N_max] bool)
    """
    if mode not in ("sample", "viterbi"):
        raise ValueError(mode)
    B = scores.shape[0]
    use_max = mode == "viterbi"
    n_min = max(int(n_slices_min), 0)
    lpc = jnp.asarray(log_p_continue, dtype=scores.dtype)
    temp = jnp.asarray(anneal_temp, dtype=scores.dtype)

    def one(scores_b, length, key_b):
        alphas_pad = _forward(scores_b, length, lpc, n_min, use_max)
        return _backward(scores_b, alphas_pad, length, key_b, n_min, temp,
                         sample=not use_max)

    keys = jax.random.split(key, B)
    return jax.vmap(one)(scores, lengths, keys)
