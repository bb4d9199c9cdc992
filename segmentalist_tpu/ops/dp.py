"""Forward-filtering backward-sampling / Viterbi segmentation DP.

TPU-native re-design of the reference module-level DP functions
(``unigram_acoustic_wordseg.py:653-864`` and
``kmeans_acoustic_wordseg.py:449-555``).  The reference walks a packed
triangular score vector with Python loops and per-step Cython ``logsumexp`` /
``draw`` calls.  Here the recursion is decomposed so that only the forward
filter is sequential:

1. **Forward filter** over landmark positions with a static
   ``W = n_slices_max`` gather window -- one Pallas kernel with the alpha
   buffer in VMEM (``ops/pallas_dp.py``), or an equivalent ``fori_loop`` on
   non-TPU backends.
2. **Per-node backward sampling, fully parallel.**  The reference backward
   loop (``:709-751``) walks node-by-node, drawing each segment length from
   the windowed distribution.  Because each node's draw is independent of
   *which* nodes the walk visits, we draw a predecessor pointer ``p(v)`` for
   EVERY prefix length ``v`` simultaneously (one batched Gumbel-max), then
3. **extract the visited chain** ``length -> p(length) -> ...`` with a
   boolean transitive closure computed by ~log2(N) batched matrix squarings
   (MXU-friendly), instead of a sequential pointer chase.

Semantics matched to the reference:
  * the asymmetric ``[-n_slices_max : -(n_slices_min - 1)]`` window
    (``unigram_acoustic_wordseg.py:683, :693-699``);
  * annealed backward sampling (Gumbel-max replaces the Cython ``draw``);
  * the backtracking fallback that force-inserts a boundary when every
    candidate continuation is -inf (``:718-730``): an unsamplable node's
    pointer is ``p(v) = v - 1``, and a boundary is recorded at ``v - 1`` only
    for visited nodes that are samplable, are the sentence end, or are the
    start of a sampled segment.  (The reference's fallback re-check ignores
    the ``n_slices_min`` cut and then mis-offsets the drawn index by
    ``n_slices_min - 1``; we apply the cut consistently instead.)
  * the Viterbi twins replace logsumexp/draw with max/argmax, omit
    ``log_p_continue``, and break ties toward shorter segments
    (``:843-844``).

Score layout (see ``segmentalist_tpu.corpus``):
    scores[b, t, w] = score of the candidate segment that ends at landmark
    ``t`` (0-based) and covers ``w + 1`` slices; -inf marks invalid
    candidates.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .random import NEG_INF, logsumexp

Array = jnp.ndarray


def _rev_mask_scores(scores: Array, n_slices_min: int) -> Array:
    """Reverse the window axis and apply the ``n_slices_min`` cut.

    ``rev[b, t, j] = scores[b, t, W - 1 - j]`` corresponds to segment length
    ``len = W - j``, so window entry j pairs with predecessor ``alpha[t - W +
    j]`` (ascending predecessor order, as in the reference window slice).
    """
    W = scores.shape[-1]
    rev = scores[..., ::-1]
    if n_slices_min > 1:
        lens = W - jnp.arange(W)
        rev = jnp.where(lens >= n_slices_min, rev, NEG_INF)
    return rev


def _forward_xla(rev_scores: Array, lengths: Array, lpc, use_max: bool) -> Array:
    """Reference XLA forward filter: [B, W + N] alpha table (front pad -inf)."""
    B, N, W = rev_scores.shape
    ap = jnp.full((B, W + N), NEG_INF, dtype=rev_scores.dtype)
    ap = ap.at[:, W].set(0.0)
    sc = jnp.swapaxes(rev_scores, 0, 1)  # [N, B, W]

    def body(t, ap):
        window = jax.lax.dynamic_slice_in_dim(ap, t, W, axis=1)  # [B, W]
        row = jax.lax.dynamic_index_in_dim(sc, t - 1, axis=0, keepdims=False)
        logits = row + window
        if use_max:
            val = jnp.max(logits, axis=-1)
        else:
            val = logsumexp(logits, axis=-1) + lpc
        val = jnp.where(t < lengths, val, NEG_INF)
        return jax.lax.dynamic_update_slice_in_dim(
            ap, val[:, None], W + t, axis=1
        )

    return jax.lax.fori_loop(1, N, body, ap)


def _visited_closure(p: Array, lengths: Array) -> Array:
    """[B, N + 1] mask of nodes on the chain ``length -> p(length) -> ... -> 0``.

    Parallel pointer doubling: after round i the mask holds the first 2^i
    chain nodes and ``jump = p^(2^i)``, so ceil(log2(N + 1)) rounds of
    O(B * N) one-hot contractions cover the whole chain (``p`` is strictly
    decreasing for v >= 1 with p(0) = 0, so the chain has at most N + 1
    nodes).  Replaces an earlier boolean matrix-squaring closure that cost
    O(B * N^2) memory and O(B * N^3 * log N) flops.  The per-round
    propagate/compose steps ride one-hot matmuls rather than scatter/gather
    (TPU scatters serialize per index and this runs inside the sweep scan).
    Precision: the jump-composition einsum pulls node INDICES through f32
    and needs HIGHEST to stay exact below 2^24; the hit-propagation einsum
    tolerates the default (bf16-pass) precision because its operands are
    0/1 with f32 accumulation and the result is only thresholded at 0.5.
    """
    B, N1 = p.shape
    m = jnp.arange(N1)[None, :] == lengths.astype(jnp.int32)[:, None]
    jump = p
    for _ in range(max(1, math.ceil(math.log2(N1)))):
        oh = jax.nn.one_hot(jump, N1, dtype=jnp.float32)  # [B, z, u]
        hit = jnp.einsum("bz,bzu->bu", m.astype(jnp.float32), oh)
        m = m | (hit > 0.5)
        jump = jnp.einsum(
            "bzu,bu->bz", oh, jump.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
    return m


@functools.partial(
    jax.jit, static_argnames=("n_slices_min", "n_slices_max", "mode",
                              "use_pallas")
)
def segment_dp(scores: Array, lengths: Array, key: jax.Array,
               log_p_continue=0.0, anneal_temp=1.0,
               n_slices_min: int = 0, n_slices_max: int = 0,
               mode: str = "sample", use_pallas: bool | None = None
               ) -> Tuple[Array, Array]:
    """Batched segmentation DP.

    Parameters
    ----------
    scores : [B, N_max, W] candidate segment scores (see module docstring).
        W must equal ``n_slices_max`` (or the full N_max when 0).
    lengths : [B] utterance lengths in landmarks (0 allowed: no boundaries).
    key : PRNG key (ignored for mode="viterbi").
    mode : "sample" (FFBS, reference ``forward_backward``) or "viterbi"
        (reference ``forward_backward_viterbi`` / the k-means variant).
    use_pallas : force the Pallas forward kernel on/off (default: auto, TPU
        only).

    Returns
    -------
    (log_prob [B], boundaries [B, N_max] bool)
    """
    if mode not in ("sample", "viterbi"):
        raise ValueError(mode)
    B, N, W = scores.shape
    use_max = mode == "viterbi"
    n_min = max(int(n_slices_min), 0)
    dtype = scores.dtype
    lpc = jnp.asarray(log_p_continue, dtype=dtype)
    temp = jnp.asarray(anneal_temp, dtype=dtype)
    lengths = lengths.astype(jnp.int32)

    rev = _rev_mask_scores(scores, n_min)

    # ---- 1. forward filter --------------------------------------------- #
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .pallas_dp import forward_alphas

        alphas_pad = forward_alphas(
            rev, lengths, lpc, use_max=use_max,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        alphas_pad = _forward_xla(rev, lengths, lpc, use_max)

    # ---- 2. per-node backward draws (parallel over all nodes) ----------- #
    # Node v in 1..N: window logits[j] = rev[v-1, j] + alpha[v - W + j].
    v_idx = jnp.arange(1, N + 1)
    # window_alphas[b, v - 1, j] = alphas_pad[b, v + j]: W static shifted
    # slices, not an advanced-index gather (gathers are latency-bound
    # inside the sweep scan).
    window_alphas = jnp.stack(
        [alphas_pad[:, 1 + j: 1 + j + N] for j in range(W)], axis=-1
    )  # [B, N, W]
    node_logits = rev + window_alphas
    samplable = jnp.any(jnp.isfinite(node_logits), axis=-1)  # [B, N]

    if use_max:
        # Tie-break toward shorter segments: argmax over ascending w.
        pick_rev = jnp.argmax(node_logits[..., ::-1], axis=-1)
        pick = W - 1 - pick_rev
    else:
        scaled = jnp.where(jnp.isneginf(node_logits), NEG_INF,
                           node_logits / temp)
        g = jax.random.gumbel(key, scaled.shape, dtype=dtype)
        pick = jnp.argmax(
            jnp.where(jnp.isneginf(scaled), NEG_INF, scaled + g), axis=-1
        )

    k = (W - pick).astype(jnp.int32)  # chosen segment length per node
    # rev[..., pick] as select + max (no gather; -inf entries forbid the
    # multiply-by-one-hot form).
    contrib = jnp.max(
        jnp.where(jnp.arange(W) == pick[..., None], rev, NEG_INF), axis=-1
    )

    # Predecessor pointers over nodes 0..N (node 0 is absorbing).
    p_nodes = jnp.where(samplable, v_idx[None, :] - k, v_idx[None, :] - 1)
    p = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), p_nodes.astype(jnp.int32)], axis=1
    )  # [B, N + 1]

    # ---- 3. chain extraction via transitive closure --------------------- #
    visited = _visited_closure(p, lengths)  # [B, N + 1]
    samp0 = jnp.concatenate(
        [jnp.zeros((B, 1), bool), samplable], axis=1
    )  # [B, N + 1]

    # Start-of-sampled-segment nodes: z visited & samplable -> mark p(z).
    src = (visited & samp0).astype(jnp.float32)
    onehot_p = jax.nn.one_hot(p, N + 1, dtype=jnp.float32)
    seg_start = jnp.einsum("bz,bzv->bv", src, onehot_p) > 0.5

    is_end = jnp.arange(N + 1)[None, :] == lengths[:, None]
    bounded = visited & (samp0 | is_end | seg_start)
    boundaries = bounded[:, 1:]  # node v -> boundaries[v - 1]

    log_prob = jnp.sum(
        jnp.where(visited[:, 1:] & samplable, contrib, 0.0), axis=-1
    )
    return log_prob, boundaries
