"""Sufficient statistics as pure array reductions.

The reference maintains per-component sufficient statistics through
incremental, mutating ``add_item``/``del_item`` updates
(``gaussian_components.py:154-186`` and friends).  The TPU-native design keeps
a single universal statistics pytree per component store

    counts [K]      -- number of items assigned to each slot
    sum_x  [K, D]   -- sum of the member data vectors
    sum_sq [K, D]   -- sum of squares per dimension (fixed / diag), or
           [K, D, D]   sum of outer products (full covariance)

and *derives* it from the flat assignment vector with ``segment_sum`` -- a
single fully-parallel scatter-add instead of N sequential updates.  Component
"deletion" (reference swap-with-last compaction,
``gaussian_components.py:188-205``) becomes masking on ``counts > 0``; no
relabelling ever happens, which keeps every array statically shaped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SuffStats(NamedTuple):
    counts: jnp.ndarray  # [K] int32
    sum_x: jnp.ndarray  # [K, D]
    sum_sq: jnp.ndarray  # [K, D] or [K, D, D]


def item_sq(x: jnp.ndarray, full_cov: bool) -> jnp.ndarray:
    """Per-item second-moment contribution: x**2 (diag) or outer(x, x) (full)."""
    if full_cov:
        return x[..., :, None] * x[..., None, :]
    return x * x


def suff_stats_from_assignments(
    X: jnp.ndarray, assignments: jnp.ndarray, K_max: int, full_cov: bool = False
) -> SuffStats:
    """Compute all component statistics from the assignment vector at once.

    Unassigned items are marked ``-1`` (reference convention,
    ``gaussian_components.py:98``) and contribute to no component: they are
    routed to scatter slot ``K_max`` which is dropped.
    """
    seg = jnp.where(assignments < 0, K_max, assignments)
    if X.shape[0] * K_max <= (1 << 20):
        # Small problems (the 2-D toy's blocked sweep rebuilds stats every
        # sweep): TPU scatter-adds serialize ~35 us each, while the one-hot
        # contraction is one trivial MXU matmul.  Gated by the one-hot's
        # memory footprint; the pad column (seg == K_max) is all-zero.
        oh = (seg[:, None] == jnp.arange(K_max, dtype=seg.dtype)[None, :])
        ohf = oh.astype(X.dtype)
        counts = jnp.sum(oh.astype(jnp.int32), axis=0)
        hi = jax.lax.Precision.HIGHEST
        sum_x = jnp.matmul(ohf.T, X, precision=hi)
        sq = item_sq(X, full_cov)
        sum_sq = jnp.matmul(
            ohf.T, sq.reshape(sq.shape[0], -1), precision=hi
        ).reshape((K_max,) + sq.shape[1:])
        return SuffStats(counts=counts, sum_x=sum_x, sum_sq=sum_sq)
    ones = jnp.ones(X.shape[0], dtype=jnp.int32)
    counts = jax.ops.segment_sum(ones, seg, num_segments=K_max + 1)[:-1]
    sum_x = jax.ops.segment_sum(X, seg, num_segments=K_max + 1)[:-1]
    sum_sq = jax.ops.segment_sum(item_sq(X, full_cov), seg, num_segments=K_max + 1)[:-1]
    return SuffStats(counts=counts, sum_x=sum_x, sum_sq=sum_sq)


def empty_suff_stats(K_max: int, D: int, dtype, full_cov: bool = False) -> SuffStats:
    sq_shape = (K_max, D, D) if full_cov else (K_max, D)
    return SuffStats(
        counts=jnp.zeros((K_max,), jnp.int32),
        sum_x=jnp.zeros((K_max, D), dtype),
        sum_sq=jnp.zeros(sq_shape, dtype),
    )


def add_item(stats: SuffStats, x: jnp.ndarray, k, full_cov: bool = False, weight=1) -> SuffStats:
    """Pure functional add of one data vector to slot ``k``.

    ``weight`` may be 0 to make the update a no-op (for masking inside scans)
    or -1 to subtract (the reference ``del_item``).
    """
    w = jnp.asarray(weight)
    return SuffStats(
        counts=stats.counts.at[k].add(w.astype(stats.counts.dtype)),
        sum_x=stats.sum_x.at[k].add(w.astype(x.dtype) * x),
        sum_sq=stats.sum_sq.at[k].add(w.astype(x.dtype) * item_sq(x, full_cov)),
    )


def del_item(stats: SuffStats, x: jnp.ndarray, k, full_cov: bool = False, weight=1) -> SuffStats:
    return add_item(stats, x, k, full_cov=full_cov, weight=-jnp.asarray(weight))


def num_active(stats: SuffStats) -> jnp.ndarray:
    """Number of non-empty components -- the reference's dynamic ``K``."""
    return jnp.sum((stats.counts > 0).astype(jnp.int32))


def first_empty_slot(counts: jnp.ndarray) -> jnp.ndarray:
    """Index of the lowest empty component slot (or K_max - 1 if none).

    Mirrors the reference's "clamp k > K to K" rule (``fbgmm.py:391-393``):
    with compaction, slot ``K`` is always the first empty slot, so a draw that
    lands on *any* empty slot births the component in the first empty one.
    """
    empty = counts <= 0
    return jnp.where(jnp.any(empty), jnp.argmax(empty), counts.shape[0] - 1)


def canonicalize_new_component(counts: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Map a draw that landed on an empty slot to the first empty slot."""
    return jnp.where(counts[k] > 0, k, first_empty_slot(counts))


def decollide_new_items(counts: jnp.ndarray, k_new: jnp.ndarray) -> jnp.ndarray:
    """Give every item that drew an EMPTY slot its own distinct empty slot
    (rank order by item index -> empty slots in index order).

    The blocked per-item sweep draws all items against frozen counts; the
    reference's birth rule (first empty slot, ``fbgmm.py:391-393``) is
    correct for its sequential sampler but under a blocked sweep fuses
    every simultaneous new-component draw into ONE component -- a merge
    trap for non-adaptive covariances (see
    ``segmenters.common.decollide_new_components`` for the segmenter-level
    variant and the at-scale measurement).  Empty slots are exchangeable
    (identical weight alpha/K), so this deterministic relabeling leaves the
    per-item conditionals unchanged.  When creators outnumber empty slots
    the overflow keeps its drawn slot (graceful saturation).
    """
    K = counts.shape[0]
    empty = counts <= 0
    is_new = empty[k_new]
    rank = jnp.cumsum(is_new) - is_new
    n_empty = jnp.sum(empty)
    empty_order = jnp.argsort(jnp.where(empty, jnp.arange(K), K))
    tgt = empty_order[jnp.minimum(rank, K - 1)]
    return jnp.where(is_new & (rank < n_empty), tgt.astype(k_new.dtype),
                     k_new)
