"""segments_from_boundaries vs a direct python transcription of the
reference's get_segmented_landmark_indices (utterances.py:206-216)."""

import numpy as np
import jax.numpy as jnp

from segmentalist_tpu.segmenters.common import segments_from_boundaries


def _oracle(bounds, length):
    ends, ws = [], []
    j_prev = 0
    for j in range(length):
        if bounds[j]:
            ends.append(j)
            ws.append(j - j_prev)
            j_prev = j + 1
    return ends, ws


def test_segments_from_boundaries_matches_oracle():
    rng = np.random.RandomState(0)
    B, N_max = 17, 11
    lengths = rng.randint(0, N_max + 1, B)
    bounds = rng.rand(B, N_max) < 0.4
    segs = segments_from_boundaries(jnp.asarray(bounds), jnp.asarray(lengths))
    ends = np.asarray(segs.ends)
    ws = np.asarray(segs.ws)
    n = np.asarray(segs.n)
    for b in range(B):
        e_ref, w_ref = _oracle(bounds[b], lengths[b])
        assert n[b] == len(e_ref)
        assert list(ends[b][: n[b]]) == e_ref
        assert list(ws[b][: n[b]]) == w_ref
        assert np.all(ends[b][n[b]:] == -1)


def test_assign_slot_table_round_trip():
    """assign_rows_from_segments / select_assign_slots / materialize_
    assignments must reproduce the [N]-vector semantics exactly: the slot
    table is the compact per-utterance dual the fused chunks carry
    (round 5; see common.merge_assignments)."""
    import jax

    from segmentalist_tpu.segmenters.common import (
        assign_rows_from_segments, gather_segment_embeds,
        materialize_assignments, select_assign_slots)

    rng = np.random.RandomState(3)
    U, N_max, W = 13, 9, 4
    N = 600
    lengths = rng.randint(1, N_max + 1, U)
    bounds = rng.rand(U, N_max) < 0.5
    for u in range(U):  # every utterance ends with a boundary
        if lengths[u] > 0:
            bounds[u, lengths[u] - 1] = True
    # Unique stored ids per (utterance, slot); some slots missing (-1).
    seg_ids = -np.ones((U, N_max, W), np.int32)
    perm = rng.permutation(N)[: U * N_max * W]
    take = rng.rand(U, N_max, W) < 0.8
    seg_ids[take] = perm[: int(take.sum())]
    segs = None
    from segmentalist_tpu.segmenters.common import segments_from_boundaries

    segs = segments_from_boundaries(jnp.asarray(bounds), jnp.asarray(lengths))
    embeds = gather_segment_embeds(segs, jnp.asarray(seg_ids))
    ks = jnp.where(embeds >= 0,
                   jnp.asarray(rng.randint(0, 7, embeds.shape)), -1)

    M = N_max * W
    rows = assign_rows_from_segments(segs, ks, W, M)
    # Round trip: selecting the same segments' slots returns the same ks.
    sel = select_assign_slots(rows, segs, W)
    sel = jnp.where(embeds >= 0, sel, -1)
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(ks))

    # Materialize == scatter the (embed, k) pairs into a fresh -1 vector.
    vec = materialize_assignments(rows, jnp.asarray(seg_ids.reshape(U, M)),
                                  N)
    ref = -np.ones(N, np.int32)
    e_np, k_np = np.asarray(embeds), np.asarray(ks)
    ref[e_np[e_np >= 0]] = k_np[e_np >= 0]
    np.testing.assert_array_equal(np.asarray(vec), ref)
