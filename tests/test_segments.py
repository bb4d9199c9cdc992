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
