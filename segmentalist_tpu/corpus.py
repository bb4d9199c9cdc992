"""Corpus / segmentation state (TPU-native re-design of ``utterances.py``).

The reference packs per-utterance candidate segments into triangular
``vec_ids`` rows of length N(N+1)/2 (``utterances.py:59-65, :91-93``).  The DP
only ever looks at a sliding window of at most ``n_slices_max`` predecessors
(``unigram_acoustic_wordseg.py:693-699``), so the TPU layout is *dense and
windowed*:

    seg_ids[u, t, w]       int32   embedding row id of the segment that ends
                                   at landmark index ``t`` and covers ``w + 1``
                                   slices (landmarks ``t - w .. t``); -1 if the
                                   span is out of range / not provided.
    seg_durations[u, t, w] float   duration (frames) of that segment; NaN if
                                   masked (e.g. below ``min_duration``,
                                   reference ``utterances.py:94-102``).

This turns the O(N^2) triangular scan into O(N * W) tensors whose leading
(utterance) dimension batches and shards cleanly.  The triangular host-side
arrays are also kept (numpy) for reference-API parity.

Boundary initialisation -- including the rejection-resampling constraint on
``n_slices_min/max`` (reference ``utterances.py:136-157``) -- is data-dependent
control flow and stays host-side, exactly as the build plan prescribes
(SURVEY.md section 7, hard part (e)).
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def tri_index(t_end_exclusive: int, start: int) -> int:
    """Index of span [start:t_end_exclusive) in a packed triangular row
    (reference ``utterances.py:59-65``)."""
    return t_end_exclusive * (t_end_exclusive - 1) // 2 + start


class Utterances:
    """A corpus of utterances for acoustic word segmentation
    (reference ``Utterances``, ``utterances.py:14-229``).

    Deals with all utterance segmentation variables and statistics but none of
    the acoustics.

    Parameters mirror the reference; ``rng`` is an optional
    ``np.random.RandomState`` for the random boundary initialisation
    (defaults to the global numpy RNG, like the reference).
    """

    def __init__(self, lengths, vec_ids, durations, landmarks,
                 seed_boundaries=None, p_boundary_init: float = 0.5,
                 n_slices_min: int = 0, n_slices_max: int = 6,
                 min_duration: int = 0,
                 rng: Optional[np.random.RandomState] = None):
        logger.info("Initializing")
        rand = rng if rng is not None else np.random

        assert list(lengths) == [len(i) for i in landmarks]
        self.lengths = list(int(x) for x in lengths)
        self.D = len(self.lengths)
        assert self.D == len(vec_ids)
        self.N_max = max(self.lengths)
        self.landmarks = landmarks
        self.n_slices_min = int(n_slices_min)
        self.n_slices_max = int(n_slices_max)

        T = self.N_max * (self.N_max + 1) // 2

        # Triangular host-side packing (reference utterances.py:91-102).
        self.vec_ids = -1 * np.ones((self.D, T), dtype=np.int64)
        for i_vec_id, vec_id in enumerate(vec_ids):
            self.vec_ids[i_vec_id, : len(vec_id)] = vec_id
        # The sweeps pull integer embedding ids with one-hot f32 MXU
        # contractions (segmenters/common.py::_gather2), exact only below
        # 2^24 (f32 mantissa).  Enforce the bound where the ids are first
        # known instead of silently corrupting them at extreme corpus scale.
        if self.vec_ids.max(initial=-1) >= 2 ** 24:
            raise ValueError(
                "embedding row ids >= 2**24 are unsupported: the sweep's "
                "one-hot f32 id pulls would quantize them (split the corpus)"
            )
        self.durations = np.full((self.D, T), np.nan, dtype=np.float64)
        for i_dur, duration_vec in enumerate(durations):
            duration_vec = np.asarray(duration_vec, dtype=np.float64)
            if not (min_duration == 0 or len(duration_vec) == 1):
                cur = duration_vec.copy()
                cur[cur < min_duration] = np.nan
                if np.all(np.isnan(cur)):
                    cur[np.argmax(duration_vec)] = np.max(duration_vec)
                duration_vec = cur
            self.durations[i_dur, : len(duration_vec)] = duration_vec

        # Boundary initialisation (reference utterances.py:104-157).
        self._boundaries = np.zeros((self.D, self.N_max), dtype=bool)
        if seed_boundaries is not None:
            logger.info("Initializing boundaries from seed")
            for i_utt, bounds in enumerate(seed_boundaries):
                landmark = landmarks[i_utt]
                closest = [int(np.argmin([abs(b - lm) for lm in landmark]))
                           for b in bounds]
                self._boundaries[i_utt, closest] = True
        elif p_boundary_init == 0:
            logger.info("Initializing boundaries at start and end of utterance")
            for i in range(self.D):
                self._boundaries[i, self.lengths[i] - 1] = True
        else:
            logger.info(
                "Initializing boundaries randomly with boundary probability "
                + str(p_boundary_init)
            )
            # Native rejection-resampled init (O(U * N^2) host work that
            # dominates startup at 10x corpus scale when done in Python).
            # The seed is drawn from the caller's RNG so runs stay
            # reproducible under np.random.seed / an explicit rng.
            from . import native

            seed = int(rand.randint(1, 2 ** 31 - 1))
            nat = native.init_boundaries_random(
                np.asarray(self.lengths, np.int64), self.vec_ids,
                self.N_max, float(p_boundary_init), self.n_slices_min,
                self.n_slices_max, seed,
            )
            if nat is not None:
                self._boundaries = nat
            else:  # documented numpy fallback (reference utterances.py:136-157)
                for i in range(self.D):
                    N = self.lengths[i]
                    while True:
                        self._boundaries[i, 0:N] = rand.rand(N) < p_boundary_init
                        self._boundaries[i, N - 1] = True
                        if np.all(np.asarray(self.get_segmented_embeds_i(i)) == -1):
                            continue
                        indices = self.get_segmented_landmark_indices(i)
                        spans = [j[1] - j[0] for j in indices]
                        if (max(spans) <= n_slices_max and min(spans) >= n_slices_min) \
                                or (N <= n_slices_min):
                            break

        # Dense windowed device tensors.  W covers every span that actually has
        # an embedding (data may provide spans longer than n_slices_max, e.g.
        # the whole-utterance spans used when p_boundary_init == 0).
        self.W = self._compute_w_store()
        self._build_dense()

    # -- dense layout ---------------------------------------------------------

    def _compute_w_store(self) -> int:
        """Longest span for which any embedding id is provided (vectorised)."""
        if self.n_slices_max <= 0:
            return self.N_max
        w = max(1, self.n_slices_max)
        for t in range(self.N_max):
            base = tri_index(t + 1, 0)
            valid = self.vec_ids[:, base : base + t + 1] != -1  # [D, t+1]
            if valid.any():
                # span length of column `start` is t + 1 - start
                starts = np.where(valid.any(axis=0))[0]
                w = max(w, int(t + 1 - starts.min()))
        return min(w, self.N_max)

    def _build_dense(self):
        D, N_max, W = self.D, self.N_max, self.W
        # Native packer (segmentalist_tpu/native) when available.
        from . import native

        packed = native.pack_dense(
            self.vec_ids, self.durations,
            np.asarray(self.lengths, np.int64), N_max, W,
        )
        if packed is not None:
            seg_ids, seg_durs = packed
            self.seg_ids = jnp.asarray(seg_ids, dtype=jnp.int32)
            self.seg_durations = jnp.asarray(seg_durs, dtype=jnp.float32)
            self.lengths_dev = jnp.asarray(self.lengths, dtype=jnp.int32)
            return
        # idx[t, w] = triangular index of span ending at landmark t with
        # length w + 1; -1 (sentinel) where the span is invalid.
        t_grid, w_grid = np.meshgrid(
            np.arange(N_max), np.arange(W), indexing="ij"
        )
        valid = w_grid <= t_grid
        idx = np.where(
            valid, t_grid * (t_grid + 1) // 2 + t_grid - w_grid, 0
        )
        seg_ids = self.vec_ids[:, idx]  # [D, N_max, W]
        seg_durs = self.durations[:, idx]
        seg_ids[:, ~valid] = -1
        seg_durs[:, ~valid] = np.nan
        # Mask positions beyond each utterance's length.
        beyond = np.arange(N_max)[None, :] >= np.asarray(self.lengths)[:, None]
        seg_ids[beyond] = -1
        seg_durs[beyond] = np.nan
        self.seg_ids = jnp.asarray(seg_ids, dtype=jnp.int32)
        self.seg_durations = jnp.asarray(seg_durs, dtype=jnp.float32)
        self.lengths_dev = jnp.asarray(self.lengths, dtype=jnp.int32)

    # -- boundary state -------------------------------------------------------

    @property
    def boundaries(self) -> np.ndarray:
        """Host-visible boundary matrix (reference ``boundaries`` attribute)."""
        return self._boundaries

    @boundaries.setter
    def boundaries(self, value):
        self._boundaries = np.asarray(value, dtype=bool)

    def boundaries_device(self) -> jnp.ndarray:
        return jnp.asarray(self._boundaries)

    def set_boundaries_from_device(self, boundaries):
        # [:self.D]: under a mesh the device tensor may carry dead padding
        # rows so the utterance axis shards evenly (parallel/mesh.py).
        self._boundaries = np.asarray(boundaries)[: self.D].astype(bool)

    # -- segmentation queries (reference utterances.py:159-229) ---------------

    def all_segmented_embeds(self) -> np.ndarray:
        """[D, N_max] embedding ids of every utterance's current segments,
        padded with -2 (-1 is a legitimate 'missing embedding').  Batched
        native query (``native/corpus_ops.cpp::segmented_embeds``); numpy
        per-utterance fallback."""
        from . import native

        out = native.segmented_embeds(
            self._boundaries, self.vec_ids,
            np.asarray(self.lengths, np.int64),
        )
        if out is not None:
            return out
        out = np.full((self.D, self.N_max), -2, dtype=np.int64)
        for i in range(self.D):
            embeds = self.get_segmented_embeds_i(i)
            out[i, : len(embeds)] = embeds
        return out

    def get_segmented_embeds_i(self, i: int) -> List[int]:
        """Embedding IDs of the current segmentation of utterance ``i``
        (reference ``get_segmented_embeds_i``, utterances.py:159-174)."""
        embed_ids = []
        j_prev = 0
        for j in range(self.lengths[i]):
            if self._boundaries[i, j]:
                k = tri_index(j + 1, j_prev)
                embed_ids.append(int(self.vec_ids[i, k]))
                j_prev = j + 1
        return embed_ids

    def get_segmented_durations_i(self, i: int) -> List[float]:
        durations = []
        j_prev = 0
        for j in range(self.lengths[i]):
            if self._boundaries[i, j]:
                k = tri_index(j + 1, j_prev)
                durations.append(self.durations[i, k])
                j_prev = j + 1
        return durations

    def get_original_segmented_embeds_i(self, i: int) -> List[int]:
        vec_ids = self.vec_ids[i]
        vec_ids_min = np.min(vec_ids[np.where(vec_ids != -1)])
        return [int(e - vec_ids_min) for e in self.get_segmented_embeds_i(i)]

    def get_segmented_landmark_indices(self, i: int):
        indices = []
        j_prev = 0
        for j in np.where(self._boundaries[i][: self.lengths[i]])[0]:
            indices.append((j_prev, int(j) + 1))
            j_prev = int(j) + 1
        return indices

    def get_segmented_landmarks(self, i: int):
        assert self.landmarks is not None
        indices = []
        j_prev = 0
        for _, j in self.get_segmented_landmark_indices(i):
            indices.append((j_prev, self.landmarks[i][j - 1]))
            j_prev = self.landmarks[i][j - 1]
        return indices
