"""Multi-chip scale-out via jax.sharding (GSPMD).

The reference has no distribution layer at all (SURVEY.md section 2: no
NCCL/MPI, single process).  The TPU-native equivalent introduced here is
data parallelism over the *corpus* dimension, following the standard recipe:
pick a mesh, annotate input shardings, and let XLA insert the collectives.

Sharding layout for a segmentation sweep:

  replicated : embeddings X [N, D], model sufficient statistics [K, ...],
               assignment vector [N], PRNG key, LM count tables
  data-sharded (axis "data"): the corpus tensors seg_ids / seg_durations /
               boundaries [U, ...] and each sweep's utterance blocks [B]

Within a block, scoring / DP / assignment chains partition cleanly along the
utterance axis; the statistics merge is a cross-device reduction that XLA
lowers to a ``psum`` over ICI.  Because the per-sweep state (stats,
assignments) is replicated, every device ends the sweep bit-identical -- no
parameter server, no explicit communication code.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """A 1-D device mesh over the corpus axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_segmenter(seg, mesh: Mesh, axis_name: str = "data"):
    """Place a segmenter's corpus tensors on the mesh (sharded over
    utterances) and replicate its model state.

    Works for UnigramAcousticWordseg / BigramAcousticWordseg /
    SegmentalKMeansWordseg; mutates the segmenter in place and returns it.
    Utterance counts that do not divide the mesh are padded up with DEAD
    utterances (length 0, ``seg_ids`` -1 -- the same mask convention as
    positions beyond a real utterance's length), so the corpus axis always
    shards.  Dead rows are never in any sweep block (blocks permute the
    REAL ``utterances.D`` indices) and the host boundary sync slices back
    to the real count.  batch_size is rounded up to a multiple of the mesh
    size so each block splits evenly.
    """
    n = mesh.devices.size
    if seg.batch_size % n != 0:
        seg.batch_size = int(np.ceil(seg.batch_size / n) * n)
    seg._sweep_fn = None  # rebuild: block size and/or pallas gating changed
    seg._chunk_fn = None  # ditto: cached chunk closes over pre-mesh tensors

    shard_u = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    utt = seg.utterances
    U = utt.seg_ids.shape[0]
    pad = (-U) % n
    if pad:
        pad_rows = lambda a, val: jnp.concatenate(  # noqa: E731
            [a, jnp.full((pad,) + a.shape[1:], val, a.dtype)], axis=0)
        utt.seg_ids = pad_rows(utt.seg_ids, -1)
        utt.seg_durations = pad_rows(utt.seg_durations, jnp.nan)
        utt.lengths_dev = pad_rows(utt.lengths_dev, 0)
        seg._boundaries_dev = pad_rows(seg._boundaries_dev, 0)
    utt.seg_ids = jax.device_put(utt.seg_ids, shard_u)
    utt.seg_durations = jax.device_put(utt.seg_durations, shard_u)
    seg._boundaries_dev = jax.device_put(seg._boundaries_dev, shard_u)
    utt.lengths_dev = jax.device_put(utt.lengths_dev, shard_u)

    am = seg.acoustic_model
    am.X = jax.device_put(am.X, repl)
    if hasattr(am, "stats"):
        am.stats = jax.device_put(am.stats, repl)
        am.log_prior_vec = jax.device_put(am.log_prior_vec, repl)
        am.assignments = jax.device_put(am.assignments, repl)
    if hasattr(am, "state"):  # k-means: assignments live inside the state
        am.state = jax.device_put(am.state, repl)
        am.random_means = jax.device_put(am.random_means, repl)
    if hasattr(seg, "lm"):
        seg.lm.state = jax.device_put(seg.lm.state, repl)
    seg._mesh = mesh
    return seg
