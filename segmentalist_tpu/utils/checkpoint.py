"""Checkpoint / resume for sampler state.

The reference has no serialization at all (SURVEY.md section 5.4); because all
state in this framework is already a flat pytree of arrays (sufficient stats,
assignments, boundaries, LM counts, PRNG key), checkpointing is a single
pytree save/restore.  Uses orbax when available, with a plain ``.npz``
fallback so checkpoints never depend on optional packages.

Resume semantics: fused-chunk runs (the default for >= _WORDSEG_CHUNK
sweeps with no per-sweep host work) draw their utterance permutations from
the carried device key; unchunked sweeps permute with the host
``RandomState``, whose MT19937 state is captured in the checkpoint.  A
restored run therefore continues the chain BIT-EXACTLY on BOTH paths
(tests/test_native_and_checkpoint.py::test_checkpoint_resume_is_bit_exact,
test_checkpoint_resume_unchunked_is_bit_exact).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def segmenter_state(seg) -> Dict[str, Any]:
    """Extract the full sampler state pytree from any of the three drivers."""
    am = seg.acoustic_model
    state: Dict[str, Any] = {"boundaries": seg._boundaries_dev}
    if hasattr(am, "stats"):  # FBGMM-backed segmenters
        state["stats"] = am.stats._asdict()
        state["assignments"] = am.assignments
        state["key"] = am.key
    if hasattr(am, "state"):  # k-means
        state["kmeans_state"] = am.state._asdict()
        state["random_means"] = am.random_means
    if hasattr(seg, "lm"):
        state["lm"] = seg.lm.state._asdict()
    if hasattr(seg, "_key"):
        state["key"] = seg._key
    if hasattr(seg, "_rng"):
        # Host MT19937 state: unchunked sweeps (monitor_i / validate /
        # am_n_iter, or under a mesh) draw their utterance permutations from
        # this RandomState, so capturing it makes THOSE resumes bit-exact too.
        name, keys, pos, has_gauss, cached = seg._rng.get_state()
        assert name == "MT19937"
        state["host_rng"] = {
            "keys": np.asarray(keys, np.uint32),
            "pos": np.asarray(pos, np.int64),
            "has_gauss": np.asarray(has_gauss, np.int64),
            "cached": np.asarray(cached, np.float64),
        }
    return state


def load_segmenter_state(seg, state: Dict[str, Any]) -> None:
    """Restore a state pytree produced by :func:`segmenter_state`."""
    from ..ops.stats import SuffStats

    am = seg.acoustic_model
    seg._boundaries_dev = jnp.asarray(state["boundaries"])
    if "stats" in state:
        am.stats = SuffStats(**{k: jnp.asarray(v) for k, v in state["stats"].items()})
        am.assignments = jnp.asarray(state["assignments"])
        am.key = jnp.asarray(state["key"])
    if "kmeans_state" in state:
        from ..models.kmeans import KMeansState

        am.state = KMeansState(
            **{k: jnp.asarray(v) for k, v in state["kmeans_state"].items()}
        )
        am.random_means = jnp.asarray(state["random_means"])
    if "lm" in state:
        from ..models.bigram_lm import BigramLMState

        seg.lm.state = BigramLMState(
            **{k: jnp.asarray(v) for k, v in state["lm"].items()}
        )
    if hasattr(seg, "_key") and "key" in state:
        seg._key = jnp.asarray(state["key"])
    if hasattr(seg, "_rng") and "host_rng" in state:
        h = state["host_rng"]
        seg._rng.set_state((
            "MT19937", np.asarray(h["keys"], np.uint32), int(h["pos"]),
            int(h["has_gauss"]), float(h["cached"]),
        ))


def save_checkpoint(path: str, seg, step: int = 0) -> None:
    state = segmenter_state(seg)
    state = jax.tree.map(np.asarray, state)
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, "step_%08d" % step), state, force=True)
    except Exception:  # noqa: BLE001 - orbax unavailable/failed: npz fallback
        os.makedirs(path, exist_ok=True)
        flat = _flatten(state)
        np.savez(os.path.join(path, "step_%08d.npz" % step), **flat)


def restore_checkpoint(path: str, seg, step: int = 0) -> None:
    path = os.path.abspath(path)
    npz = os.path.join(path, "step_%08d.npz" % step)
    if os.path.exists(npz):
        with np.load(npz) as data:
            state = _unflatten(dict(data.items()))
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        state = ckptr.restore(os.path.join(path, "step_%08d" % step))
    load_segmenter_state(seg, state)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = prefix + k
        if isinstance(v, dict):
            out.update(_flatten(v, name + "/"))
        else:
            out[name] = np.asarray(v)
    return out


def _unflatten(flat):
    out: Dict[str, Any] = {}
    for name, v in flat.items():
        parts = name.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out
