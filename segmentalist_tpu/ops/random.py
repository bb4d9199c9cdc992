"""Categorical sampling primitives.

The reference draws categorical samples with an inverse-CDF scan driven by
Python's global RNG (``_cython_utils.pyx:75-89``, ``utils.py:10-21``).  On TPU
the idiomatic replacement is Gumbel-max sampling under explicit ``threefry``
keys: ``argmax(logits / T + gumbel)`` draws from ``softmax(logits / T)``, which
is exactly the annealed distribution the reference builds by normalising twice
(``fbgmm.py:380-386``).  Gumbel-max is branch-free, vectorises over arbitrary
batch dimensions, and never needs the explicit normalisation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def gumbel_max(key: jax.Array, logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Draw an index from ``softmax(logits)`` along ``axis`` via Gumbel-max.

    Entries equal to ``-inf`` are never selected (as long as at least one entry
    is finite).  Works for arbitrary leading batch dimensions; one independent
    draw per batch element.
    """
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    # Where logits are -inf the gumbel noise must not resurrect them.
    perturbed = jnp.where(jnp.isneginf(logits), NEG_INF, logits + g)
    return jnp.argmax(perturbed, axis=axis)


def annealed_gumbel_max(
    key: jax.Array, logits: jnp.ndarray, anneal_temp, axis: int = -1
) -> jnp.ndarray:
    """Draw from ``softmax(logits / anneal_temp)``.

    Matches the reference's annealing transform, which normalises
    ``log_prob_z`` and then re-normalises ``log_prob_z / anneal_temp``
    (``fbgmm.py:380-383``): the double normalisation is algebraically
    ``softmax(logits / T)``.
    """
    temp = jnp.asarray(anneal_temp, dtype=logits.dtype)
    scaled = jnp.where(jnp.isneginf(logits), NEG_INF, logits / temp)
    return gumbel_max(key, scaled, axis=axis)


def logsumexp(a: jnp.ndarray, axis=-1, keepdims: bool = False) -> jnp.ndarray:
    """``-inf``-safe logsumexp: all ``-inf`` inputs reduce to ``-inf`` (no NaNs).

    Replaces the Cython ``logsumexp`` scalar kernel (``_cython_utils.pyx:13-25``)
    with a vectorised reduction.
    """
    m = jnp.max(a, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    out = jnp.log(jnp.sum(jnp.exp(a - m_safe), axis=axis, keepdims=True)) + m_safe
    out = jnp.where(jnp.isneginf(m), NEG_INF, out)
    return out if keepdims else jnp.squeeze(out, axis=axis)
