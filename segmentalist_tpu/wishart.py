"""Wishart / inverse-Wishart samplers (reference ``wishart.py:16-32``).

The reference exposes ``wishrnd``/``iwishrnd`` as standalone functions built
from a Python-loop Bartlett factor over ``np.random``/``random``.  Here the
same Bartlett construction is a jittable, vmappable JAX function: the factor
is assembled in one shot (a tril of normals plus a diagonal of chi draws)
and the D-loop disappears into vector ops.

``components_full.rand_k`` uses the identical construction inline (fused
with the posterior-parameter computation); this module is the public
API-parity surface for callers that used ``segmentalist.wishart`` directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bartlett(key: jax.Array, D: int, v_0, dtype) -> jax.Array:
    """Lower-triangular Bartlett factor A: A_ii ~ sqrt(chi2(v_0 - i)),
    A_ij ~ N(0, 1) for i > j (reference ``wishart.py:22-26``)."""
    key_chi, key_norm = jax.random.split(key)
    i = jnp.arange(D, dtype=dtype)
    v_0 = jnp.asarray(v_0, dtype)
    chi2 = 2.0 * jax.random.gamma(key_chi, (v_0 - i) / 2.0, shape=(D,),
                                  dtype=dtype)
    normals = jax.random.normal(key_norm, (D, D), dtype=dtype)
    return jnp.tril(normals, -1) + jnp.diag(jnp.sqrt(chi2))


def wishrnd(key: jax.Array, sigma: jax.Array, v_0, C=None) -> jax.Array:
    """Sample from a Wishart(``sigma``, ``v_0``) distribution
    (reference ``wishart.py:16-26``: ``C A A^T C^T`` with ``C = chol(sigma)``).

    ``key`` replaces the reference's global ``np.random`` state; ``C`` may be
    passed to reuse a precomputed Cholesky factor, as in the reference.
    """
    sigma = jnp.asarray(sigma)
    D = sigma.shape[-1]
    if C is None:
        C = jnp.linalg.cholesky(sigma)
    A = _bartlett(key, D, v_0, sigma.dtype)
    CA = C @ A
    return CA @ CA.T


def iwishrnd(key: jax.Array, sigma: jax.Array, v_0, C=None) -> jax.Array:
    """Sample from an inverse-Wishart distribution (reference
    ``wishart.py:29-32``: invert a ``wishrnd`` draw).

    Note the reference's (inherited) parameterization: the Wishart is drawn
    with scale ``sigma`` and the DRAW is inverted, i.e. this returns
    IW(``sigma``:sup:`-1`, ``v_0``).  We keep that behavior for parity but
    solve from the triangular factors instead of forming + inverting the
    Wishart draw: X = C A A^T C^T  =>  X^{-1} = C^{-T} A^{-T} A^{-1} C^{-1}.
    """
    sigma = jnp.asarray(sigma)
    D = sigma.shape[-1]
    if C is None:
        C = jnp.linalg.cholesky(sigma)
    A = _bartlett(key, D, v_0, sigma.dtype)
    eye = jnp.eye(D, dtype=sigma.dtype)
    inv_CA = jax.scipy.linalg.solve_triangular(C @ A, eye, lower=True)
    return inv_CA.T @ inv_CA
