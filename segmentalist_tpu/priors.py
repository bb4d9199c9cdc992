"""Prior parameter containers for the Bayesian Gaussian component models.

These are the TPU-native counterparts of the reference's prior structs:

* ``NIW``          -- normal-inverse-Wishart prior (reference ``niw.py:7-15``).
                      For the diagonal-covariance model the same container is
                      used as a normal-inverse-chi-squared prior with ``S_0`` a
                      D-vector (reference ``gaussian_components_diag.py:38-41``).
* ``FixedVarPrior`` -- fixed diagonal covariance, conjugate normal prior on
                      the mean only (reference
                      ``gaussian_components_fixedvar.py:349-356``).

Unlike the reference (mutable Python objects), these are immutable pytrees of
``jnp`` arrays so they can be closed over by / passed through ``jax.jit``.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp


class NIW(NamedTuple):
    """Normal-inverse-Wishart prior (reference ``niw.py:7-15``).

    Attributes
    ----------
    m_0 : [D] prior mean.
    k_0 : scalar prior mean "pseudo-count".
    v_0 : scalar prior degrees of freedom (must be >= D for the full model).
    S_0 : [D, D] prior scatter matrix (full covariance) or [D] vector
          (diagonal covariance; reference ``gaussian_components_diag.py:92``).
    """

    m_0: jnp.ndarray
    k_0: jnp.ndarray
    v_0: jnp.ndarray
    S_0: jnp.ndarray

    @classmethod
    def create(cls, m_0, k_0, v_0, S_0) -> "NIW":
        m_0 = jnp.asarray(m_0)
        S_0 = jnp.asarray(S_0, dtype=m_0.dtype)
        D = m_0.shape[-1]
        if float(v_0) < D:
            # Reference asserts v_0 >= D (niw.py:13).
            raise ValueError("v_0 must be larger or equal to dimension of data")
        return cls(
            m_0=m_0,
            k_0=jnp.asarray(k_0, dtype=m_0.dtype),
            v_0=jnp.asarray(v_0, dtype=m_0.dtype),
            S_0=S_0,
        )


class FixedVarPrior(NamedTuple):
    """Fixed diagonal-covariance Gaussian prior (reference
    ``gaussian_components_fixedvar.py:349-356``).

    Attributes
    ----------
    var : [D] fixed observation variance.
    mu_0 : [D] prior mean.
    var_0 : [D] prior variance of the mean.
    """

    var: jnp.ndarray
    mu_0: jnp.ndarray
    var_0: jnp.ndarray

    @classmethod
    def create(cls, var, mu_0, var_0) -> "FixedVarPrior":
        mu_0 = jnp.asarray(mu_0)
        return cls(
            var=jnp.asarray(var, dtype=mu_0.dtype),
            mu_0=mu_0,
            var_0=jnp.asarray(var_0, dtype=mu_0.dtype),
        )


Prior = Union[NIW, FixedVarPrior]
