"""Diagonal-covariance Gaussian component model (pure functions).

TPU-native re-design of the reference ``GaussianComponentsDiag``
(``gaussian_components_diag.py``): per-dimension normal-inverse-chi-squared
prior, posterior predictive a product of univariate Student's t densities.

Math references:
  * posterior stats: reference ``gaussian_components_diag.py:169-176``
  * predictive variance: ``:332-345``
  * vectorised predictive: ``:237-259``
  * log marginal: ``:271-290``
  * posterior parameter draw: ``:305-323`` and ``invchisquared_sample``
    (``:395-407``).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..ops.stats import SuffStats
from ..priors import NIW

FULL_COV = False
_LOG_PI = math.log(math.pi)


class PredParams(NamedTuple):
    """Posterior-predictive parameters for all K slots.

    mu        [K, D]  predictive location (posterior mean m_N)
    inv_var   [K, D]  inverse predictive variance
    log_prod_var [K]  sum_d log var
    v         [K]     Student's t degrees of freedom (v_N)
    """

    mu: jnp.ndarray
    inv_var: jnp.ndarray
    log_prod_var: jnp.ndarray
    v: jnp.ndarray


def _derive(prior: NIW, counts, sum_x, sum_sq):
    n = counts.astype(sum_x.dtype)
    k_n = prior.k_0 + n
    v_n = prior.v_0 + n
    m_n = (prior.k_0 * prior.m_0 + sum_x) / k_n[..., None]
    s_n_partial = prior.S_0 + prior.k_0 * jnp.square(prior.m_0) + sum_sq
    var = (
        (k_n[..., None] + 1.0)
        / (k_n[..., None] * v_n[..., None])
        * (s_n_partial - k_n[..., None] * jnp.square(m_n))
    )
    return m_n, var, v_n


def predictive_params(prior: NIW, stats: SuffStats) -> PredParams:
    m_n, var, v_n = _derive(prior, stats.counts, stats.sum_x, stats.sum_sq)
    return PredParams(
        mu=m_n,
        inv_var=1.0 / var,
        log_prod_var=jnp.sum(jnp.log(var), axis=-1),
        v=v_n,
    )


def predictive_params_T(prior: NIW, counts, sum_xT, sum_sqT):
    """Transposed-layout predictive parameters: ``counts [..., K]``,
    ``sum_xT``/``sum_sqT [..., D, K]`` -> ``(muT, inv_varT [..., D, K],
    log_prod_var [..., K], v [..., K])``.  Same math as :func:`_derive` with
    the (component, feature) axes swapped, so feature-major consumers (the
    fused scoring kernel's VMEM tables) need no [K, D] -> [D, K] relayout
    copies.  ``log_prod_var`` is computed from ``var`` itself (not from the
    rounded reciprocal ``1/varT``), so the constant matches the non-T
    :func:`predictive_params` bit-for-bit (round-4 advisor finding)."""
    n = counts.astype(sum_xT.dtype)
    k_n = prior.k_0 + n
    v_n = prior.v_0 + n
    kn_d = k_n[..., None, :]
    m_nT = ((prior.k_0 * prior.m_0)[:, None] + sum_xT) / kn_d
    s_n_partial = (prior.S_0 + prior.k_0 * jnp.square(prior.m_0))[:, None] \
        + sum_sqT
    varT = (
        (kn_d + 1.0)
        / (kn_d * v_n[..., None, :])
        * (s_n_partial - kn_d * jnp.square(m_nT))
    )
    return m_nT, 1.0 / varT, jnp.sum(jnp.log(varT), axis=-2), v_n


def update_predictive_row(prior: NIW, stats: SuffStats, params: PredParams, k):
    m_n, var, v_n = _derive(prior, stats.counts[k], stats.sum_x[k], stats.sum_sq[k])
    return PredParams(
        mu=params.mu.at[k].set(m_n),
        inv_var=params.inv_var.at[k].set(1.0 / var),
        log_prod_var=params.log_prod_var.at[k].set(jnp.sum(jnp.log(var))),
        v=params.v.at[k].set(v_n),
    )


def _log_prod_students_t(x, mu, inv_var, log_prod_var, v):
    """Product of D univariate Student's t log-densities
    (reference ``_log_prod_students_t``, ``gaussian_components_diag.py:347-360``)."""
    D = x.shape[-1]
    delta = x - mu
    return (
        D
        * (
            gammaln((v + 1.0) / 2.0)
            - gammaln(v / 2.0)
            - 0.5 * jnp.log(v)
            - 0.5 * _LOG_PI
        )
        - 0.5 * log_prod_var
        - (v + 1.0)
        / 2.0
        * jnp.sum(jnp.log1p(delta * delta * inv_var / v[..., None]), axis=-1)
    )


def log_post_pred(params: PredParams, x: jnp.ndarray) -> jnp.ndarray:
    """[K] log posterior predictive of ``x`` under every slot
    (reference ``log_post_pred``, ``gaussian_components_diag.py:237-259``)."""
    return _log_prod_students_t(x, params.mu, params.inv_var, params.log_prod_var, params.v)


def log_post_pred_batch(params: PredParams, X: jnp.ndarray) -> jnp.ndarray:
    """[M, K] scores: the log1p couples dimensions non-linearly, so this is an
    elementwise [M, K, D] contraction rather than a matmul."""
    return _log_prod_students_t(
        X[:, None, :],
        params.mu[None, :, :],
        params.inv_var[None, :, :],
        params.log_prod_var[None, :],
        params.v[None, :],
    )


def log_prior(prior: NIW, x: jnp.ndarray) -> jnp.ndarray:
    """Log density under the prior predictive
    (reference ``log_prior``, ``gaussian_components_diag.py:215-222``)."""
    var = (prior.k_0 + 1.0) / (prior.k_0 * prior.v_0) * prior.S_0
    return _log_prod_students_t(
        x, prior.m_0, 1.0 / var, jnp.sum(jnp.log(var)), prior.v_0
    )


def log_prior_batch(prior: NIW, X: jnp.ndarray) -> jnp.ndarray:
    return log_prior(prior, X)


def log_marg_k_vec(prior: NIW, stats: SuffStats) -> jnp.ndarray:
    """[K] log marginal of each slot's members; 0 for empty slots
    (reference ``log_marg_k``, ``gaussian_components_diag.py:271-290``)."""
    D = stats.sum_x.shape[-1]
    n = stats.counts.astype(stats.sum_x.dtype)
    k_n = prior.k_0 + n
    v_n = prior.v_0 + n
    m_n = (prior.k_0 * prior.m_0 + stats.sum_x) / k_n[:, None]
    s_n_partial = prior.S_0 + prior.k_0 * jnp.square(prior.m_0) + stats.sum_sq
    s_n = s_n_partial - k_n[:, None] * jnp.square(m_n)
    # log(s_n) is NaN-prone for empty slots (s_n can be ~0); mask afterwards.
    s_n_safe = jnp.where(stats.counts[:, None] > 0, s_n, 1.0)
    out = (
        -n * D / 2.0 * _LOG_PI
        + D / 2.0 * jnp.log(prior.k_0)
        - D / 2.0 * jnp.log(k_n)
        + prior.v_0 / 2.0 * jnp.sum(jnp.log(prior.S_0))
        - v_n / 2.0 * jnp.sum(jnp.log(s_n_safe), axis=-1)
        + D * (gammaln(v_n / 2.0) - gammaln(prior.v_0 / 2.0))
    )
    return jnp.where(stats.counts > 0, out, 0.0)


def log_marg(prior: NIW, stats: SuffStats) -> jnp.ndarray:
    return jnp.sum(log_marg_k_vec(prior, stats))


def rand_k(key: jax.Array, prior: NIW, stats: SuffStats, k):
    """Posterior (mean, var) draw for slot ``k`` via inverse-chi-squared +
    normal sampling (reference ``rand_k``, ``gaussian_components_diag.py:305-323``)."""
    n = stats.counts[k].astype(stats.sum_x.dtype)
    k_n = prior.k_0 + n
    v_n = prior.v_0 + n
    m_n = (prior.k_0 * prior.m_0 + stats.sum_x[k]) / k_n
    s_n = prior.S_0 + prior.k_0 * jnp.square(prior.m_0) + stats.sum_sq[k] - k_n * jnp.square(m_n)
    key_var, key_mean = jax.random.split(key)
    # invchisquared(df=v_n, scale=s_n/v_n) == 1 / Gamma(v_n/2, rate=s_n/2)
    gamma_draw = jax.random.gamma(key_var, v_n / 2.0, shape=m_n.shape, dtype=m_n.dtype)
    var = (s_n / 2.0) / gamma_draw
    mean = m_n + jnp.sqrt(var / k_n) * jax.random.normal(key_mean, m_n.shape, dtype=m_n.dtype)
    return mean, var


if __name__ == "__main__":  # smoke demo (reference gaussian_components_diag.py:410-494)
    from segmentalist_tpu.demos import demo_components

    demo_components("diag")
