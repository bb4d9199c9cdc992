"""Fixed-variance Gaussian component model (pure functions).

TPU-native re-design of the reference ``GaussianComponentsFixedVar``
(``gaussian_components_fixedvar.py``): a Bayesian GMM component store with
known diagonal covariance and a conjugate normal prior on the mean.  Instead
of a mutable object with incremental ``add_item``/``del_item`` updates, every
quantity is a pure function of the universal sufficient statistics
(:class:`segmentalist_tpu.ops.stats.SuffStats`) so that scoring all K
components for all M query vectors is one batched, MXU-friendly computation.

Math references (Murphy's bayesGauss notes, matching the reference):
  * posterior precision / mean numerator: reference
    ``gaussian_components_fixedvar.py:163-168``
  * posterior predictive: ``:242-253`` and ``:317-325``
  * prior predictive quirk: the reference evaluates the prior density with
    predictive precision ``precision_0`` (NOT the full predictive
    ``1/(var_0+var)``), see ``:224-231``; we reproduce it exactly.
  * log marginal of a component's members: ``:261-283``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.stats import SuffStats
from ..priors import FixedVarPrior

FULL_COV = False
_LOG_2PI = math.log(2.0 * math.pi)


class PredParams(NamedTuple):
    """Posterior-predictive parameters for all K slots.

    mu_pred        [K, D]  predictive mean
    prec_pred      [K, D]  predictive precision
    log_prod_prec  [K]     sum_d log prec_pred
    """

    mu_pred: jnp.ndarray
    prec_pred: jnp.ndarray
    log_prod_prec: jnp.ndarray


def _derive(prior: FixedVarPrior, counts, sum_x):
    precision = 1.0 / prior.var
    precision_0 = 1.0 / prior.var_0
    mu_n_num = precision_0 * prior.mu_0 + precision * sum_x
    prec_n = precision_0 + counts[..., None].astype(sum_x.dtype) * precision
    mu_pred = mu_n_num / prec_n
    prec_pred = prec_n * precision / (prec_n + precision)
    return mu_pred, prec_pred


def predictive_params(prior: FixedVarPrior, stats: SuffStats) -> PredParams:
    mu_pred, prec_pred = _derive(prior, stats.counts, stats.sum_x)
    return PredParams(
        mu_pred=mu_pred,
        prec_pred=prec_pred,
        log_prod_prec=jnp.sum(jnp.log(prec_pred), axis=-1),
    )


def predictive_params_T(prior: FixedVarPrior, counts, sum_xT):
    """Transposed-layout predictive parameters: ``counts [..., K]``,
    ``sum_xT [..., D, K]`` -> ``(mu_predT, prec_predT) [..., D, K]``.

    Same math as :func:`_derive` with the (component, feature) axes swapped,
    for consumers that want feature-major tables (the fused scoring kernel's
    VMEM layout puts features on sublanes and components on lanes) -- deriving
    in the target layout lets XLA skip the [K, D] -> [D, K] relayout copies
    that a post-hoc ``swapaxes`` forces (~0.5 ms/sweep at flagship scale).
    """
    precision = 1.0 / prior.var
    precision_0 = 1.0 / prior.var_0
    mu_n_num = (precision_0 * prior.mu_0)[:, None] \
        + precision[:, None] * sum_xT
    prec_n = precision_0[:, None] \
        + counts[..., None, :].astype(sum_xT.dtype) * precision[:, None]
    mu_predT = mu_n_num / prec_n
    prec_predT = prec_n * precision[:, None] / (prec_n + precision[:, None])
    return mu_predT, prec_predT


def update_predictive_row(prior: FixedVarPrior, stats: SuffStats, params: PredParams, k):
    """Recompute predictive parameters for a single slot ``k`` (cheap O(D))."""
    mu_pred, prec_pred = _derive(prior, stats.counts[k], stats.sum_x[k])
    return PredParams(
        mu_pred=params.mu_pred.at[k].set(mu_pred),
        prec_pred=params.prec_pred.at[k].set(prec_pred),
        log_prod_prec=params.log_prod_prec.at[k].set(jnp.sum(jnp.log(prec_pred))),
    )


def log_post_pred(params: PredParams, x: jnp.ndarray) -> jnp.ndarray:
    """[K] log posterior predictive of ``x`` under every slot
    (reference ``log_post_pred``, ``gaussian_components_fixedvar.py:242-253``)."""
    D = x.shape[-1]
    delta = params.mu_pred - x
    maha = jnp.sum(delta * delta * params.prec_pred, axis=-1)
    return -0.5 * D * _LOG_2PI + 0.5 * params.log_prod_prec - 0.5 * maha


def log_post_pred_batch(params: PredParams, X: jnp.ndarray) -> jnp.ndarray:
    """[M, K] scores for a batch of query vectors.

    Expanded into matmul form so XLA maps it onto the MXU:
        sum_d (x-mu)^2 p = (x^2) @ p^T - 2 x @ (mu p)^T + sum_d mu^2 p.
    """
    mp = params.mu_pred * params.prec_pred  # [K, D]
    const_k = jnp.sum(params.mu_pred * mp, axis=-1)  # [K]
    maha = (
        (X * X) @ params.prec_pred.T - 2.0 * (X @ mp.T) + const_k[None, :]
    )  # [M, K]
    D = X.shape[-1]
    return -0.5 * D * _LOG_2PI + 0.5 * params.log_prod_prec[None, :] - 0.5 * maha


def log_prior(prior: FixedVarPrior, x: jnp.ndarray) -> jnp.ndarray:
    """Log density of ``x`` under the prior alone.

    Reproduces the reference exactly: the predictive precision is taken to be
    ``precision_0`` itself (``gaussian_components_fixedvar.py:224-231``).
    """
    precision_0 = 1.0 / prior.var_0
    D = x.shape[-1]
    delta = x - prior.mu_0
    return (
        -0.5 * D * _LOG_2PI
        + 0.5 * jnp.sum(jnp.log(precision_0))
        - 0.5 * jnp.sum(delta * delta * precision_0, axis=-1)
    )


def log_prior_batch(prior: FixedVarPrior, X: jnp.ndarray) -> jnp.ndarray:
    return log_prior(prior, X)


def log_marg_k_vec(prior: FixedVarPrior, stats: SuffStats) -> jnp.ndarray:
    """[K] log marginal probability of each slot's member vectors; 0 for empty
    slots.  Vectorised transcription of the reference closed form
    (``gaussian_components_fixedvar.py:261-283``)."""
    precision = 1.0 / prior.var
    precision_0 = 1.0 / prior.var_0
    n = stats.counts[:, None].astype(stats.sum_x.dtype)  # [K, 1]
    sx = stats.sum_x  # [K, D]
    ssq = stats.sum_sq  # [K, D]
    denom = n / precision_0 + 1.0 / precision
    per_dim = (
        (n - 1.0) / 2.0 * jnp.log(precision)
        - 0.5 * n * _LOG_2PI
        - 0.5 * jnp.log(denom)
        - 0.5 * precision * ssq
        - 0.5 * precision_0 * jnp.square(prior.mu_0)
        + 0.5
        * (
            jnp.square(sx) * precision / precision_0
            + jnp.square(prior.mu_0) * precision_0 / precision
            + 2.0 * sx * prior.mu_0
        )
        / denom
    )
    out = jnp.sum(per_dim, axis=-1)
    return jnp.where(stats.counts > 0, out, 0.0)


def log_marg(prior: FixedVarPrior, stats: SuffStats) -> jnp.ndarray:
    """Scalar p(X | z): sum of ``log_marg_k`` over non-empty components
    (reference ``log_marg``, ``gaussian_components_fixedvar.py:285-296``)."""
    return jnp.sum(log_marg_k_vec(prior, stats))


def rand_k(key: jax.Array, prior: FixedVarPrior, stats: SuffStats, k) -> jnp.ndarray:
    """Posterior draw of the mean for slot ``k``
    (reference ``rand_k``, ``gaussian_components_fixedvar.py:298-308``)."""
    mu_pred, _ = _derive(prior, stats.counts[k], stats.sum_x[k])
    precision = 1.0 / prior.var
    precision_0 = 1.0 / prior.var_0
    prec_n = precision_0 + stats.counts[k].astype(stats.sum_x.dtype) * precision
    std = jnp.sqrt(1.0 / prec_n)
    return mu_pred + std * jax.random.normal(key, mu_pred.shape, dtype=mu_pred.dtype)


if __name__ == "__main__":  # smoke demo (reference gaussian_components_fixedvar.py:359-388)
    from segmentalist_tpu.demos import demo_components

    demo_components("fixed")
