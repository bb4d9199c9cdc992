"""Full-covariance (NIW) Gaussian component model (pure functions).

TPU-native re-design of the reference ``GaussianComponents``
(``gaussian_components.py``): normal-inverse-Wishart prior, posterior
predictive a multivariate Student's t.

The reference updates ``logdet_covars``/``inv_covars`` incrementally with an
O(D^3) ``slogdet``+``inv`` per item add/delete
(``gaussian_components.py:319-331``) -- its construction hot spot.  Here the
per-slot predictive covariance is derived from the universal sufficient
statistics with a single *batched* Cholesky over [K, D, D], amortised over an
entire scoring batch.

Math references:
  * posterior stats: ``gaussian_components.py:161-167``
  * predictive covariance/dof: ``:319-331`` and ``:216-226``
  * vectorised predictive: ``:228-251``
  * log marginal: ``:253-276``
  * posterior draw / MAP: ``:291-316``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..ops.stats import SuffStats
from ..priors import NIW

FULL_COV = True
_LOG_PI = math.log(math.pi)


class PredParams(NamedTuple):
    """Posterior-predictive parameters for all K slots.

    mu           [K, D]     predictive location (posterior mean m_N)
    inv_covar    [K, D, D]  inverse predictive scale matrix
    logdet_covar [K]        log-determinant of the predictive scale matrix
    v            [K]        Student's t degrees of freedom (v_N - D + 1)
    """

    mu: jnp.ndarray
    inv_covar: jnp.ndarray
    logdet_covar: jnp.ndarray
    v: jnp.ndarray


def _outer(a, b):
    return a[..., :, None] * b[..., None, :]


def _derive_covar(prior: NIW, counts, sum_x, sum_sq):
    n = counts.astype(sum_x.dtype)
    k_n = prior.k_0 + n
    v_n = prior.v_0 + n
    m_n = (prior.k_0 * prior.m_0 + sum_x) / k_n[..., None]
    s_n_partial = prior.S_0 + prior.k_0 * _outer(prior.m_0, prior.m_0) + sum_sq
    D = sum_x.shape[-1]
    v = v_n - D + 1.0
    scale = (k_n + 1.0) / (k_n * v)
    covar = scale[..., None, None] * (s_n_partial - k_n[..., None, None] * _outer(m_n, m_n))
    return m_n, covar, v


_UNROLL_D_MAX = 20


def _chol_factor_unrolled(covar):
    """Unrolled Cholesky factor for small static D, as a [D][D] list grid.

    XLA's generic batched Cholesky lowers to a column-by-column while loop
    that dominates the full-covariance sweep for tiny matrices (the sweep
    factorises ~10^6 13x13 matrices per Gibbs sweep at Buckeye scale).
    Unrolling over the static D turns the whole factorisation into a few
    hundred fused element-wise ops vectorised over the [.., K] batch.
    """
    D = covar.shape[-1]
    a = [[covar[..., i, j] for j in range(D)] for i in range(D)]
    L = [[None] * D for _ in range(D)]
    for i in range(D):
        for j in range(i + 1):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_logdet_unrolled(covar):
    """Batched log-determinant of an SPD matrix via the unrolled Cholesky.

    Replaces ``jnp.linalg.slogdet``, whose TPU lowering is an LU custom
    call (~3.2 ms/sweep on the [K=1000, 13, 13] per-sweep metrics scatter
    matrices at Buckeye scale -- 16% of the full-NIW sweep)."""
    L = _chol_factor_unrolled(covar)
    return 2.0 * sum(jnp.log(L[i][i]) for i in range(len(L)))


def _chol_inv_logdet_unrolled(covar):
    """Unrolled Cholesky + triangular inverse for small static D."""
    D = covar.shape[-1]
    L = _chol_factor_unrolled(covar)
    # Y = L^{-1} by forward substitution on the identity (lower triangular).
    Y = [[None] * D for _ in range(D)]
    for j in range(D):
        Y[j][j] = 1.0 / L[j][j]
        for i in range(j + 1, D):
            s = None
            for k in range(j, i):
                t = L[i][k] * Y[k][j]
                s = t if s is None else s + t
            Y[i][j] = -s / L[i][i]
    # A^{-1} = Y^T Y.
    zero = jnp.zeros_like(covar[..., 0, 0])
    inv_rows = []
    for i in range(D):
        row = []
        for j in range(D):
            s = None
            for k in range(max(i, j), D):
                t = Y[k][i] * Y[k][j]
                s = t if s is None else s + t
            row.append(s if s is not None else zero)
        inv_rows.append(jnp.stack(row, axis=-1))
    inv = jnp.stack(inv_rows, axis=-2)
    logdet = 2.0 * sum(jnp.log(L[i][i]) for i in range(D))
    return inv, logdet


def _chol_inv_logdet(covar):
    """Batched inverse + log-determinant via Cholesky."""
    D = covar.shape[-1]
    if D <= _UNROLL_D_MAX:
        return _chol_inv_logdet_unrolled(covar)
    chol = jnp.linalg.cholesky(covar)
    eye = jnp.eye(D, dtype=covar.dtype)
    eye = jnp.broadcast_to(eye, covar.shape)
    inv_chol = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
    inv = jnp.swapaxes(inv_chol, -1, -2) @ inv_chol
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    return inv, logdet


def predictive_params(prior: NIW, stats: SuffStats) -> PredParams:
    m_n, covar, v = _derive_covar(prior, stats.counts, stats.sum_x, stats.sum_sq)
    inv, logdet = _chol_inv_logdet(covar)
    return PredParams(mu=m_n, inv_covar=inv, logdet_covar=logdet, v=v)


def update_predictive_row(prior: NIW, stats: SuffStats, params: PredParams, k):
    m_n, covar, v = _derive_covar(prior, stats.counts[k], stats.sum_x[k], stats.sum_sq[k])
    inv, logdet = _chol_inv_logdet(covar)
    return PredParams(
        mu=params.mu.at[k].set(m_n),
        inv_covar=params.inv_covar.at[k].set(inv),
        logdet_covar=params.logdet_covar.at[k].set(logdet),
        v=params.v.at[k].set(v),
    )


def _student_t_from_maha(maha, logdet_covar, v, D: int):
    """Multivariate Student's t log-density from a precomputed Mahalanobis
    quadratic form (shared by the dense scorer and the touched-component
    correction path in ``segmenters/fullcov.py``)."""
    return (
        gammaln((v + D) / 2.0)
        - gammaln(v / 2.0)
        - D / 2.0 * jnp.log(v)
        - D / 2.0 * _LOG_PI
        - 0.5 * logdet_covar
        - (v + D) / 2.0 * jnp.log1p(maha / v)
    )


def _mvt_logpdf(x, mu, inv_covar, logdet_covar, v):
    """Multivariate Student's t log-density
    (reference ``_multivariate_students_t``, ``gaussian_components.py:334-344``)."""
    D = x.shape[-1]
    delta = x - mu
    maha = jnp.einsum("...d,...de,...e->...", delta, inv_covar, delta)
    return _student_t_from_maha(maha, logdet_covar, v, D)


def log_post_pred(params: PredParams, x: jnp.ndarray) -> jnp.ndarray:
    """[K] log posterior predictive of ``x`` under every slot
    (reference ``log_post_pred``, ``gaussian_components.py:228-251``)."""
    return _mvt_logpdf(x, params.mu, params.inv_covar, params.logdet_covar, params.v)


def log_post_pred_batch(params: PredParams, X: jnp.ndarray,
                        precision=None) -> jnp.ndarray:
    """[M, K] scores.  The Mahalanobis form expands into matmuls:
        d' A d = x'Ax - 2 x'(A mu) + mu'A mu  with A = inv_covar[k].

    ``precision``: pass ``jax.lax.Precision.HIGHEST`` when the scores feed
    an argmax over K (e.g. the assignment chains): the TPU's default f32
    matmul runs bf16 passes whose error (~1e-2 relative) is amplified by the
    cancellation in the expanded Mahalanobis form and is large enough to
    flip assignments.  The default is fine for the logsumexp'ed candidate
    marginals."""
    # x'Ax as ONE symmetric-packed [M, D(D+1)/2] x [D(D+1)/2, K] matmul on
    # the MXU (A symmetric; off-diagonal lanes doubled -- the same packing
    # as segmenters.fullcov.fullcov_score_inputs / the Pallas scoring
    # kernel's tables), instead of the D^2-lane outer-product expansion:
    # 1.86x fewer MACs, and XLA lowers the packed form to a clean MXU dot
    # where the unpacked one fused into a slow loop (round-5 profile:
    # 0.54 -> ~0.2 ms/sweep for the full-NIW chain base table).
    M, D_ = X.shape
    iu0, iu1 = jnp.triu_indices(D_)
    dbl = jnp.where(iu0 == iu1, 1.0, 2.0).astype(X.dtype)
    xx = X[:, iu0] * X[:, iu1]                       # [M, D(D+1)/2]
    A2 = params.inv_covar[:, iu0, iu1] * dbl         # [K, D(D+1)/2]
    xAx = jnp.matmul(xx, A2.T, precision=precision)
    Amu = jnp.einsum("kde,ke->kd", params.inv_covar, params.mu,
                     precision=precision)  # [K, D]
    xAmu = jnp.matmul(X, Amu.T, precision=precision)  # [M, K]
    muAmu = jnp.sum(params.mu * Amu, axis=-1)  # [K]
    maha = xAx - 2.0 * xAmu + muAmu[None, :]
    D = X.shape[-1]
    return _student_t_from_maha(
        maha, params.logdet_covar[None, :], params.v[None, :], D
    )


def log_prior(prior: NIW, x: jnp.ndarray) -> jnp.ndarray:
    """Log density under the prior predictive
    (reference ``log_prior``, ``gaussian_components.py:207-214``)."""
    D = prior.m_0.shape[-1]
    v = prior.v_0 - D + 1.0
    covar = (prior.k_0 + 1.0) / (prior.k_0 * v) * prior.S_0
    inv, logdet = _chol_inv_logdet(covar)
    return _mvt_logpdf(x, prior.m_0, inv, logdet, v)


def log_prior_batch(prior: NIW, X: jnp.ndarray) -> jnp.ndarray:
    return log_prior(prior, X)


def log_marg_k_vec(prior: NIW, stats: SuffStats) -> jnp.ndarray:
    """[K] log marginal of each slot's members; 0 for empty slots
    (reference ``log_marg_k``, ``gaussian_components.py:253-276``)."""
    D = stats.sum_x.shape[-1]
    n = stats.counts.astype(stats.sum_x.dtype)
    k_n = prior.k_0 + n
    v_n = prior.v_0 + n
    m_n = (prior.k_0 * prior.m_0 + stats.sum_x) / k_n[:, None]
    s_n_partial = prior.S_0 + prior.k_0 * _outer(prior.m_0, prior.m_0) + stats.sum_sq
    s_n = s_n_partial - k_n[:, None, None] * _outer(m_n, m_n)
    eye = jnp.eye(D, dtype=s_n.dtype)
    s_n_safe = jnp.where((stats.counts > 0)[:, None, None], s_n, eye)
    if D <= _UNROLL_D_MAX:
        # S_N is SPD (it dominates S_0 > 0): Cholesky logdet, unrolled --
        # slogdet's LU custom call costs ~3.2 ms/sweep at [K=1000, D=13].
        logdet_s_n = _chol_logdet_unrolled(s_n_safe)
        logdet_s_0 = _chol_logdet_unrolled(prior.S_0)
    else:
        _, logdet_s_n = jnp.linalg.slogdet(s_n_safe)
        _, logdet_s_0 = jnp.linalg.slogdet(prior.S_0)
    i = jnp.arange(1, D + 1, dtype=s_n.dtype)
    gam = jnp.sum(
        gammaln((v_n[:, None] + 1.0 - i[None, :]) / 2.0)
        - gammaln((prior.v_0 + 1.0 - i[None, :]) / 2.0),
        axis=-1,
    )
    out = (
        -n * D / 2.0 * _LOG_PI
        + D / 2.0 * jnp.log(prior.k_0)
        - D / 2.0 * jnp.log(k_n)
        + prior.v_0 / 2.0 * logdet_s_0
        - v_n / 2.0 * logdet_s_n
        + gam
    )
    return jnp.where(stats.counts > 0, out, 0.0)


def log_marg(prior: NIW, stats: SuffStats) -> jnp.ndarray:
    return jnp.sum(log_marg_k_vec(prior, stats))


def map_k(prior: NIW, stats: SuffStats, k):
    """MAP estimate of (mean, covariance) for slot ``k``
    (reference ``map``, ``gaussian_components.py:305-316``)."""
    n = stats.counts[k].astype(stats.sum_x.dtype)
    k_n = prior.k_0 + n
    v_n = prior.v_0 + n
    m_n = (prior.k_0 * prior.m_0 + stats.sum_x[k]) / k_n
    D = stats.sum_x.shape[-1]
    s_n = (
        prior.S_0
        + prior.k_0 * _outer(prior.m_0, prior.m_0)
        + stats.sum_sq[k]
        - k_n * _outer(m_n, m_n)
    )
    return m_n, s_n / (v_n + D + 2.0)


def rand_k(key: jax.Array, prior: NIW, stats: SuffStats, k):
    """Posterior NIW draw of (mean, covariance) for slot ``k``.

    The reference samples via Bartlett decomposition
    (``gaussian_components.py:291-303`` with ``wishart.py:16-32``).  We use the
    standard Bartlett construction for an inverse-Wishart(S_N, v_N) draw:
    Sigma = L A^{-T} A^{-1} L^T with L = chol(S_N) and A the Bartlett factor.
    """
    n = stats.counts[k].astype(stats.sum_x.dtype)
    k_n = prior.k_0 + n
    v_n = prior.v_0 + n
    m_n = (prior.k_0 * prior.m_0 + stats.sum_x[k]) / k_n
    D = stats.sum_x.shape[-1]
    s_n = (
        prior.S_0
        + prior.k_0 * _outer(prior.m_0, prior.m_0)
        + stats.sum_sq[k]
        - k_n * _outer(m_n, m_n)
    )
    key_chi, key_norm, key_mean = jax.random.split(key, 3)
    # Bartlett factor A: lower-triangular, A_ii ~ sqrt(chi2(v_n - i)),
    # A_ij ~ N(0, 1) for i > j.
    i = jnp.arange(D, dtype=s_n.dtype)
    chi2 = 2.0 * jax.random.gamma(key_chi, (v_n - i) / 2.0, shape=(D,), dtype=s_n.dtype)
    normals = jax.random.normal(key_norm, (D, D), dtype=s_n.dtype)
    A = jnp.tril(normals, -1) + jnp.diag(jnp.sqrt(chi2))
    L = jnp.linalg.cholesky(s_n)
    # Wishart(S_N^{-1}, v_N) = (L^{-T} A)(L^{-T} A)^T; its inverse is the IW draw.
    inv_A = jax.scipy.linalg.solve_triangular(A, jnp.eye(D, dtype=s_n.dtype), lower=True)
    factor = L @ inv_A.T  # chol-like factor of the IW draw
    sigma = factor @ factor.T
    mean_chol = jnp.linalg.cholesky(sigma / k_n)
    mu = m_n + mean_chol @ jax.random.normal(key_mean, (D,), dtype=s_n.dtype)
    return mu, sigma


if __name__ == "__main__":  # smoke demo (reference gaussian_components.py:370-465)
    from segmentalist_tpu.demos import demo_components

    demo_components("full")
