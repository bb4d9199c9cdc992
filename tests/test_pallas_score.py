"""Fused scoring kernel vs the XLA scoring path (vectorised-vs-unvectorised
consistency, SURVEY.md section 4 technique #2)."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from segmentalist_tpu.models import components_fixedvar as cfv
from segmentalist_tpu.models.fbgmm import log_weights
from segmentalist_tpu.ops.pallas_score import fixedvar_log_margs
from segmentalist_tpu.ops.random import logsumexp
from segmentalist_tpu.ops.stats import SuffStats
from segmentalist_tpu.priors import FixedVarPrior


def test_fixedvar_log_margs_matches_xla():
    rng = np.random.RandomState(0)
    B, M, D, K = 5, 9, 4, 11
    prior = FixedVarPrior.create(0.1 * np.ones(D), np.zeros(D), np.ones(D))
    counts = jnp.asarray(rng.randint(0, 3, (B, K)), dtype=jnp.int32)
    sum_x = jnp.asarray(rng.randn(B, K, D) * np.asarray(counts)[..., None])
    sum_sq = jnp.zeros((B, K, D))
    Xc = jnp.asarray(rng.randn(B, M, D))
    prior_c = jax.vmap(lambda x: cfv.log_prior_batch(prior, x))(Xc)

    params = jax.vmap(lambda c, s, q: cfv.predictive_params(
        prior, SuffStats(counts=c, sum_x=s, sum_sq=q)))(counts, sum_x, sum_sq)
    w = jax.vmap(lambda c: log_weights(c, 1.0, K, 1.0,
                                       include_denominator=True,
                                       dtype=Xc.dtype))(counts)

    post = jax.vmap(cfv.log_post_pred_batch)(params, Xc)
    logits = w[:, None, :] + jnp.where(
        (counts > 0)[:, None, :], post, prior_c[..., None])
    ref = logsumexp(logits, axis=-1)

    got = fixedvar_log_margs(
        Xc, prior_c, params.mu_pred, params.prec_pred, params.log_prod_prec,
        w, counts, K=K, interpret=True)
    npt.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10,
                        atol=1e-10)


def test_fixedvar_log_margs_all_empty_and_neginf():
    """Empty components fall back to the prior; an all -inf row stays -inf."""
    rng = np.random.RandomState(1)
    B, M, D, K = 2, 4, 3, 6
    prior = FixedVarPrior.create(0.5 * np.ones(D), np.zeros(D), np.ones(D))
    counts = jnp.zeros((B, K), jnp.int32)  # everything empty
    sum_x = jnp.zeros((B, K, D))
    sum_sq = jnp.zeros((B, K, D))
    Xc = jnp.asarray(rng.randn(B, M, D))
    prior_c = jax.vmap(lambda x: cfv.log_prior_batch(prior, x))(Xc)
    prior_c = prior_c.at[1, 2].set(-jnp.inf)  # a masked candidate

    params = jax.vmap(lambda c, s, q: cfv.predictive_params(
        prior, SuffStats(counts=c, sum_x=s, sum_sq=q)))(counts, sum_x, sum_sq)
    w = jax.vmap(lambda c: log_weights(c, 1.0, K, 1.0,
                                       include_denominator=True,
                                       dtype=Xc.dtype))(counts)
    got = fixedvar_log_margs(
        Xc, prior_c, params.mu_pred, params.prec_pred, params.log_prod_prec,
        w, counts, K=K, interpret=True)
    # All-empty: log_marg = logsumexp_k(w_k) + prior = prior (weights sum
    # to ~1 under the collapsed-Dirichlet denominator).
    post = jax.vmap(cfv.log_post_pred_batch)(params, Xc)
    logits = w[:, None, :] + jnp.where(
        (counts > 0)[:, None, :], post, prior_c[..., None])
    ref = logsumexp(logits, axis=-1)
    npt.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)
    assert np.isneginf(np.asarray(got)[1, 2])


def test_diag_log_margs_matches_xla():
    from segmentalist_tpu.models import components_diag as cdg
    from segmentalist_tpu.ops.pallas_score import diag_log_margs
    from segmentalist_tpu.priors import NIW

    rng = np.random.RandomState(2)
    B, M, D, K = 4, 7, 3, 9
    prior = NIW.create(np.zeros(D), 1.0, 4.0, 0.5 * np.ones(D))
    counts = jnp.asarray(rng.randint(0, 3, (B, K)), dtype=jnp.int32)
    sum_x = jnp.asarray(rng.randn(B, K, D) * np.asarray(counts)[..., None])
    sum_sq = jnp.asarray(
        np.abs(rng.randn(B, K, D)) * np.asarray(counts)[..., None]
        + np.asarray(sum_x) ** 2 / np.maximum(np.asarray(counts), 1)[..., None]
    )
    Xc = jnp.asarray(rng.randn(B, M, D))
    prior_c = jax.vmap(lambda x: cdg.log_prior_batch(prior, x))(Xc)

    params = jax.vmap(lambda c, s, q: cdg.predictive_params(
        prior, SuffStats(counts=c, sum_x=s, sum_sq=q)))(counts, sum_x, sum_sq)
    w = jax.vmap(lambda c: log_weights(c, 1.0, K, 1.0,
                                       include_denominator=True,
                                       dtype=Xc.dtype))(counts)

    post = jax.vmap(cdg.log_post_pred_batch)(params, Xc)
    logits = w[:, None, :] + jnp.where(
        (counts > 0)[:, None, :], post, prior_c[..., None])
    ref = logsumexp(logits, axis=-1)
    got = diag_log_margs(
        Xc, prior_c, params.mu, params.inv_var, params.log_prod_var,
        params.v, w, counts, K=K, interpret=True)
    npt.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-9,
                        atol=1e-9)


def test_fixedvar_log_margs_m_tiled():
    """M > 256 exercises the candidate-axis grid tiling (long utterances
    previously OOM'ed scoped VMEM)."""
    rng = np.random.RandomState(3)
    B, M, D, K = 3, 300, 4, 7
    prior = FixedVarPrior.create(0.1 * np.ones(D), np.zeros(D), np.ones(D))
    counts = jnp.asarray(rng.randint(0, 3, (B, K)), dtype=jnp.int32)
    sum_x = jnp.asarray(rng.randn(B, K, D) * np.asarray(counts)[..., None])
    sum_sq = jnp.zeros((B, K, D))
    Xc = jnp.asarray(rng.randn(B, M, D))
    prior_c = jax.vmap(lambda x: cfv.log_prior_batch(prior, x))(Xc)
    params = jax.vmap(lambda c, s, q: cfv.predictive_params(
        prior, SuffStats(counts=c, sum_x=s, sum_sq=q)))(counts, sum_x, sum_sq)
    w = jax.vmap(lambda c: log_weights(c, 1.0, K, 1.0,
                                       include_denominator=True,
                                       dtype=Xc.dtype))(counts)
    post = jax.vmap(cfv.log_post_pred_batch)(params, Xc)
    ref = logsumexp(w[:, None, :] + jnp.where(
        (counts > 0)[:, None, :], post, prior_c[..., None]), axis=-1)
    got = fixedvar_log_margs(
        Xc, prior_c, params.mu_pred, params.prec_pred, params.log_prod_prec,
        w, counts, K=K, interpret=True)
    npt.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10,
                        atol=1e-10)


def test_fullcov_log_margs_matches_xla():
    from segmentalist_tpu.models import components_full as cf
    from segmentalist_tpu.ops.pallas_score import fullcov_log_margs
    from segmentalist_tpu.ops.stats import suff_stats_from_assignments
    from segmentalist_tpu.priors import NIW
    from segmentalist_tpu.segmenters.fullcov import (
        corrected_candidate_post, fullcov_score_inputs, touched_leave_out)

    rng = np.random.RandomState(5)
    D, K, N, B, M = 4, 6, 40, 3, 7
    X = jnp.asarray(rng.randn(N, D))
    prior = NIW.create(np.zeros(D), 1.0, D + 2.0,
                       np.eye(D) + 0.1 * np.ones((D, D)))
    assignments = jnp.asarray(rng.randint(-1, K - 2, N), dtype=jnp.int32)
    stats = suff_stats_from_assignments(X, assignments, K, full_cov=True)
    old_embeds = jnp.asarray(
        [[0, 1, 2, -1], [3, 3, 4, 5], [-1, -1, -1, -1]], dtype=jnp.int32)
    old_ks = jnp.where(old_embeds >= 0,
                       assignments[jnp.maximum(old_embeds, 0)], -1)
    cand_ids = jnp.asarray(rng.randint(0, N, (B, M)), dtype=jnp.int32)
    Xc = X[cand_ids]
    prior_c = jax.vmap(lambda x: cf.log_prior_batch(prior, x))(Xc)
    params_g = cf.predictive_params(prior, stats)
    touched = touched_leave_out(prior, stats, X, old_embeds, old_ks)
    from segmentalist_tpu.segmenters.fullcov import counts_contrib

    lo_counts = stats.counts[None] - counts_contrib(
        old_ks, old_embeds >= 0, K)
    w = jax.vmap(lambda c: log_weights(c, 1.0, K, 1.0,
                                       include_denominator=True,
                                       dtype=Xc.dtype))(lo_counts)

    post = cf.log_post_pred_batch(
        params_g, Xc.reshape(B * M, D)).reshape(B, M, K)
    post = corrected_candidate_post(post, Xc, touched, K)
    logits = w[:, None, :] + jnp.where(
        (lo_counts > 0)[:, None, :], post, prior_c[..., None])
    ref = logsumexp(logits, axis=-1)

    g, t, oh_t, tmask_t = fullcov_score_inputs(params_g, touched)
    got = fullcov_log_margs(Xc, prior_c, *g, *t, oh_t, tmask_t, w,
                            lo_counts, K=K, interpret=True)
    npt.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-8,
                        atol=1e-8)


def test_fixedvar_log_margs_T_matches_untransposed():
    """The feature-major entry point (T-layout tables from
    predictive_params_T over leave_out_moments_T sums) reproduces the
    component-major path's scores."""
    rng = np.random.RandomState(3)
    B, S, M, D, K = 4, 6, 9, 4, 11
    prior = FixedVarPrior.create(0.1 * np.ones(D), np.zeros(D), np.ones(D))
    X = jnp.asarray(rng.randn(40, D))
    embeds = jnp.asarray(rng.randint(-1, 40, (B, S)), jnp.int32)
    ks = jnp.where(embeds >= 0, rng.randint(0, K, (B, S)), -1)
    from segmentalist_tpu.ops import stats as stats_ops
    from segmentalist_tpu.segmenters.common import (
        leave_out_moments_T, leave_out_stats, utterance_contrib)

    assign_all = jnp.asarray(rng.randint(0, K, (40,)), jnp.int32)
    gstats = stats_ops.suff_stats_from_assignments(X, assign_all, K_max=K,
                                                   full_cov=False)
    lo = leave_out_stats(gstats,
                         utterance_contrib(X, embeds, ks, K, False))
    params = jax.vmap(lambda c, s, q: cfv.predictive_params(
        prior, SuffStats(counts=c, sum_x=s, sum_sq=q)))(
        lo.counts, lo.sum_x, lo.sum_sq)

    sum_xT, _ = leave_out_moments_T(gstats, X, embeds, ks, K, with_sq=False)
    muT, precT = cfv.predictive_params_T(prior, lo.counts, sum_xT)
    npt.assert_allclose(np.asarray(muT),
                        np.asarray(jnp.swapaxes(params.mu_pred, 1, 2)),
                        rtol=1e-12, atol=1e-12)
    npt.assert_allclose(np.asarray(precT),
                        np.asarray(jnp.swapaxes(params.prec_pred, 1, 2)),
                        rtol=1e-12, atol=1e-12)

    Xc = jnp.asarray(rng.randn(B, M, D))
    prior_c = jax.vmap(lambda x: cfv.log_prior_batch(prior, x))(Xc)
    w = jax.vmap(lambda c: log_weights(c, 1.0, K, 1.0,
                                       include_denominator=True,
                                       dtype=Xc.dtype))(lo.counts)
    from segmentalist_tpu.ops.pallas_score import fixedvar_log_margs_T

    ref = fixedvar_log_margs(
        Xc, prior_c, params.mu_pred, params.prec_pred, params.log_prod_prec,
        w, lo.counts, K=K, interpret=True)
    got = fixedvar_log_margs_T(Xc, prior_c, muT, precT, w, lo.counts, K=K,
                               interpret=True)
    npt.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12,
                        atol=1e-12)


def test_diag_log_margs_T_matches_untransposed():
    rng = np.random.RandomState(4)
    B, S, M, D, K = 3, 5, 7, 4, 9
    from segmentalist_tpu.models import components_diag as cdg
    from segmentalist_tpu.ops import stats as stats_ops
    from segmentalist_tpu.priors import NIW
    from segmentalist_tpu.segmenters.common import (
        leave_out_moments_T, leave_out_stats, utterance_contrib)
    from segmentalist_tpu.ops.pallas_score import (
        diag_log_margs, diag_log_margs_T)

    prior = NIW.create(np.zeros(D), 0.5, D + 3.0, 0.4 * np.ones(D))
    X = jnp.asarray(rng.randn(30, D))
    embeds = jnp.asarray(rng.randint(-1, 30, (B, S)), jnp.int32)
    ks = jnp.where(embeds >= 0, rng.randint(0, K, (B, S)), -1)
    assign_all = jnp.asarray(rng.randint(0, K, (30,)), jnp.int32)
    gstats = stats_ops.suff_stats_from_assignments(X, assign_all, K_max=K,
                                                   full_cov=False)
    lo = leave_out_stats(gstats,
                         utterance_contrib(X, embeds, ks, K, False))
    params = jax.vmap(lambda c, s, q: cdg.predictive_params(
        prior, SuffStats(counts=c, sum_x=s, sum_sq=q)))(
        lo.counts, lo.sum_x, lo.sum_sq)

    sum_xT, sum_sqT = leave_out_moments_T(gstats, X, embeds, ks, K,
                                          with_sq=True)
    muT, inv_varT, lpv, v = cdg.predictive_params_T(prior, lo.counts, sum_xT,
                                                    sum_sqT)
    # The constant is computed from var itself: bit-match to the non-T path.
    npt.assert_array_equal(np.asarray(lpv), np.asarray(params.log_prod_var))
    npt.assert_allclose(np.asarray(muT),
                        np.asarray(jnp.swapaxes(params.mu, 1, 2)),
                        rtol=1e-10, atol=1e-12)
    npt.assert_allclose(np.asarray(inv_varT),
                        np.asarray(jnp.swapaxes(params.inv_var, 1, 2)),
                        rtol=1e-10, atol=1e-12)
    npt.assert_allclose(np.asarray(v), np.asarray(params.v), rtol=1e-12)

    Xc = jnp.asarray(rng.randn(B, M, D))
    prior_c = jax.vmap(lambda x: cdg.log_prior_batch(prior, x))(Xc)
    w = jax.vmap(lambda c: log_weights(c, 1.0, K, 1.0,
                                       include_denominator=True,
                                       dtype=Xc.dtype))(lo.counts)
    ref = diag_log_margs(Xc, prior_c, params.mu, params.inv_var,
                         params.log_prod_var, params.v, w, lo.counts,
                         K=K, interpret=True)
    got = diag_log_margs_T(Xc, prior_c, muT, inv_varT, lpv, v, w, lo.counts,
                           K=K, interpret=True)
    npt.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10,
                        atol=1e-10)


def test_prefix_skip_matches_unbounded():
    """valid_m (candidate-prefix bounds + length-sorted utterance tiles)
    must leave every valid slot's score bit-identical to the unbounded
    call; slots past the prefix are NEG_INF or garbage and always masked
    downstream (common.masked_candidate_scores)."""
    rng = np.random.RandomState(7)
    B, M, D, K = 9, 100, 4, 11
    prior = FixedVarPrior.create(0.1 * np.ones(D), np.zeros(D), np.ones(D))
    counts = jnp.asarray(rng.randint(0, 3, (B, K)), dtype=jnp.int32)
    sum_x = jnp.asarray(rng.randn(B, K, D) * np.asarray(counts)[..., None])
    sum_sq = jnp.zeros((B, K, D))
    Xc = jnp.asarray(rng.randn(B, M, D))
    prior_c = jax.vmap(lambda x: cfv.log_prior_batch(prior, x))(Xc)
    params = jax.vmap(lambda c, s, q: cfv.predictive_params(
        prior, SuffStats(counts=c, sum_x=s, sum_sq=q)))(counts, sum_x, sum_sq)
    w = jax.vmap(lambda c: log_weights(c, 1.0, K, 1.0,
                                       include_denominator=True,
                                       dtype=Xc.dtype))(counts)
    valid_m = jnp.asarray(rng.randint(4, M + 1, B), jnp.int32)
    ref = fixedvar_log_margs(
        Xc, prior_c, params.mu_pred, params.prec_pred, params.log_prod_prec,
        w, counts, K=K, interpret=True)
    got = fixedvar_log_margs(
        Xc, prior_c, params.mu_pred, params.prec_pred, params.log_prod_prec,
        w, counts, K=K, interpret=True, valid_m=valid_m)
    ref_np, got_np = np.asarray(ref), np.asarray(got)
    vm = np.asarray(valid_m)
    for b in range(B):
        npt.assert_array_equal(got_np[b, : vm[b]], ref_np[b, : vm[b]])


def test_prefix_skip_diag_and_fullcov():
    from segmentalist_tpu.models import components_diag as cdg
    from segmentalist_tpu.models import components_full as cf
    from segmentalist_tpu.ops.pallas_score import (
        diag_log_margs, fullcov_log_margs)
    from segmentalist_tpu.ops.stats import suff_stats_from_assignments
    from segmentalist_tpu.priors import NIW
    from segmentalist_tpu.segmenters.fullcov import (
        counts_contrib, fullcov_score_inputs, touched_leave_out)

    rng = np.random.RandomState(8)
    B, M, D, K = 5, 90, 3, 9
    prior = NIW.create(np.zeros(D), 1.0, 4.0, 0.5 * np.ones(D))
    counts = jnp.asarray(rng.randint(0, 3, (B, K)), dtype=jnp.int32)
    sum_x = jnp.asarray(rng.randn(B, K, D) * np.asarray(counts)[..., None])
    sum_sq = jnp.asarray(
        np.abs(rng.randn(B, K, D)) * np.asarray(counts)[..., None]
        + np.asarray(sum_x) ** 2 / np.maximum(np.asarray(counts), 1)[..., None]
    )
    Xc = jnp.asarray(rng.randn(B, M, D))
    prior_c = jax.vmap(lambda x: cdg.log_prior_batch(prior, x))(Xc)
    params = jax.vmap(lambda c, s, q: cdg.predictive_params(
        prior, SuffStats(counts=c, sum_x=s, sum_sq=q)))(counts, sum_x, sum_sq)
    w = jax.vmap(lambda c: log_weights(c, 1.0, K, 1.0,
                                       include_denominator=True,
                                       dtype=Xc.dtype))(counts)
    valid_m = jnp.asarray(rng.randint(4, M + 1, B), jnp.int32)
    ref = diag_log_margs(
        Xc, prior_c, params.mu, params.inv_var, params.log_prod_var,
        params.v, w, counts, K=K, interpret=True)
    got = diag_log_margs(
        Xc, prior_c, params.mu, params.inv_var, params.log_prod_var,
        params.v, w, counts, K=K, interpret=True, valid_m=valid_m)
    ref_np, got_np, vm = np.asarray(ref), np.asarray(got), np.asarray(valid_m)
    for b in range(B):
        npt.assert_array_equal(got_np[b, : vm[b]], ref_np[b, : vm[b]])

    # Full covariance (touched-slot corrections ride the sort too).
    D2, K2, N, S = 4, 6, 40, 4
    X = jnp.asarray(rng.randn(N, D2))
    prior2 = NIW.create(np.zeros(D2), 1.0, D2 + 2.0,
                        np.eye(D2) + 0.1 * np.ones((D2, D2)))
    assignments = jnp.asarray(rng.randint(-1, K2 - 2, N), dtype=jnp.int32)
    stats = suff_stats_from_assignments(X, assignments, K2, full_cov=True)
    old_embeds = jnp.asarray(rng.randint(-1, N, (B, S)), jnp.int32)
    old_ks = jnp.where(old_embeds >= 0,
                       assignments[jnp.maximum(old_embeds, 0)], -1)
    Xc2 = X[jnp.asarray(rng.randint(0, N, (B, M)), jnp.int32)]
    prior_c2 = jax.vmap(lambda x: cf.log_prior_batch(prior2, x))(Xc2)
    params_g = cf.predictive_params(prior2, stats)
    touched = touched_leave_out(prior2, stats, X, old_embeds, old_ks)
    lo_counts = stats.counts[None] - counts_contrib(
        old_ks, old_embeds >= 0, K2)
    w2 = jax.vmap(lambda c: log_weights(c, 1.0, K2, 1.0,
                                        include_denominator=True,
                                        dtype=Xc2.dtype))(lo_counts)
    g, t, oh_t, tmask_t = fullcov_score_inputs(params_g, touched)
    ref2 = fullcov_log_margs(Xc2, prior_c2, *g, *t, oh_t, tmask_t, w2,
                             lo_counts, K=K2, interpret=True)
    got2 = fullcov_log_margs(Xc2, prior_c2, *g, *t, oh_t, tmask_t, w2,
                             lo_counts, K=K2, interpret=True,
                             valid_m=valid_m)
    ref_np, got_np = np.asarray(ref2), np.asarray(got2)
    for b in range(B):
        npt.assert_array_equal(got_np[b, : vm[b]], ref_np[b, : vm[b]])
