"""Pallas assignment-chain kernel vs the XLA scan fallback.

Both consume the same pre-drawn Gumbel noise, so the sampled chains must be
identical (test technique #2 of the reference: vectorised-vs-unvectorised
consistency, SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from segmentalist_tpu.models import components_fixedvar as cov
from segmentalist_tpu.ops.pallas_chain import fixedvar_chain
from segmentalist_tpu.ops.stats import (
    SuffStats, add_item, canonicalize_new_component)
from segmentalist_tpu.priors import FixedVarPrior


def _xla_chain(X, lo, params, embeds, gumb, log_prior_vec, alpha, K, lms,
               temp, use_argmax):
    def step(carry, inp):
        stats_b, p_b = carry
        e, g = inp
        ok = e >= 0
        x = X[jnp.maximum(e, 0)]
        c = stats_b.counts.astype(X.dtype)
        w = lms * jnp.log(alpha / K + c)
        post = cov.log_post_pred(p_b, x)
        logits = w + jnp.where(stats_b.counts > 0, post,
                               log_prior_vec[jnp.maximum(e, 0)])
        if use_argmax:
            k = jnp.argmax(logits)
        else:
            k = jnp.argmax(jnp.where(jnp.isneginf(logits), -jnp.inf,
                                     logits / temp + g))
        k = canonicalize_new_component(stats_b.counts, k)
        stats_b = add_item(stats_b, x, k, weight=ok.astype(jnp.int32))
        p_b = cov.update_predictive_row(prior_g, stats_b, p_b, k)
        return (stats_b, p_b), jnp.where(ok, k.astype(jnp.int32), -1)

    (_, _), ks = jax.lax.scan(step, (lo, params), (embeds, gumb))
    return ks


def test_pallas_chain_matches_xla_scan():
    global prior_g
    rng = np.random.RandomState(0)
    B, S, D, K = 5, 7, 4, 10
    N = 64
    X = jnp.asarray(rng.randn(N, D).astype(np.float32))
    prior_g = FixedVarPrior.create(
        0.1 * np.ones(D, np.float32), np.zeros(D, np.float32),
        np.ones(D, np.float32))
    assignments = rng.randint(-1, K, N)
    counts = np.zeros((B, K), np.int32)
    sum_x = np.zeros((B, K, D), np.float32)
    # Independent random leave-out stats per utterance.
    for b in range(B):
        for i in range(N):
            if rng.rand() < 0.7 and assignments[i] >= 0:
                counts[b, assignments[i]] += 1
                sum_x[b, assignments[i]] += np.asarray(X[i])
    embeds = rng.randint(0, N, (B, S)).astype(np.int32)
    embeds[rng.rand(B, S) < 0.3] = -1
    gumb = np.asarray(
        jax.random.gumbel(jax.random.PRNGKey(1), (B, S, K))
    ).astype(np.float32)
    lpv = cov.log_prior_batch(prior_g, X)
    alpha, lms, temp = 1.0, 1.2, 0.7

    for use_argmax in (False, True):
        ks_ref = []
        for b in range(B):
            lo = SuffStats(jnp.asarray(counts[b]), jnp.asarray(sum_x[b]),
                           jnp.zeros((K, D), jnp.float32))
            params = cov.predictive_params(prior_g, lo)
            ks_ref.append(np.asarray(_xla_chain(
                X, lo, params, jnp.asarray(embeds[b]), jnp.asarray(gumb[b]),
                lpv, alpha, K, 1.0 if use_argmax else lms,
                jnp.float32(temp), use_argmax)))
        ks_pal = fixedvar_chain(
            jnp.asarray(embeds), X[jnp.maximum(jnp.asarray(embeds), 0)],
            lpv[jnp.maximum(jnp.asarray(embeds), 0)], jnp.asarray(gumb),
            jnp.asarray(counts), jnp.asarray(sum_x),
            prior_g.var, prior_g.var_0, prior_g.mu_0, jnp.float32(temp),
            alpha=alpha, K=K, lms=1.0 if use_argmax else lms,
            use_argmax=use_argmax, interpret=True)
        npt.assert_array_equal(np.asarray(ks_pal), np.stack(ks_ref),
                               err_msg=f"use_argmax={use_argmax}")


def test_bigram_pallas_chain_matches_xla_scan():
    """Bigram-conditioned chain kernel vs an XLA transcription of the
    reference's gibbs_sample_inside_loop_i_embed, on shared Gumbel noise."""
    from segmentalist_tpu.ops.pallas_chain import bigram_fixedvar_chain

    rng = np.random.RandomState(2)
    B, S, D, K = 6, 5, 3, 9
    N = 48
    lam, a, b_s, lms, temp = 0.2, 1.0, 1.5, 1.1, 0.8
    X = jnp.asarray(rng.randn(N, D).astype(np.float32))
    prior = FixedVarPrior.create(
        0.1 * np.ones(D, np.float32), np.zeros(D, np.float32),
        np.ones(D, np.float32))
    counts = rng.randint(0, 6, (B, K)).astype(np.int32)
    counts[:, -2] = 0  # keep an empty slot around
    sum_x = (counts[..., None] * rng.randn(B, K, D)).astype(np.float32) * 0.1
    uni_lo = rng.randint(0, 8, (B, K)).astype(np.int32)
    big_table = rng.randint(0, 5, (K, K)).astype(np.int32)
    corr_j = rng.randint(-1, K, (B, S)).astype(np.int32)
    corr_i = rng.randint(-1, K, (B, S)).astype(np.int32)
    embeds = rng.randint(0, N, (B, S)).astype(np.int32)
    embeds[rng.rand(B, S) < 0.25] = -1
    gumb = np.asarray(jax.random.gumbel(jax.random.PRNGKey(5), (B, S, K))
                      ).astype(np.float32)
    lpv = cov.log_prior_batch(prior, X)

    def xla_chain(b):
        uni = uni_lo[b].astype(np.float32)
        uni_prob = jnp.asarray((uni + a / K) / (uni.sum() + a))
        uni_w = lms * jnp.asarray(
            np.log(uni + a / K) - np.log(uni.sum() + a))
        onehot_pi = (jax.nn.one_hot(np.maximum(corr_i[b], 0), K)
                     * ((corr_i[b] >= 0) & (corr_j[b] >= 0))[:, None]
                     ).astype(jnp.float32)
        lo = SuffStats(jnp.asarray(counts[b]), jnp.asarray(sum_x[b]),
                       jnp.zeros((K, D), jnp.float32))
        params = cov.predictive_params(prior, lo)

        def step(carry, inp):
            stats_b, p_b, j_prev = carry
            e, g = inp
            ok = e >= 0
            x = X[jnp.maximum(e, 0)]
            j_s = jnp.maximum(j_prev, 0)
            row = jnp.asarray(big_table)[j_s].astype(jnp.float32)
            sel = (jnp.asarray(corr_j[b]) == j_s).astype(jnp.float32)
            row = row - sel @ onehot_pi
            uni_j = jnp.asarray(uni_lo[b])[j_s].astype(jnp.float32)
            p_cond = lam * uni_prob + (1 - lam) * (row + b_s / K) / (uni_j + b_s)
            w = jnp.where(j_prev >= 0, lms * jnp.log(p_cond), uni_w)
            post = cov.log_post_pred(p_b, x)
            logits = w + jnp.where(stats_b.counts > 0, post,
                                   lpv[jnp.maximum(e, 0)])
            k = jnp.argmax(jnp.where(jnp.isneginf(logits), -jnp.inf,
                                     logits / temp + g))
            k = canonicalize_new_component(stats_b.counts, k)
            stats_b = add_item(stats_b, x, k, weight=ok.astype(jnp.int32))
            p_b = cov.update_predictive_row(prior, stats_b, p_b, k)
            j_next = jnp.where(ok, k.astype(jnp.int32), j_prev)
            return (stats_b, p_b, j_next), jnp.where(ok, k.astype(jnp.int32), -1)

        (_, _, _), ks = jax.lax.scan(
            step, (lo, params, jnp.int32(-1)),
            (jnp.asarray(embeds[b]), jnp.asarray(gumb[b])))
        return np.asarray(ks)

    ks_ref = np.stack([xla_chain(b) for b in range(B)])
    ks_pal = bigram_fixedvar_chain(
        jnp.asarray(embeds), X[jnp.maximum(jnp.asarray(embeds), 0)],
        lpv[jnp.maximum(jnp.asarray(embeds), 0)], jnp.asarray(gumb),
        jnp.asarray(counts), jnp.asarray(sum_x),
        prior.var, prior.var_0, prior.mu_0, jnp.float32(temp),
        jnp.asarray(uni_lo), jnp.asarray(big_table),
        jnp.asarray(corr_j), jnp.asarray(corr_i),
        alpha_a=a, intrp_lambda=lam, b_smooth=b_s, K=K, lms=lms,
        interpret=True)
    npt.assert_array_equal(np.asarray(ks_pal), ks_ref)


def test_diag_pallas_chain_matches_xla_scan():
    """Diagonal-covariance chain kernel vs the XLA scan path, shared noise."""
    from segmentalist_tpu.models import components_diag as dcov
    from segmentalist_tpu.ops.pallas_chain import diag_chain
    from segmentalist_tpu.priors import NIW

    rng = np.random.RandomState(7)
    B, S, D, K = 5, 6, 4, 11
    N = 40
    X = jnp.asarray(rng.randn(N, D).astype(np.float32))
    prior = NIW.create(np.zeros(D, np.float32), 1.5, 5.0,
                       0.4 * np.ones(D, np.float32))
    counts = rng.randint(0, 5, (B, K)).astype(np.int32)
    counts[:, 3] = 0
    Z = rng.randn(B, K, D).astype(np.float32)
    sum_x = (counts[..., None] * Z * 0.2).astype(np.float32)
    # sum_sq must be >= what the sums imply; build from actual samples.
    sum_sq = np.abs(counts[..., None] * (Z * Z * 0.1 + 0.5)).astype(np.float32) \
        + (sum_x ** 2) / np.maximum(counts[..., None], 1)
    embeds = rng.randint(0, N, (B, S)).astype(np.int32)
    embeds[rng.rand(B, S) < 0.3] = -1
    gumb = np.asarray(jax.random.gumbel(jax.random.PRNGKey(9), (B, S, K))
                      ).astype(np.float32)
    lpv = dcov.log_prior_batch(prior, X)
    alpha, lms, temp = 1.0, 1.1, 0.9

    def xla_chain(b, use_argmax):
        lo = SuffStats(jnp.asarray(counts[b]), jnp.asarray(sum_x[b]),
                       jnp.asarray(sum_sq[b]))
        params = dcov.predictive_params(prior, lo)

        def step(carry, inp):
            stats_b, p_b = carry
            e, g = inp
            ok = e >= 0
            x = X[jnp.maximum(e, 0)]
            c = stats_b.counts.astype(jnp.float32)
            w = (1.0 if use_argmax else lms) * jnp.log(alpha / K + c)
            post = dcov.log_post_pred(p_b, x)
            logits = w + jnp.where(stats_b.counts > 0, post,
                                   lpv[jnp.maximum(e, 0)])
            if use_argmax:
                k = jnp.argmax(logits)
            else:
                k = jnp.argmax(jnp.where(jnp.isneginf(logits), -jnp.inf,
                                         logits / temp + g))
            k = canonicalize_new_component(stats_b.counts, k)
            stats_b = add_item(stats_b, x, k, weight=ok.astype(jnp.int32))
            p_b = dcov.update_predictive_row(prior, stats_b, p_b, k)
            return (stats_b, p_b), jnp.where(ok, k.astype(jnp.int32), -1)

        (_, _), ks = jax.lax.scan(
            step, (lo, params), (jnp.asarray(embeds[b]), jnp.asarray(gumb[b])))
        return np.asarray(ks)

    for use_argmax in (False, True):
        ks_ref = np.stack([xla_chain(b, use_argmax) for b in range(B)])
        ks_pal = diag_chain(
            jnp.asarray(embeds), X[jnp.maximum(jnp.asarray(embeds), 0)],
            lpv[jnp.maximum(jnp.asarray(embeds), 0)], jnp.asarray(gumb),
            jnp.asarray(counts), jnp.asarray(sum_x), jnp.asarray(sum_sq),
            prior.m_0, float(prior.k_0), float(prior.v_0), prior.S_0,
            jnp.float32(temp), alpha=alpha, K=K,
            lms=1.0 if use_argmax else lms, use_argmax=use_argmax,
            interpret=True)
        npt.assert_array_equal(np.asarray(ks_pal), ks_ref,
                               err_msg=f"use_argmax={use_argmax}")


def test_bigram_diag_pallas_chain_matches_xla_scan():
    """Bigram-conditioned diag chain kernel vs an XLA transcription of
    the reference gibbs_sample_inside_loop_i_embed with diag scoring,
    shared Gumbel noise."""
    from segmentalist_tpu.models import components_diag as dcov
    from segmentalist_tpu.ops.pallas_chain import bigram_diag_chain
    from segmentalist_tpu.priors import NIW

    rng = np.random.RandomState(13)
    B, S, D, K = 5, 6, 3, 9
    N = 40
    lam, a, b_s, lms, temp = 0.25, 1.0, 2.0, 1.05, 0.85
    X = jnp.asarray(rng.randn(N, D).astype(np.float32))
    prior = NIW.create(np.zeros(D, np.float32), 1.2, 4.0,
                       0.5 * np.ones(D, np.float32))
    counts = rng.randint(0, 5, (B, K)).astype(np.int32)
    counts[:, 4] = 0  # keep an empty slot around
    Z = rng.randn(B, K, D).astype(np.float32)
    sum_x = (counts[..., None] * Z * 0.2).astype(np.float32)
    sum_sq = np.abs(counts[..., None] * (Z * Z * 0.1 + 0.5)).astype(np.float32) \
        + (sum_x ** 2) / np.maximum(counts[..., None], 1)
    uni_lo = rng.randint(0, 7, (B, K)).astype(np.int32)
    big_table = rng.randint(0, 4, (K, K)).astype(np.int32)
    corr_j = rng.randint(-1, K, (B, S)).astype(np.int32)
    corr_i = rng.randint(-1, K, (B, S)).astype(np.int32)
    embeds = rng.randint(0, N, (B, S)).astype(np.int32)
    embeds[rng.rand(B, S) < 0.25] = -1
    gumb = np.asarray(jax.random.gumbel(jax.random.PRNGKey(17), (B, S, K))
                      ).astype(np.float32)
    lpv = dcov.log_prior_batch(prior, X)

    def xla_chain(b):
        uni = uni_lo[b].astype(np.float32)
        uni_prob = jnp.asarray((uni + a / K) / (uni.sum() + a))
        uni_w = lms * jnp.asarray(
            np.log(uni + a / K) - np.log(uni.sum() + a))
        onehot_pi = (jax.nn.one_hot(np.maximum(corr_i[b], 0), K)
                     * ((corr_i[b] >= 0) & (corr_j[b] >= 0))[:, None]
                     ).astype(jnp.float32)
        lo = SuffStats(jnp.asarray(counts[b]), jnp.asarray(sum_x[b]),
                       jnp.asarray(sum_sq[b]))
        params = dcov.predictive_params(prior, lo)

        def step(carry, inp):
            stats_b, p_b, j_prev = carry
            e, g = inp
            ok = e >= 0
            x = X[jnp.maximum(e, 0)]
            j_s = jnp.maximum(j_prev, 0)
            row = jnp.asarray(big_table)[j_s].astype(jnp.float32)
            sel = (jnp.asarray(corr_j[b]) == j_s).astype(jnp.float32)
            row = row - sel @ onehot_pi
            uni_j = jnp.asarray(uni_lo[b])[j_s].astype(jnp.float32)
            p_cond = lam * uni_prob + (1 - lam) * (row + b_s / K) / (uni_j + b_s)
            w = jnp.where(j_prev >= 0, lms * jnp.log(p_cond), uni_w)
            post = dcov.log_post_pred(p_b, x)
            logits = w + jnp.where(stats_b.counts > 0, post,
                                   lpv[jnp.maximum(e, 0)])
            k = jnp.argmax(jnp.where(jnp.isneginf(logits), -jnp.inf,
                                     logits / temp + g))
            k = canonicalize_new_component(stats_b.counts, k)
            stats_b = add_item(stats_b, x, k, weight=ok.astype(jnp.int32))
            p_b = dcov.update_predictive_row(prior, stats_b, p_b, k)
            j_next = jnp.where(ok, k.astype(jnp.int32), j_prev)
            return (stats_b, p_b, j_next), jnp.where(ok, k.astype(jnp.int32), -1)

        (_, _, _), ks = jax.lax.scan(
            step, (lo, params, jnp.int32(-1)),
            (jnp.asarray(embeds[b]), jnp.asarray(gumb[b])))
        return np.asarray(ks)

    ks_ref = np.stack([xla_chain(b) for b in range(B)])
    ks_pal = bigram_diag_chain(
        jnp.asarray(embeds), X[jnp.maximum(jnp.asarray(embeds), 0)],
        lpv[jnp.maximum(jnp.asarray(embeds), 0)], jnp.asarray(gumb),
        jnp.asarray(counts), jnp.asarray(sum_x), jnp.asarray(sum_sq),
        prior.m_0, float(prior.k_0), float(prior.v_0), prior.S_0,
        jnp.float32(temp),
        jnp.asarray(uni_lo), jnp.asarray(big_table),
        jnp.asarray(corr_j), jnp.asarray(corr_i),
        alpha_a=a, intrp_lambda=lam, b_smooth=b_s, K=K, lms=lms,
        interpret=True)
    npt.assert_array_equal(np.asarray(ks_pal), ks_ref)


def test_diag_chain_xla_twin_bit_identical():
    """The production XLA fallback (diag_chain_xla, used under GSPMD
    meshes) mirrors the Pallas kernel's Stirling-lgamma composition, so the
    chains must be EXACTLY equal on shared noise -- no near-tie carve-out."""
    from segmentalist_tpu.ops.pallas_chain import diag_chain, diag_chain_xla
    from segmentalist_tpu.priors import NIW

    rng = np.random.RandomState(31)
    B, S, D, K = 6, 7, 4, 12
    N = 50
    X = jnp.asarray(rng.randn(N, D).astype(np.float32))
    prior = NIW.create(np.zeros(D, np.float32), 1.5, 5.0,
                       0.4 * np.ones(D, np.float32))
    counts = rng.randint(0, 5, (B, K)).astype(np.int32)
    counts[:, 2] = 0
    Z = rng.randn(B, K, D).astype(np.float32)
    sum_x = (counts[..., None] * Z * 0.2).astype(np.float32)
    sum_sq = np.abs(counts[..., None] * (Z * Z * 0.1 + 0.5)).astype(np.float32) \
        + (sum_x ** 2) / np.maximum(counts[..., None], 1)
    embeds = rng.randint(0, N, (B, S)).astype(np.int32)
    embeds[rng.rand(B, S) < 0.3] = -1
    gumb = np.asarray(jax.random.gumbel(jax.random.PRNGKey(37), (B, S, K))
                      ).astype(np.float32)
    from segmentalist_tpu.models import components_diag as dcov
    lpv = dcov.log_prior_batch(prior, X)
    args = (jnp.asarray(embeds), X[jnp.maximum(jnp.asarray(embeds), 0)],
            lpv[jnp.maximum(jnp.asarray(embeds), 0)], jnp.asarray(gumb),
            jnp.asarray(counts), jnp.asarray(sum_x), jnp.asarray(sum_sq),
            prior.m_0, float(prior.k_0), float(prior.v_0), prior.S_0,
            jnp.float32(0.8))
    for use_argmax in (False, True):
        ks_pal = diag_chain(*args, alpha=1.0, K=K, lms=1.1,
                            use_argmax=use_argmax, interpret=True)
        ks_xla = diag_chain_xla(*args, alpha=1.0, K=K, lms=1.1,
                                use_argmax=use_argmax)
        npt.assert_array_equal(np.asarray(ks_pal), np.asarray(ks_xla),
                               err_msg=f"use_argmax={use_argmax}")


def test_bigram_diag_chain_xla_twin_bit_identical():
    """bigram_diag_chain_xla (GSPMD fallback) vs the Pallas kernel: exactly
    equal chains on shared noise."""
    from segmentalist_tpu.ops.pallas_chain import (
        bigram_diag_chain, bigram_diag_chain_xla)
    from segmentalist_tpu.priors import NIW

    rng = np.random.RandomState(41)
    B, S, D, K = 5, 6, 3, 10
    N = 40
    X = jnp.asarray(rng.randn(N, D).astype(np.float32))
    prior = NIW.create(np.zeros(D, np.float32), 1.2, 4.0,
                       0.5 * np.ones(D, np.float32))
    counts = rng.randint(0, 5, (B, K)).astype(np.int32)
    counts[:, 3] = 0
    Z = rng.randn(B, K, D).astype(np.float32)
    sum_x = (counts[..., None] * Z * 0.2).astype(np.float32)
    sum_sq = np.abs(counts[..., None] * (Z * Z * 0.1 + 0.5)).astype(np.float32) \
        + (sum_x ** 2) / np.maximum(counts[..., None], 1)
    uni_lo = rng.randint(0, 7, (B, K)).astype(np.int32)
    big_table = rng.randint(0, 4, (K, K)).astype(np.int32)
    corr_j = rng.randint(-1, K, (B, S)).astype(np.int32)
    corr_i = rng.randint(-1, K, (B, S)).astype(np.int32)
    embeds = rng.randint(0, N, (B, S)).astype(np.int32)
    embeds[rng.rand(B, S) < 0.25] = -1
    gumb = np.asarray(jax.random.gumbel(jax.random.PRNGKey(43), (B, S, K))
                      ).astype(np.float32)
    from segmentalist_tpu.models import components_diag as dcov
    lpv = dcov.log_prior_batch(prior, X)
    args = (jnp.asarray(embeds), X[jnp.maximum(jnp.asarray(embeds), 0)],
            lpv[jnp.maximum(jnp.asarray(embeds), 0)], jnp.asarray(gumb),
            jnp.asarray(counts), jnp.asarray(sum_x), jnp.asarray(sum_sq),
            prior.m_0, float(prior.k_0), float(prior.v_0), prior.S_0,
            jnp.float32(0.9),
            jnp.asarray(uni_lo), jnp.asarray(big_table),
            jnp.asarray(corr_j), jnp.asarray(corr_i))
    kw = dict(alpha_a=1.0, intrp_lambda=0.25, b_smooth=2.0, K=K, lms=1.05)
    ks_pal = bigram_diag_chain(*args, interpret=True, **kw)
    ks_xla = bigram_diag_chain_xla(*args, **kw)
    npt.assert_array_equal(np.asarray(ks_pal), np.asarray(ks_xla))


def test_lgamma_stirling_accuracy():
    from scipy.special import gammaln as sp_gammaln

    from segmentalist_tpu.ops.pallas_chain import _lgamma_stirling

    z = jnp.asarray(np.concatenate([
        np.arange(0.5, 12.0, 0.5), np.array([25.0, 100.5, 1000.0])
    ]).astype(np.float64))
    got = np.asarray(_lgamma_stirling(z))
    npt.assert_allclose(got, sp_gammaln(np.asarray(z)), rtol=1e-7, atol=1e-7)


def test_fullcov_pallas_chain_matches_xla_scan():
    """The full-covariance Pallas chain and its XLA twin consume the same
    Gumbel noise and must sample identical chains (diag-style Stirling-lgamma
    tolerance caveat applies only on real TPUs; interpret mode is exact)."""
    from segmentalist_tpu.models import components_full as cf
    from segmentalist_tpu.ops.pallas_chain import fullcov_chain_pallas
    from segmentalist_tpu.ops.stats import suff_stats_from_assignments
    from segmentalist_tpu.priors import NIW
    from segmentalist_tpu.segmenters.common import (
        leave_out_stats, utterance_contrib)
    from segmentalist_tpu.segmenters.fullcov import (
        fullcov_chain, pallas_chain_inputs, touched_leave_out)

    D, K, N = 4, 6, 40
    rng = np.random.RandomState(2)
    X = jnp.asarray(rng.randn(N, D))
    prior = NIW.create(np.zeros(D), 1.0, D + 2.0,
                       np.eye(D) + 0.1 * np.ones((D, D)))
    assignments = jnp.asarray(rng.randint(-1, K - 2, N), dtype=jnp.int32)
    stats = suff_stats_from_assignments(X, assignments, K, full_cov=True)
    old_embeds = jnp.asarray(
        [[0, 1, 2, -1], [3, 3, 4, 5], [-1, -1, -1, -1]], dtype=jnp.int32)
    old_ks = jnp.where(old_embeds >= 0,
                       assignments[jnp.maximum(old_embeds, 0)], -1)
    B = old_embeds.shape[0]
    log_prior_vec = cf.log_prior_batch(prior, X)
    new_embeds = jnp.asarray(
        [[6, 7, 8, -1, -1], [9, 10, 11, 12, -1], [13, -1, -1, -1, -1]],
        dtype=jnp.int32)
    gumbel = jax.random.gumbel(
        jax.random.PRNGKey(7), new_embeds.shape + (K,), dtype=X.dtype)
    alpha, lms, temp = 1.0, 1.0, 1.0

    lo = leave_out_stats(
        stats, utterance_contrib(X, old_embeds, old_ks, K, full_cov=True))
    params_g = cf.predictive_params(prior, stats)
    touched = touched_leave_out(prior, stats, X, old_embeds, old_ks)
    S = new_embeds.shape[1]
    G_new = cf.log_post_pred_batch(
        params_g, X[jnp.maximum(new_embeds, 0)].reshape(B * S, D)
    ).reshape(B, S, K)
    inputs = pallas_chain_inputs(prior, params_g, stats.counts, touched)
    (scnt0, tm0, tiP0, tld0, tk0, g_m, g_iP, g_ld) = inputs

    for use_argmax in (False, True):
        xla_ks = fullcov_chain(
            prior, X, params_g, stats.counts, lo.counts, touched, new_embeds,
            G_new, gumbel, log_prior_vec, alpha, K, lms, temp,
            use_argmax=use_argmax)
        pal_ks = fullcov_chain_pallas(
            new_embeds, X[jnp.maximum(new_embeds, 0)],
            log_prior_vec[jnp.maximum(new_embeds, 0)], gumbel, G_new,
            lo.counts, scnt0, tm0, tiP0, tld0, tk0, g_m, g_iP, g_ld,
            float(prior.k_0), float(prior.v_0), temp,
            alpha=alpha, K=K, lms=lms, use_argmax=use_argmax, interpret=True)
        npt.assert_array_equal(np.asarray(xla_ks), np.asarray(pal_ks))


def test_bigram_fullcov_pallas_chain_matches_xla():
    """The bigram-LM mode of fullcov_chain_pallas vs the XLA fullcov_chain
    with the bigram weight_fn, shared Gumbel noise."""
    from segmentalist_tpu.models import components_full as cf
    from segmentalist_tpu.ops.pallas_chain import fullcov_chain_pallas
    from segmentalist_tpu.ops.stats import suff_stats_from_assignments
    from segmentalist_tpu.priors import NIW
    from segmentalist_tpu.segmenters.common import (
        leave_out_stats, utterance_contrib)
    from segmentalist_tpu.segmenters.fullcov import (
        fullcov_chain, pallas_chain_inputs, touched_leave_out)

    D, K, N = 3, 7, 40
    lam, a, b_s, lms, temp = 0.2, 1.0, 1.5, 1.1, 0.9
    rng = np.random.RandomState(21)
    X = jnp.asarray(rng.randn(N, D))
    prior = NIW.create(np.zeros(D), 1.0, D + 2.0,
                       np.eye(D) + 0.1 * np.ones((D, D)))
    assignments = jnp.asarray(rng.randint(-1, K - 2, N), dtype=jnp.int32)
    stats = suff_stats_from_assignments(X, assignments, K, full_cov=True)
    old_embeds = jnp.asarray(
        [[0, 1, 2, -1], [3, 3, 4, 5], [-1, -1, -1, -1]], dtype=jnp.int32)
    old_ks = jnp.where(old_embeds >= 0,
                       assignments[jnp.maximum(old_embeds, 0)], -1)
    B = old_embeds.shape[0]
    log_prior_vec = cf.log_prior_batch(prior, X)
    new_embeds = jnp.asarray(
        [[6, 7, 8, -1, -1], [9, 10, 11, 12, -1], [13, -1, -1, -1, -1]],
        dtype=jnp.int32)
    gumbel = jax.random.gumbel(
        jax.random.PRNGKey(23), new_embeds.shape + (K,), dtype=X.dtype)

    uni_lo = jnp.asarray(rng.randint(1, 8, (B, K)), dtype=jnp.int32)
    big_table = jnp.asarray(rng.randint(0, 5, (K, K)), dtype=jnp.int32)
    # The utterance's own OLD (prev, cur) pairs, like the driver's
    # transcript_pairs_batch(old_ks).
    from segmentalist_tpu.models.bigram_lm import transcript_pairs_batch
    pj, pi = transcript_pairs_batch(old_ks)

    lo = leave_out_stats(
        stats, utterance_contrib(X, old_embeds, old_ks, K, full_cov=True))
    params_g = cf.predictive_params(prior, stats)
    touched = touched_leave_out(prior, stats, X, old_embeds, old_ks)
    S = new_embeds.shape[1]
    G_new = cf.log_post_pred_batch(
        params_g, X[jnp.maximum(new_embeds, 0)].reshape(B * S, D)
    ).reshape(B, S, K)
    (scnt0, tm0, tiP0, tld0, tk0, g_m, g_iP, g_ld) = pallas_chain_inputs(
        prior, params_g, stats.counts, touched)

    # XLA twin: the driver's bigram weight_fn construction
    # (segmenters/bigram.py).
    dtype = X.dtype

    def weight_fn(counts, j_prev, aux_b):
        uni_w, uni_prob, uni_lo_b, big_corr_j, onehot_pi = aux_b
        j_s = jnp.maximum(j_prev, 0)
        row = big_table[j_s].astype(dtype)
        sel = (big_corr_j == j_s).astype(dtype)
        row = row - sel @ onehot_pi
        uni_j = uni_lo_b[j_s].astype(dtype)
        p_cond = lam * uni_prob + (1.0 - lam) * (row + b_s / K) / (
            uni_j + b_s)
        return jnp.where(j_prev >= 0, lms * jnp.log(p_cond), uni_w)

    uni_f = uni_lo.astype(dtype)
    uni_w = lms * (jnp.log(uni_f + a / K)
                   - jnp.log(jnp.sum(uni_f, -1, keepdims=True) + a))
    uni_prob = (uni_f + a / K) / (jnp.sum(uni_f, -1, keepdims=True) + a)
    onehot_pi = (jax.nn.one_hot(jnp.maximum(pi, 0), K, dtype=dtype)
                 * (pi >= 0).astype(dtype)[..., None])
    aux = (uni_w, uni_prob, uni_lo, pj, onehot_pi)

    xla_ks = fullcov_chain(
        prior, X, params_g, stats.counts, lo.counts, touched, new_embeds,
        G_new, gumbel, log_prior_vec, 0.0, K, lms, temp, use_argmax=False,
        weight_fn=weight_fn, aux_args=aux)
    pal_ks = fullcov_chain_pallas(
        new_embeds, X[jnp.maximum(new_embeds, 0)],
        log_prior_vec[jnp.maximum(new_embeds, 0)], gumbel, G_new,
        lo.counts, scnt0, tm0, tiP0, tld0, tk0, g_m, g_iP, g_ld,
        float(prior.k_0), float(prior.v_0), temp,
        alpha=0.0, K=K, lms=lms, use_argmax=False, interpret=True,
        uni_lo=uni_lo, big_table=big_table, corr_j=pj, corr_i=pi,
        lm_params=(float(a), float(lam), float(b_s)))
    npt.assert_array_equal(np.asarray(xla_ks), np.asarray(pal_ks))


def test_chain_pad_patterns_dynamic_bound():
    """Mid-sequence -1 embeds (the DP's over-long-span pseudo-embeddings,
    unigram_acoustic_wordseg.py:339-342) and all-pad utterances must sample
    identically through the dynamic-step-bound kernel path."""
    global prior_g
    rng = np.random.RandomState(3)
    B, S, D, K = 4, 6, 3, 8
    N = 32
    X = jnp.asarray(rng.randn(N, D).astype(np.float32))
    prior_g = FixedVarPrior.create(
        0.2 * np.ones(D, np.float32), np.zeros(D, np.float32),
        np.ones(D, np.float32))
    counts = jnp.asarray(rng.randint(0, 4, (B, K)), dtype=jnp.int32)
    sum_x = jnp.asarray(
        rng.randn(B, K, D).astype(np.float32) * counts[..., None])
    # Row 0: pads mid-sequence; row 1: valid only at the last slot;
    # row 2: all pads; row 3: fully valid.
    embeds = jnp.asarray([
        [0, -1, 1, -1, 2, -1],
        [-1, -1, -1, -1, -1, 3],
        [-1, -1, -1, -1, -1, -1],
        [4, 5, 6, 7, 8, 9],
    ], dtype=jnp.int32)
    gumb = jax.random.gumbel(jax.random.PRNGKey(11), (B, S, K),
                             dtype=jnp.float32)
    from segmentalist_tpu.models import components_fixedvar as cfv
    sum_sq = jnp.zeros((B, K, D), jnp.float32)
    params = jax.vmap(lambda c, s, q: cfv.predictive_params(
        prior_g, SuffStats(counts=c, sum_x=s, sum_sq=q)))(
            counts, sum_x, sum_sq)
    log_prior_vec = cfv.log_prior_batch(prior_g, X)

    xla_ks = jax.vmap(
        lambda c, s, q, p, e, g: _xla_chain(
            X, SuffStats(counts=c, sum_x=s, sum_sq=q), p, e, g,
            log_prior_vec, 1.0, K, 1.0, 1.0, False)
    )(counts, sum_x, sum_sq, params, embeds, gumb)
    pal_ks = fixedvar_chain(
        embeds, X[jnp.maximum(embeds, 0)],
        log_prior_vec[jnp.maximum(embeds, 0)], gumb,
        counts, sum_x, prior_g.var, prior_g.var_0, prior_g.mu_0, 1.0,
        alpha=1.0, K=K, lms=1.0, interpret=True)
    npt.assert_array_equal(np.asarray(xla_ks), np.asarray(pal_ks))
    assert (np.asarray(pal_ks)[2] == -1).all()


def test_length_sorted_tiling_matches_per_utterance_calls():
    """The wrappers sort utterances by segment count before tiling
    (``_length_sort``) so tile step bounds are homogeneous; the batched
    result must equal per-utterance (B=1, single-tile, unsorted) calls on
    every chain family.  B exceeds the tile caps, so the sorted multi-tile
    path is actually exercised."""
    from segmentalist_tpu.models import components_diag as dcov
    from segmentalist_tpu.ops.pallas_chain import diag_chain
    from segmentalist_tpu.priors import NIW

    rng = np.random.RandomState(21)

    # fixedvar: B=40 > the 32-utterance tile cap -> 2 tiles.
    B, S, D, K = 40, 7, 4, 10
    N = 64
    X = jnp.asarray(rng.randn(N, D).astype(np.float32))
    prior = FixedVarPrior.create(
        0.1 * np.ones(D, np.float32), np.zeros(D, np.float32),
        np.ones(D, np.float32))
    counts = rng.randint(0, 4, (B, K)).astype(np.int32)
    sum_x = (counts[..., None] * rng.randn(B, K, D) * 0.2).astype(np.float32)
    embeds = rng.randint(0, N, (B, S)).astype(np.int32)
    # Heterogeneous lengths: utterance b keeps 1 + (b % S) leading segments.
    for b in range(B):
        embeds[b, 1 + (b % S):] = -1
    gumb = np.asarray(jax.random.gumbel(jax.random.PRNGKey(3), (B, S, K))
                      ).astype(np.float32)
    lpv = cov.log_prior_batch(prior, X)
    args = dict(var=prior.var, var_0=prior.var_0, mu_0=prior.mu_0,
                temp=jnp.float32(0.8), alpha=1.0, K=K, lms=1.1,
                interpret=True)
    Xe = X[jnp.maximum(jnp.asarray(embeds), 0)]
    lpe = lpv[jnp.maximum(jnp.asarray(embeds), 0)]
    batched = np.asarray(fixedvar_chain(
        jnp.asarray(embeds), Xe, lpe, jnp.asarray(gumb),
        jnp.asarray(counts), jnp.asarray(sum_x), **args))
    for b in range(0, B, 7):
        single = np.asarray(fixedvar_chain(
            jnp.asarray(embeds[b:b + 1]), Xe[b:b + 1], lpe[b:b + 1],
            jnp.asarray(gumb[b:b + 1]), jnp.asarray(counts[b:b + 1]),
            jnp.asarray(sum_x[b:b + 1]), **args))
        npt.assert_array_equal(batched[b], single[0], err_msg=f"utt {b}")

    # diag: B=20 > the 8-utterance tile cap -> 3 tiles.
    B, S, D, K = 20, 6, 3, 9
    X = jnp.asarray(rng.randn(N, D).astype(np.float32))
    nprior = NIW.create(np.zeros(D, np.float32), 1.5, 5.0,
                        0.4 * np.ones(D, np.float32))
    counts = rng.randint(0, 5, (B, K)).astype(np.int32)
    Z = rng.randn(B, K, D).astype(np.float32)
    sum_x = (counts[..., None] * Z * 0.2).astype(np.float32)
    sum_sq = np.abs(counts[..., None] * (Z * Z * 0.1 + 0.5)).astype(
        np.float32) + (sum_x ** 2) / np.maximum(counts[..., None], 1)
    embeds = rng.randint(0, N, (B, S)).astype(np.int32)
    for b in range(B):
        embeds[b, 1 + (b % S):] = -1
    gumb = np.asarray(jax.random.gumbel(jax.random.PRNGKey(4), (B, S, K))
                      ).astype(np.float32)
    lpv = dcov.log_prior_batch(nprior, X)
    Xe = X[jnp.maximum(jnp.asarray(embeds), 0)]
    lpe = lpv[jnp.maximum(jnp.asarray(embeds), 0)]
    dargs = dict(m_0=nprior.m_0, k_0=float(nprior.k_0),
                 v_0=float(nprior.v_0), S_0=nprior.S_0,
                 temp=jnp.float32(0.9), alpha=1.0, K=K, lms=1.2,
                 interpret=True)
    batched = np.asarray(diag_chain(
        jnp.asarray(embeds), Xe, lpe, jnp.asarray(gumb),
        jnp.asarray(counts), jnp.asarray(sum_x), jnp.asarray(sum_sq),
        **dargs))
    for b in range(0, B, 5):
        single = np.asarray(diag_chain(
            jnp.asarray(embeds[b:b + 1]), Xe[b:b + 1], lpe[b:b + 1],
            jnp.asarray(gumb[b:b + 1]), jnp.asarray(counts[b:b + 1]),
            jnp.asarray(sum_x[b:b + 1]), jnp.asarray(sum_sq[b:b + 1]),
            **dargs))
        npt.assert_array_equal(batched[b], single[0], err_msg=f"utt {b}")


def test_pick_b_tile_grid_aware_budget():
    """Above ``strict_above`` grid programs the tile picker re-picks with a
    2.5 MB stricter budget (Mosaic's prefetch buffering grows the scoped-
    VMEM footprint with the grid size; measured on hardware for fixedvar at
    B=512, PERFORMANCE.md round-3 item on VMEM blow-ups)."""
    from segmentalist_tpu.ops.pallas_chain import _pick_b_tile

    mb = 2 ** 20
    # Fits 32/tile at 13.5 MB but not at 11 MB: small grids keep 32.
    per_utt = 0.4 * mb
    assert _pick_b_tile(per_utt, 32, 64, budget=13.5 * mb,
                        strict_above=8) == 32
    # 512 utterances -> 16 programs > 8: stricter budget halves the tile.
    assert _pick_b_tile(per_utt, 32, 512, budget=13.5 * mb,
                        strict_above=8) == 16
    # Non-fixedvar default threshold (16) leaves benchmark-scale grids
    # (B=125, cap 8 -> 16 programs) at their hardware-validated tiles.
    assert _pick_b_tile(0.9 * mb, 8, 125, shared_bytes=4.0 * mb) == 8


def test_length_sort_pairs_rows_with_utterances():
    """_length_sort permutes every passed array with the same utterance
    permutation and returns the inverse that restores original order."""
    from segmentalist_tpu.ops.pallas_chain import _length_sort

    rng = np.random.default_rng(0)
    B, S = 9, 6
    embeds = np.full((B, S), -1, np.int32)
    for b in range(B):
        n = rng.integers(0, S + 1)
        embeds[b, :n] = rng.integers(0, 100, n)
    other = rng.normal(size=(B, S, 3)).astype(np.float32)
    inv, (se, so) = _length_sort(jnp.asarray(embeds), jnp.asarray(other))
    se, so, inv = np.asarray(se), np.asarray(so), np.asarray(inv)
    counts = (se >= 0).sum(1)
    assert (np.diff(counts) >= 0).all()  # ascending by segment count
    npt.assert_array_equal(se[inv], embeds)  # inverse restores order
    # rows travel together: each sorted row pair matches an original pair
    for b in range(B):
        src = np.flatnonzero((embeds == se[b]).all(1))
        assert any((other[s] == so[b]).all() for s in src)


def test_pick_b_tile_fixed_point_and_fit():
    """The tile pick must satisfy the budget implied by ITS OWN grid (the
    stricter budget applies exactly when the final grid exceeds the
    threshold), fit VMEM whenever a smaller power-of-two tile could, and
    never shrink below the validated flat-penalty behaviour."""
    from segmentalist_tpu.ops.pallas_chain import _pick_b_tile, _round_up

    rng = np.random.default_rng(0)
    for _ in range(2000):
        per_utt = float(rng.uniform(1e4, 6e6))
        cap = int(rng.choice([8, 16, 32]))
        B = int(rng.integers(1, 4097))
        shared = float(rng.uniform(0, 5e6))
        budget = float(rng.choice([12 * 2 ** 20, 13.5 * 2 ** 20]))
        strict = int(rng.choice([8, 16]))
        bt = _pick_b_tile(per_utt, cap, B, shared_bytes=shared,
                          budget=budget, strict_above=strict)
        assert 1 <= bt <= cap
        grid = _round_up(B, bt) // bt
        bud = budget - (2.5 * 2 ** 20 if grid > strict else 0.0)
        # fits its own grid's budget, or is already the minimum tile
        assert bt == 1 or shared + per_utt * bt <= bud
        # maximal: doubling the tile would blow the (possibly laxer)
        # budget of the doubled tile's own grid, or exceed the cap
        if bt < cap and _round_up(B, 8) > bt:
            bt2 = bt * 2
            grid2 = _round_up(B, bt2) // bt2
            bud2 = budget - (2.5 * 2 ** 20 if grid2 > strict else 0.0)
            assert shared + per_utt * bt2 > bud2


def test_stats_T_entry_points_bit_match():
    """The stats_T=True kernel entry points (feature-major [B, D, K] moment
    tables, the production layout -- see leave_out_moments_T) must sample
    bit-identical chains to the component-major stats_T=False calls: the
    flag only skips the host-side swapaxes, the kernel math is unchanged
    (round-4 advisor finding: this contract had no direct kernel-level
    test).  Covers all four chain kernels that take the flag."""
    from segmentalist_tpu.models import components_diag as dcov
    from segmentalist_tpu.ops.pallas_chain import (
        bigram_diag_chain, bigram_fixedvar_chain, diag_chain, fixedvar_chain)
    from segmentalist_tpu.priors import NIW

    rng = np.random.RandomState(21)
    B, S, D, K = 5, 6, 4, 11
    N = 40
    X = jnp.asarray(rng.randn(N, D).astype(np.float32))
    counts = jnp.asarray(rng.randint(0, 5, (B, K)), jnp.int32)
    sum_x = jnp.asarray(
        (np.asarray(counts)[..., None] * rng.randn(B, K, D) * 0.2
         ).astype(np.float32))
    sum_sq = jnp.asarray(
        (np.abs(np.asarray(counts)[..., None] * rng.randn(B, K, D)) + 0.5
         + np.asarray(sum_x) ** 2 / np.maximum(np.asarray(counts), 1)[..., None]
         ).astype(np.float32))
    embeds = np.asarray(rng.randint(0, N, (B, S)), np.int32)
    embeds[rng.rand(B, S) < 0.3] = -1
    embeds = jnp.asarray(embeds)
    gumb = jax.random.gumbel(jax.random.PRNGKey(2), (B, S, K), jnp.float32)
    Xe = X[jnp.maximum(embeds, 0)]
    fprior = FixedVarPrior.create(
        0.1 * np.ones(D, np.float32), np.zeros(D, np.float32),
        np.ones(D, np.float32))
    nprior = NIW.create(np.zeros(D, np.float32), 1.5, 5.0,
                        0.4 * np.ones(D, np.float32))
    lpe_f = cov.log_prior_batch(fprior, X)[jnp.maximum(embeds, 0)]
    lpe_d = dcov.log_prior_batch(nprior, X)[jnp.maximum(embeds, 0)]
    sum_xT = jnp.swapaxes(sum_x, 1, 2)
    sum_sqT = jnp.swapaxes(sum_sq, 1, 2)

    a = fixedvar_chain(embeds, Xe, lpe_f, gumb, counts, sum_x,
                       fprior.var, fprior.var_0, fprior.mu_0, 1.0,
                       alpha=1.0, K=K, lms=1.1, interpret=True)
    b = fixedvar_chain(embeds, Xe, lpe_f, gumb, counts, sum_xT,
                       fprior.var, fprior.var_0, fprior.mu_0, 1.0,
                       alpha=1.0, K=K, lms=1.1, interpret=True, stats_T=True)
    npt.assert_array_equal(np.asarray(a), np.asarray(b))

    a = diag_chain(embeds, Xe, lpe_d, gumb, counts, sum_x, sum_sq,
                   nprior.m_0, float(nprior.k_0), float(nprior.v_0),
                   nprior.S_0, 1.0, alpha=1.0, K=K, lms=1.1, interpret=True)
    b = diag_chain(embeds, Xe, lpe_d, gumb, counts, sum_xT, sum_sqT,
                   nprior.m_0, float(nprior.k_0), float(nprior.v_0),
                   nprior.S_0, 1.0, alpha=1.0, K=K, lms=1.1, interpret=True,
                   stats_T=True)
    npt.assert_array_equal(np.asarray(a), np.asarray(b))

    # Bigram LM tables, consistent by construction: the utterance's own
    # correction pairs are counted in the global table.
    uni_lo = jnp.asarray(rng.randint(0, 9, (B, K)), jnp.int32)
    corr_j = jnp.asarray(rng.randint(-1, K, (B, S)), jnp.int32)
    corr_i = jnp.asarray(rng.randint(-1, K, (B, S)), jnp.int32)
    big = np.asarray(rng.randint(0, 5, (K, K)), np.int32)
    cj, ci = np.asarray(corr_j), np.asarray(corr_i)
    m = (cj >= 0) & (ci >= 0)
    np.add.at(big, (cj[m], ci[m]), 1)
    big = jnp.asarray(big)
    bkw = dict(alpha_a=1.0, intrp_lambda=0.2, b_smooth=1.5, K=K, lms=1.0,
               interpret=True)

    a = bigram_fixedvar_chain(embeds, Xe, lpe_f, gumb, counts, sum_x,
                              fprior.var, fprior.var_0, fprior.mu_0, 1.0,
                              uni_lo, big, corr_j, corr_i, **bkw)
    b = bigram_fixedvar_chain(embeds, Xe, lpe_f, gumb, counts, sum_xT,
                              fprior.var, fprior.var_0, fprior.mu_0, 1.0,
                              uni_lo, big, corr_j, corr_i, stats_T=True,
                              **bkw)
    npt.assert_array_equal(np.asarray(a), np.asarray(b))

    a = bigram_diag_chain(embeds, Xe, lpe_d, gumb, counts, sum_x, sum_sq,
                          nprior.m_0, float(nprior.k_0), float(nprior.v_0),
                          nprior.S_0, 1.0, uni_lo, big, corr_j, corr_i,
                          **bkw)
    b = bigram_diag_chain(embeds, Xe, lpe_d, gumb, counts, sum_xT, sum_sqT,
                          nprior.m_0, float(nprior.k_0), float(nprior.v_0),
                          nprior.S_0, 1.0, uni_lo, big, corr_j, corr_i,
                          stats_T=True, **bkw)
    npt.assert_array_equal(np.asarray(a), np.asarray(b))
