"""Real-hardware parity of every Pallas kernel against its XLA twin.

The CI tests run the kernels in interpret mode (CPU), which executes the
same math as jnp -- it cannot catch Mosaic lowering differences.  This
script runs each kernel natively on the attached TPU against the XLA
fallback on the same inputs and reports:

  * chain kernels: fraction of identically-sampled assignment chains on
    shared Gumbel noise.  The XLA fallbacks share the kernels' Stirling
    lgamma and arithmetic groupings, so 1.0 is expected for EVERY backend.
    The bigram LM tables must be CONSISTENT (every (corr_j, corr_i) pair
    counted in big_table, as production guarantees): inconsistent random
    tables make `row - corr` negative -> log(negative) = NaN logits, and
    Mosaic's and XLA's argmax NaN semantics differ (this harness artifact
    was misread as carried-table drift in round 3: 0.896 agreement);
  * stats_T=True entry points (the feature-major [B, D, K] moment layout
    production passes): chains must bit-match the component-major calls
    ON HARDWARE (the flag only skips a host-side swapaxes);
  * scoring kernels / DP: max absolute deviation of the returned values.

Prints one human table to stdout and ends with ONE JSON line of every
metric; ``--out PATH`` additionally writes that JSON to PATH (the per-round
``PARITY_rNN.json`` artifact -- ``make parity``).

Run:  python benchmarks/kernel_parity_tpu.py [--out PARITY_rNN.json]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B, S, D, K, N_emb = 48, 10, 13, 256, 4096


def _rand_fixedvar(rng):
    from segmentalist_tpu.priors import FixedVarPrior

    prior = FixedVarPrior.create(
        0.1 * np.ones(D, np.float32), np.zeros(D, np.float32),
        np.ones(D, np.float32))
    X = jnp.asarray(rng.randn(N_emb, D).astype(np.float32))
    counts = jnp.asarray(rng.randint(0, 6, (B, K)), dtype=jnp.int32)
    sum_x = jnp.asarray(
        (rng.randn(B, K, D) * np.asarray(counts)[..., None]).astype(np.float32))
    embeds = jnp.asarray(rng.randint(-1, N_emb, (B, S)), dtype=jnp.int32)
    gumb = jax.random.gumbel(jax.random.PRNGKey(3), (B, S, K), jnp.float32)
    return prior, X, counts, sum_x, embeds, gumb


def check_fixedvar_chain():
    from segmentalist_tpu.models import components_fixedvar as cfv
    from segmentalist_tpu.models.fbgmm import log_weights
    from segmentalist_tpu.ops.pallas_chain import fixedvar_chain
    from segmentalist_tpu.ops.random import NEG_INF
    from segmentalist_tpu.ops.stats import (
        SuffStats, add_item, canonicalize_new_component)

    rng = np.random.RandomState(0)
    prior, X, counts, sum_x, embeds, gumb = _rand_fixedvar(rng)
    sum_sq = jnp.zeros((B, K, D), jnp.float32)
    log_prior_vec = cfv.log_prior_batch(prior, X)
    params = jax.vmap(lambda c, s, q: cfv.predictive_params(
        prior, SuffStats(counts=c, sum_x=s, sum_sq=q)))(counts, sum_x, sum_sq)

    def xla_one(c, s, q, p, e, g):
        def step(carry, inp):
            st, pp = carry
            e_i, g_i = inp
            ok = e_i >= 0
            x = X[jnp.maximum(e_i, 0)]
            w = log_weights(st.counts, 1.0, K, 1.0, False, x.dtype)
            post = cfv.log_post_pred(pp, x)
            logits = w + jnp.where(st.counts > 0, post,
                                   log_prior_vec[jnp.maximum(e_i, 0)])
            k = jnp.argmax(jnp.where(jnp.isneginf(logits), NEG_INF,
                                     logits + g_i))
            k = canonicalize_new_component(st.counts, k)
            st = add_item(st, x, k, weight=ok.astype(jnp.int32))
            pp = cfv.update_predictive_row(prior, st, pp, k)
            return (st, pp), jnp.where(ok, k.astype(jnp.int32), -1)

        (_, _), ks = jax.lax.scan(
            step, (SuffStats(counts=c, sum_x=s, sum_sq=q), p), (e, g))
        return ks

    xla_ks = jax.vmap(xla_one)(counts, sum_x, sum_sq, params, embeds, gumb)
    pal_ks = fixedvar_chain(
        embeds, X[jnp.maximum(embeds, 0)],
        log_prior_vec[jnp.maximum(embeds, 0)], gumb, counts, sum_x,
        prior.var, prior.var_0, prior.mu_0, 1.0, alpha=1.0, K=K, lms=1.0,
        interpret=False)
    agree = float(jnp.mean((xla_ks == pal_ks).all(axis=1)))
    print("fixedvar_chain   identical chains: %.3f" % agree, flush=True)
    # stats_T (production layout): must bit-match on hardware.
    pal_ks_T = fixedvar_chain(
        embeds, X[jnp.maximum(embeds, 0)],
        log_prior_vec[jnp.maximum(embeds, 0)], gumb, counts,
        jnp.swapaxes(sum_x, 1, 2),
        prior.var, prior.var_0, prior.mu_0, 1.0, alpha=1.0, K=K, lms=1.0,
        interpret=False, stats_T=True)
    agree_T = float(jnp.mean((pal_ks == pal_ks_T).all(axis=1)))
    print("fixedvar_chain   stats_T==stats   chains: %.3f" % agree_T,
          flush=True)
    return agree, agree_T


def check_score_kernels():
    from segmentalist_tpu.models import components_diag as cdg
    from segmentalist_tpu.models import components_fixedvar as cfv
    from segmentalist_tpu.models.fbgmm import log_weights
    from segmentalist_tpu.ops.pallas_score import (
        diag_log_margs, fixedvar_log_margs)
    from segmentalist_tpu.ops.random import logsumexp
    from segmentalist_tpu.ops.stats import SuffStats
    from segmentalist_tpu.priors import NIW

    rng = np.random.RandomState(1)
    prior, X, counts, sum_x, embeds, _ = _rand_fixedvar(rng)
    M = 24
    sum_sq = jnp.zeros((B, K, D), jnp.float32)
    Xc = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    prior_c = jax.vmap(lambda x: cfv.log_prior_batch(prior, x))(Xc)
    params = jax.vmap(lambda c, s, q: cfv.predictive_params(
        prior, SuffStats(counts=c, sum_x=s, sum_sq=q)))(counts, sum_x, sum_sq)
    w = jax.vmap(lambda c: log_weights(c, 1.0, K, 1.0, True,
                                       jnp.float32))(counts)
    post = jax.vmap(cfv.log_post_pred_batch)(params, Xc)
    ref = logsumexp(w[:, None, :] + jnp.where(
        (counts > 0)[:, None, :], post, prior_c[..., None]), axis=-1)
    got = fixedvar_log_margs(
        Xc, prior_c, params.mu_pred, params.prec_pred,
        params.log_prod_prec, w, counts, K=K, interpret=False)
    dev = float(jnp.max(jnp.abs(got - ref)))
    print("fixedvar_log_margs  max |dev|: %.2e" % dev, flush=True)

    nprior = NIW.create(np.zeros(D, np.float32), 1.0, float(D) + 3.0,
                        0.3 * np.ones(D, np.float32))
    dsum_sq = jnp.asarray((np.abs(rng.randn(B, K, D))
                           * np.asarray(counts)[..., None]
                           + np.asarray(sum_x) ** 2
                           / np.maximum(np.asarray(counts), 1)[..., None]
                           ).astype(np.float32))
    dparams = jax.vmap(lambda c, s, q: cdg.predictive_params(
        nprior, SuffStats(counts=c, sum_x=s, sum_sq=q)))(
            counts, sum_x, dsum_sq)
    dprior_c = jax.vmap(lambda x: cdg.log_prior_batch(nprior, x))(Xc)
    dpost = jax.vmap(cdg.log_post_pred_batch)(dparams, Xc)
    dref = logsumexp(w[:, None, :] + jnp.where(
        (counts > 0)[:, None, :], dpost, dprior_c[..., None]), axis=-1)
    dgot = diag_log_margs(
        Xc, dprior_c, dparams.mu, dparams.inv_var, dparams.log_prod_var,
        dparams.v, w, counts, K=K, interpret=False)
    ddev = float(jnp.max(jnp.abs(dgot - dref)))
    print("diag_log_margs      max |dev|: %.2e" % ddev, flush=True)
    return dev, ddev


def check_fullcov_score():
    """fullcov_log_margs (fused corrected scoring) vs the XLA path."""
    from segmentalist_tpu.models import components_full as cf
    from segmentalist_tpu.models.fbgmm import log_weights
    from segmentalist_tpu.ops.pallas_score import fullcov_log_margs
    from segmentalist_tpu.ops.random import logsumexp
    from segmentalist_tpu.ops.stats import suff_stats_from_assignments
    from segmentalist_tpu.priors import NIW
    from segmentalist_tpu.segmenters.fullcov import (
        corrected_candidate_post, counts_contrib, fullcov_score_inputs,
        touched_leave_out)

    rng = np.random.RandomState(6)
    Nf, Bf, Sf, M = 1024, 16, 6, 24
    prior = NIW.create(np.zeros(D, np.float32), 1.0, float(D) + 3.0,
                       0.3 * np.eye(D, dtype=np.float32))
    X = jnp.asarray(rng.randn(Nf, D).astype(np.float32))
    assigns = jnp.asarray(rng.randint(-1, K // 4, Nf), dtype=jnp.int32)
    stats = suff_stats_from_assignments(X, assigns, K, full_cov=True)
    old_embeds = jnp.asarray(rng.randint(-1, Nf, (Bf, Sf)), dtype=jnp.int32)
    old_ks = jnp.where(old_embeds >= 0,
                       assigns[jnp.maximum(old_embeds, 0)], -1)
    cand = jnp.asarray(rng.randint(0, Nf, (Bf, M)), dtype=jnp.int32)
    Xc = X[cand]
    prior_c = jax.vmap(lambda x: cf.log_prior_batch(prior, x))(Xc)
    params_g = cf.predictive_params(prior, stats)
    touched = touched_leave_out(prior, stats, X, old_embeds, old_ks)
    lo_counts = stats.counts[None] - counts_contrib(
        old_ks, old_embeds >= 0, K)
    w = jax.vmap(lambda c: log_weights(c, 1.0, K, 1.0, True,
                                       jnp.float32))(lo_counts)
    post = cf.log_post_pred_batch(
        params_g, Xc.reshape(Bf * M, D)).reshape(Bf, M, K)
    post = corrected_candidate_post(post, Xc, touched, K)
    ref = logsumexp(w[:, None, :] + jnp.where(
        (lo_counts > 0)[:, None, :], post, prior_c[..., None]), axis=-1)
    g, t, oh_t, tmask_t = fullcov_score_inputs(params_g, touched)
    got = fullcov_log_margs(Xc, prior_c, *g, *t, oh_t, tmask_t, w,
                            lo_counts, K=K, interpret=False)
    dev = float(jnp.max(jnp.abs(got - ref)))
    # An f64 referee puts the KERNEL ~10x closer to the exact values than
    # this XLA twin (2.7e-2 vs 2.6e-1 max error): the twin's [B*M, D^2]
    # default-precision matmul runs bf16 passes whose error dominates the
    # comparison, so the bound here reflects the XLA side's error.
    print("fullcov_log_margs   max |dev vs XLA twin|: %.2e "
          "(kernel is the more accurate side; see comment)" % dev,
          flush=True)
    return dev


def check_chain_lowering():
    """Native-vs-interpret agreement for the diag and full-NIW chain
    kernels (same code path, different lowering): isolates pure Mosaic
    effects.  The in-kernel Stirling lgamma runs in BOTH modes, so any
    disagreement here is fma/ordering tie-flips, expected ~0."""
    from segmentalist_tpu.models import components_full as cf
    from segmentalist_tpu.ops.pallas_chain import (
        diag_chain, fullcov_chain_pallas)
    from segmentalist_tpu.ops.stats import suff_stats_from_assignments
    from segmentalist_tpu.priors import NIW
    from segmentalist_tpu.segmenters.fullcov import (
        pallas_chain_inputs, touched_leave_out)
    from segmentalist_tpu.segmenters.common import (
        leave_out_stats, utterance_contrib)

    rng = np.random.RandomState(4)
    nprior = NIW.create(np.zeros(D, np.float32), 1.0, float(D) + 3.0,
                        0.3 * np.ones(D, np.float32))
    X = jnp.asarray(rng.randn(N_emb, D).astype(np.float32))
    counts = jnp.asarray(rng.randint(0, 6, (B, K)), dtype=jnp.int32)
    sum_x = jnp.asarray(
        (rng.randn(B, K, D) * np.asarray(counts)[..., None]
         ).astype(np.float32))
    sum_sq = jnp.asarray((np.abs(rng.randn(B, K, D))
                          * np.asarray(counts)[..., None]
                          + np.asarray(sum_x) ** 2
                          / np.maximum(np.asarray(counts), 1)[..., None]
                          ).astype(np.float32))
    embeds = jnp.asarray(rng.randint(-1, N_emb, (B, S)), dtype=jnp.int32)
    gumb = jax.random.gumbel(jax.random.PRNGKey(9), (B, S, K), jnp.float32)
    from segmentalist_tpu.models import components_diag as cdg

    log_prior_vec = cdg.log_prior_batch(nprior, X)
    args = (embeds, X[jnp.maximum(embeds, 0)],
            log_prior_vec[jnp.maximum(embeds, 0)], gumb, counts, sum_x,
            sum_sq, nprior.m_0, float(nprior.k_0), float(nprior.v_0),
            nprior.S_0, 1.0)
    d_nat = diag_chain(*args, alpha=1.0, K=K, lms=1.0, interpret=False)
    d_int = diag_chain(*args, alpha=1.0, K=K, lms=1.0, interpret=True)
    d_agree = float(jnp.mean((d_nat == d_int).all(axis=1)))
    print("diag_chain       native==interpret chains: %.3f" % d_agree,
          flush=True)

    fprior = NIW.create(np.zeros(D, np.float32), 1.0, float(D) + 3.0,
                        0.3 * np.eye(D, dtype=np.float32))
    Nf = 512
    Xf = jnp.asarray(rng.randn(Nf, D).astype(np.float32))
    assigns = jnp.asarray(rng.randint(-1, K // 8, Nf), dtype=jnp.int32)
    stats = suff_stats_from_assignments(Xf, assigns, K, full_cov=True)
    Bf, Sf = 16, 6
    old_embeds = jnp.asarray(rng.randint(-1, Nf, (Bf, Sf)), dtype=jnp.int32)
    old_ks = jnp.where(old_embeds >= 0,
                       assigns[jnp.maximum(old_embeds, 0)], -1)
    new_embeds = jnp.asarray(rng.randint(-1, Nf, (Bf, Sf)), dtype=jnp.int32)
    gf = jax.random.gumbel(jax.random.PRNGKey(11), (Bf, Sf, K), jnp.float32)
    lo = leave_out_stats(
        stats, utterance_contrib(Xf, old_embeds, old_ks, K, full_cov=True))
    params_g = cf.predictive_params(fprior, stats)
    touched = touched_leave_out(fprior, stats, Xf, old_embeds, old_ks)
    G_new = cf.log_post_pred_batch(
        params_g, Xf[jnp.maximum(new_embeds, 0)].reshape(Bf * Sf, D)
    ).reshape(Bf, Sf, K)
    lpv = cf.log_prior_batch(fprior, Xf)
    ins = pallas_chain_inputs(fprior, params_g, stats.counts, touched)
    (scnt0, tm0, tiP0, tld0, tk0, g_m, g_iP, g_ld) = ins
    fargs = (new_embeds, Xf[jnp.maximum(new_embeds, 0)],
             lpv[jnp.maximum(new_embeds, 0)], gf, G_new, lo.counts,
             scnt0, tm0, tiP0, tld0, tk0, g_m, g_iP, g_ld,
             float(fprior.k_0), float(fprior.v_0), 1.0)
    f_nat = fullcov_chain_pallas(*fargs, alpha=1.0, K=K, lms=1.0,
                                 interpret=False)
    f_int = fullcov_chain_pallas(*fargs, alpha=1.0, K=K, lms=1.0,
                                 interpret=True)
    f_agree = float(jnp.mean((f_nat == f_int).all(axis=1)))
    print("fullcov_chain    native==interpret chains: %.3f" % f_agree,
          flush=True)
    return d_agree, f_agree


def check_stirling_twins():
    """Native kernels vs the production XLA twins that now share the same
    Stirling-lgamma composition (round-3 change): diag / bigram-diag /
    full-NIW / bigram full-NIW chains must sample IDENTICAL chains on
    hardware -- this is the check that retires the CLAUDE.md near-tie
    tolerance caveat.  Bigram LM tables are built CONSISTENT: the global
    bigram table counts every correction pair, like production's
    ``lm_state.bigram_counts`` counts the utterances' own transcript
    pairs (see module docstring for what inconsistent tables break)."""

    def _count_pairs(big, cj, ci):
        """big_table + one count per valid (cj, ci) pair, so the kernel's
        conditioned row stays >= 0 after its own-pair corrections."""
        pairs = np.zeros(big.shape, np.int32)
        cj, ci = np.asarray(cj), np.asarray(ci)
        m = (cj >= 0) & (ci >= 0)
        np.add.at(pairs, (cj[m], ci[m]), 1)
        return big + jnp.asarray(pairs)
    from segmentalist_tpu.models import components_diag as cdg
    from segmentalist_tpu.models import components_full as cf
    from segmentalist_tpu.models.bigram_lm import transcript_pairs_batch
    from segmentalist_tpu.ops.pallas_chain import (
        bigram_diag_chain, bigram_diag_chain_xla, diag_chain,
        diag_chain_xla, fullcov_chain_pallas)
    from segmentalist_tpu.ops.stats import suff_stats_from_assignments
    from segmentalist_tpu.priors import NIW
    from segmentalist_tpu.segmenters.common import (
        leave_out_stats, utterance_contrib)
    from segmentalist_tpu.segmenters.fullcov import (
        fullcov_chain, pallas_chain_inputs, touched_leave_out)

    rng = np.random.RandomState(8)
    nprior = NIW.create(np.zeros(D, np.float32), 1.0, float(D) + 3.0,
                        0.3 * np.ones(D, np.float32))
    X = jnp.asarray(rng.randn(N_emb, D).astype(np.float32))
    counts = jnp.asarray(rng.randint(0, 6, (B, K)), dtype=jnp.int32)
    sum_x = jnp.asarray(
        (rng.randn(B, K, D) * np.asarray(counts)[..., None]
         ).astype(np.float32))
    sum_sq = jnp.asarray((np.abs(rng.randn(B, K, D))
                          * np.asarray(counts)[..., None]
                          + np.asarray(sum_x) ** 2
                          / np.maximum(np.asarray(counts), 1)[..., None]
                          ).astype(np.float32))
    embeds = jnp.asarray(rng.randint(-1, N_emb, (B, S)), dtype=jnp.int32)
    gumb = jax.random.gumbel(jax.random.PRNGKey(13), (B, S, K), jnp.float32)
    lpv = cdg.log_prior_batch(nprior, X)
    dargs = (embeds, X[jnp.maximum(embeds, 0)],
             lpv[jnp.maximum(embeds, 0)], gumb, counts, sum_x, sum_sq,
             nprior.m_0, float(nprior.k_0), float(nprior.v_0), nprior.S_0,
             1.0)
    d_nat = diag_chain(*dargs, alpha=1.0, K=K, lms=1.0, interpret=False)
    d_xla = diag_chain_xla(*dargs, alpha=1.0, K=K, lms=1.0)
    d_tw = float(jnp.mean((d_nat == d_xla).all(axis=1)))
    print("diag_chain       kernel==XLA-twin chains: %.3f" % d_tw,
          flush=True)
    dargs_T = (dargs[:5] + (jnp.swapaxes(sum_x, 1, 2),
                            jnp.swapaxes(sum_sq, 1, 2)) + dargs[7:])
    d_nat_T = diag_chain(*dargs_T, alpha=1.0, K=K, lms=1.0, interpret=False,
                         stats_T=True)
    d_sT = float(jnp.mean((d_nat == d_nat_T).all(axis=1)))
    print("diag_chain       stats_T==stats   chains: %.3f" % d_sT,
          flush=True)

    uni_lo = jnp.asarray(rng.randint(0, 9, (B, K)), dtype=jnp.int32)
    big_table = jnp.asarray(rng.randint(0, 5, (K, K)), dtype=jnp.int32)
    corr_j = jnp.asarray(rng.randint(-1, K, (B, S)), dtype=jnp.int32)
    corr_i = jnp.asarray(rng.randint(-1, K, (B, S)), dtype=jnp.int32)
    big_table = _count_pairs(big_table, corr_j, corr_i)
    bargs = dargs + (uni_lo, big_table, corr_j, corr_i)
    bkw = dict(alpha_a=1.0, intrp_lambda=0.2, b_smooth=1.5, K=K, lms=1.0)
    bd_nat = bigram_diag_chain(*bargs, interpret=False, **bkw)
    bd_xla = bigram_diag_chain_xla(*bargs, **bkw)
    bd_tw = float(jnp.mean((bd_nat == bd_xla).all(axis=1)))
    print("bigram_diag      kernel==XLA-twin chains: %.3f" % bd_tw,
          flush=True)
    bargs_T = dargs_T + (uni_lo, big_table, corr_j, corr_i)
    bd_nat_T = bigram_diag_chain(*bargs_T, interpret=False, stats_T=True,
                                 **bkw)
    bd_sT = float(jnp.mean((bd_nat == bd_nat_T).all(axis=1)))
    print("bigram_diag      stats_T==stats   chains: %.3f" % bd_sT,
          flush=True)

    fprior = NIW.create(np.zeros(D, np.float32), 1.0, float(D) + 3.0,
                        0.3 * np.eye(D, dtype=np.float32))
    Nf = 512
    Xf = jnp.asarray(rng.randn(Nf, D).astype(np.float32))
    assigns = jnp.asarray(rng.randint(-1, K // 8, Nf), dtype=jnp.int32)
    stats = suff_stats_from_assignments(Xf, assigns, K, full_cov=True)
    Bf, Sf = 16, 6
    old_embeds = jnp.asarray(rng.randint(-1, Nf, (Bf, Sf)), dtype=jnp.int32)
    old_ks = jnp.where(old_embeds >= 0,
                       assigns[jnp.maximum(old_embeds, 0)], -1)
    new_embeds = jnp.asarray(rng.randint(-1, Nf, (Bf, Sf)), dtype=jnp.int32)
    gf = jax.random.gumbel(jax.random.PRNGKey(15), (Bf, Sf, K), jnp.float32)
    lo = leave_out_stats(
        stats, utterance_contrib(Xf, old_embeds, old_ks, K, full_cov=True))
    params_g = cf.predictive_params(fprior, stats)
    touched = touched_leave_out(fprior, stats, Xf, old_embeds, old_ks)
    G_new = cf.log_post_pred_batch(
        params_g, Xf[jnp.maximum(new_embeds, 0)].reshape(Bf * Sf, D),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(Bf, Sf, K)
    lpvf = cf.log_prior_batch(fprior, Xf)
    (scnt0, tm0, tiP0, tld0, tk0, g_m, g_iP, g_ld) = pallas_chain_inputs(
        fprior, params_g, stats.counts, touched)
    fargs = (new_embeds, Xf[jnp.maximum(new_embeds, 0)],
             lpvf[jnp.maximum(new_embeds, 0)], gf, G_new, lo.counts,
             scnt0, tm0, tiP0, tld0, tk0, g_m, g_iP, g_ld,
             float(fprior.k_0), float(fprior.v_0), 1.0)
    f_nat = fullcov_chain_pallas(*fargs, alpha=1.0, K=K, lms=1.0,
                                 interpret=False)
    f_xla = fullcov_chain(
        fprior, Xf, params_g, stats.counts, lo.counts, touched, new_embeds,
        G_new, gf, lpvf, 1.0, K, 1.0, 1.0, use_argmax=False)
    f_tw = float(jnp.mean((f_nat == f_xla).all(axis=1)))
    print("fullcov_chain    kernel==XLA-twin chains: %.3f" % f_tw,
          flush=True)

    # Bigram full-NIW mode.
    pj, pi = transcript_pairs_batch(old_ks)
    uni_f_lo = jnp.asarray(rng.randint(1, 9, (Bf, K)), dtype=jnp.int32)
    big_f = _count_pairs(
        jnp.asarray(rng.randint(0, 5, (K, K)), dtype=jnp.int32), pj, pi)
    lam, a_s, b_s = 0.2, 1.0, 1.5
    dtype = Xf.dtype
    uni_ff = uni_f_lo.astype(dtype)
    uni_w = 1.0 * (jnp.log(uni_ff + a_s / K)
                   - jnp.log(jnp.sum(uni_ff, -1, keepdims=True) + a_s))
    uni_prob = (uni_ff + a_s / K) / (
        jnp.sum(uni_ff, -1, keepdims=True) + a_s)
    onehot_pi = (jax.nn.one_hot(jnp.maximum(pi, 0), K, dtype=dtype)
                 * (pi >= 0).astype(dtype)[..., None])

    def weight_fn(counts_w, j_prev, aux_b):  # noqa: ARG001
        uni_w_b, uni_prob_b, uni_lo_b, cjb, ohb = aux_b
        j_s = jnp.maximum(j_prev, 0)
        row = big_f[j_s].astype(dtype)
        sel = (cjb == j_s).astype(dtype)
        row = row - sel @ ohb
        uni_j = uni_lo_b[j_s].astype(dtype)
        p_cond = lam * uni_prob_b + (1.0 - lam) * (row + b_s / K) / (
            uni_j + b_s)
        return jnp.where(j_prev >= 0, 1.0 * jnp.log(p_cond), uni_w_b)

    aux = (uni_w, uni_prob, uni_f_lo, pj, onehot_pi)
    bf_nat = fullcov_chain_pallas(
        *fargs, alpha=0.0, K=K, lms=1.0, interpret=False,
        uni_lo=uni_f_lo, big_table=big_f, corr_j=pj, corr_i=pi,
        lm_params=(a_s, lam, b_s))
    bf_xla = fullcov_chain(
        fprior, Xf, params_g, stats.counts, lo.counts, touched, new_embeds,
        G_new, gf, lpvf, 0.0, K, 1.0, 1.0, use_argmax=False,
        weight_fn=weight_fn, aux_args=aux)
    bf_tw = float(jnp.mean((bf_nat == bf_xla).all(axis=1)))
    print("bigram_fullcov   kernel==XLA-twin chains: %.3f" % bf_tw,
          flush=True)
    return d_tw, bd_tw, f_tw, bf_tw, d_sT, bd_sT


def check_dp():
    from segmentalist_tpu.ops import dp as dp_ops

    rng = np.random.RandomState(2)
    N, W = 20, 6
    scores = jnp.asarray(rng.randn(B, N, W).astype(np.float32))
    lengths = jnp.asarray(rng.randint(2, N + 1, B), dtype=jnp.int32)
    key = jax.random.PRNGKey(5)
    lp_p, b_p = dp_ops.segment_dp(scores, lengths, key, 0.0, 1.0,
                                  n_slices_min=0, n_slices_max=W,
                                  mode="sample", use_pallas=True)
    lp_x, b_x = dp_ops.segment_dp(scores, lengths, key, 0.0, 1.0,
                                  n_slices_min=0, n_slices_max=W,
                                  mode="sample", use_pallas=False)
    same_b = float(jnp.mean((b_p == b_x).all(axis=1)))
    dev = float(jnp.max(jnp.abs(lp_p - lp_x)))
    print("segment_dp       identical boundaries: %.3f  max |dlogp|: %.2e"
          % (same_b, dev), flush=True)
    return same_b, dev


def main():
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    agree, agree_T = check_fixedvar_chain()
    dev, ddev = check_score_kernels()
    fdev = check_fullcov_score()
    d_agree, f_agree = check_chain_lowering()
    d_tw, bd_tw, f_tw, bf_tw, d_sT, bd_sT = check_stirling_twins()
    same_b, dp_dev = check_dp()
    # ddev (diag scoring): the grouped-product Student-t composition pays
    # Mosaic's ~1e-6 absolute log error amplified by vh = (v+1)/2 at large
    # counts (measured 3.3e-3); these scores feed only the logsumexp'ed
    # candidate marginals (CLAUDE.md: tolerant -- the chains that feed
    # argmaxes are gated separately at 1.000 by d_tw), so gate at 1e-2.
    ok = (agree == 1.0 and same_b == 1.0 and dev < 1e-3 and ddev < 1e-2
          and fdev < 0.5 and dp_dev < 1e-3 and d_agree > 0.95
          and f_agree > 0.95
          and d_tw == 1.0 and bd_tw == 1.0 and f_tw == 1.0 and bf_tw == 1.0
          and agree_T == 1.0 and d_sT == 1.0 and bd_sT == 1.0)
    print("PARITY %s" % ("OK" if ok else "DEVIATIONS -- inspect above"))
    results = {
        "ok": ok,
        "backend": str(jax.devices()[0]),
        "config": {"B": B, "chain_len": S, "D": D, "K": K, "N_emb": N_emb,
                   "seeds": "RandomState(0/1/4/6/8) + PRNGKey(3/5/9/11/13/15)"},
        "chain_agreement": {
            "fixedvar_kernel_vs_xla_twin": agree,
            "fixedvar_statsT_vs_stats": agree_T,
            "diag_kernel_vs_xla_twin": d_tw,
            "diag_statsT_vs_stats": d_sT,
            "bigram_diag_kernel_vs_xla_twin": bd_tw,
            "bigram_diag_statsT_vs_stats": bd_sT,
            "fullcov_kernel_vs_xla_twin": f_tw,
            "bigram_fullcov_kernel_vs_xla_twin": bf_tw,
            "diag_native_vs_interpret": d_agree,
            "fullcov_native_vs_interpret": f_agree,
            "segment_dp_identical_boundaries": same_b,
        },
        "score_max_abs_dev": {
            "fixedvar_log_margs": dev,
            "diag_log_margs": ddev,
            "fullcov_log_margs_vs_xla_twin": fdev,
            "segment_dp_logp": dp_dev,
        },
    }
    line = json.dumps(results)
    print(line, flush=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
