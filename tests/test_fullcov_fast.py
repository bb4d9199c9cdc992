"""Parity tests for the full-covariance touched-component fast path
(segmenters/fullcov.py): the sparse corrections must reproduce the dense
leave-one-utterance-out math exactly (same conditionals, same chains)."""

import jax
import jax.numpy as jnp
import numpy as np

from segmentalist_tpu.models import components_full as cf
from segmentalist_tpu.models.fbgmm import log_weights
from segmentalist_tpu.ops.random import NEG_INF
from segmentalist_tpu.ops.stats import (
    add_item,
    canonicalize_new_component,
    suff_stats_from_assignments,
)
from segmentalist_tpu.priors import NIW
from segmentalist_tpu.segmenters.common import (
    leave_out_stats,
    utterance_contrib,
)
from segmentalist_tpu.segmenters.fullcov import (
    corrected_candidate_post,
    counts_contrib,
    fullcov_chain,
    touched_leave_out,
)

D = 4
K = 6
N = 40


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    X = jnp.asarray(rng.randn(N, D))
    prior = NIW.create(np.zeros(D), 1.0, D + 2.0,
                       np.eye(D) + 0.1 * np.ones((D, D)))
    assignments = jnp.asarray(
        rng.randint(-1, K - 2, N), dtype=jnp.int32  # slots K-2, K-1 empty
    )
    stats = suff_stats_from_assignments(X, assignments, K, full_cov=True)
    # Three "utterances": include duplicate components within a row, -1 pads,
    # and a row whose removal empties a component.
    old_embeds = jnp.asarray([[0, 1, 2, -1], [3, 3, 4, 5], [-1, -1, -1, -1]],
                             dtype=jnp.int32)
    old_ks = jnp.where(
        old_embeds >= 0, assignments[jnp.maximum(old_embeds, 0)], -1
    )
    return X, prior, assignments, stats, old_embeds, old_ks


def test_corrected_scores_match_dense():
    X, prior, _, stats, old_embeds, old_ks = _setup()
    B = old_embeds.shape[0]
    rng = np.random.RandomState(1)
    cand_ids = jnp.asarray(rng.randint(0, N, (B, 7)), dtype=jnp.int32)
    Xc = X[cand_ids]

    # Dense reference: per-utterance leave-out params, per-utterance scoring.
    contrib = utterance_contrib(X, old_embeds, old_ks, K, full_cov=True)
    lo = leave_out_stats(stats, contrib)
    params_b = jax.vmap(lambda s: cf.predictive_params(prior, s))(lo)
    dense = jax.vmap(cf.log_post_pred_batch)(params_b, Xc)

    # Fast path: global params + touched corrections.
    params_g = cf.predictive_params(prior, stats)
    post = cf.log_post_pred_batch(
        params_g, Xc.reshape(B * 7, D)
    ).reshape(B, 7, K)
    touched = touched_leave_out(prior, stats, X, old_embeds, old_ks)
    fast = corrected_candidate_post(post, Xc, touched, K)

    # Compare only columns whose leave-out count > 0 (count-0 columns are
    # masked to the prior by every caller before use).
    lo_counts = np.asarray(lo.counts)
    mask = (lo_counts > 0)[:, None, :]
    np.testing.assert_allclose(
        np.asarray(fast)[np.broadcast_to(mask, fast.shape)],
        np.asarray(dense)[np.broadcast_to(mask, dense.shape)],
        rtol=1e-9, atol=1e-9,
    )
    # Leave-out counts from the sparse path match the dense ones.
    np.testing.assert_array_equal(
        np.asarray(stats.counts[None] - counts_contrib(
            old_ks, old_embeds >= 0, K
        )),
        lo_counts,
    )


def _dense_chain(prior, X, lo, params_b, log_prior_vec, new_embeds, gumbel,
                 alpha, lms, temp):
    """The dense assignment chain the sweep used before the fast path
    (segmenters/unigram.py assignment_chain), as an oracle."""

    def one(lo_b, p_b, embeds_b, gumb_b):
        def step(carry, inp):
            stats_b, p_b = carry
            e, g = inp
            ok = e >= 0
            x = X[jnp.maximum(e, 0)]
            w = log_weights(stats_b.counts, alpha, K, lms,
                            include_denominator=False, dtype=x.dtype)
            post = cf.log_post_pred(p_b, x)
            logits = w + jnp.where(
                stats_b.counts > 0, post, log_prior_vec[jnp.maximum(e, 0)]
            )
            k = jnp.argmax(jnp.where(
                jnp.isneginf(logits), NEG_INF, logits / temp + g
            ))
            k = canonicalize_new_component(stats_b.counts, k)
            stats_b = add_item(stats_b, x, k, full_cov=True,
                               weight=ok.astype(jnp.int32))
            p_b = cf.update_predictive_row(prior, stats_b, p_b, k)
            return (stats_b, p_b), jnp.where(ok, k.astype(jnp.int32), -1)

        (_, _), ks = jax.lax.scan(step, (lo_b, p_b), (embeds_b, gumb_b))
        return ks

    return jax.vmap(one)(lo, params_b, new_embeds, gumbel)


def test_fullcov_chain_matches_dense_chain():
    X, prior, _, stats, old_embeds, old_ks = _setup(seed=2)
    B = old_embeds.shape[0]
    log_prior_vec = cf.log_prior_batch(prior, X)
    new_embeds = jnp.asarray(
        [[6, 7, 8, -1, -1], [9, 10, 11, 12, -1], [13, -1, -1, -1, -1]],
        dtype=jnp.int32,
    )
    gumbel = jax.random.gumbel(
        jax.random.PRNGKey(7), new_embeds.shape + (K,), dtype=X.dtype
    )
    alpha, lms, temp = 1.0, 1.0, 1.0

    contrib = utterance_contrib(X, old_embeds, old_ks, K, full_cov=True)
    lo = leave_out_stats(stats, contrib)
    params_b = jax.vmap(lambda s: cf.predictive_params(prior, s))(lo)
    dense_ks = _dense_chain(prior, X, lo, params_b, log_prior_vec,
                            new_embeds, gumbel, alpha, lms, temp)

    params_g = cf.predictive_params(prior, stats)
    touched = touched_leave_out(prior, stats, X, old_embeds, old_ks)
    S = new_embeds.shape[1]
    G_new = cf.log_post_pred_batch(
        params_g, X[jnp.maximum(new_embeds, 0)].reshape(B * S, D)
    ).reshape(B, S, K)
    fast_ks = fullcov_chain(
        prior, X, params_g, stats.counts, lo.counts, touched, new_embeds,
        G_new, gumbel, log_prior_vec, alpha, K, lms, temp, use_argmax=False,
    )
    np.testing.assert_array_equal(np.asarray(dense_ks), np.asarray(fast_ks))


def test_fullcov_chain_viterbi_matches():
    X, prior, _, stats, old_embeds, old_ks = _setup(seed=3)
    B = old_embeds.shape[0]
    log_prior_vec = cf.log_prior_batch(prior, X)
    new_embeds = jnp.asarray([[14, 15, -1, -1, -1], [16, 17, 18, -1, -1],
                              [19, 20, 21, 22, 23]], dtype=jnp.int32)
    gumbel = jnp.zeros(new_embeds.shape + (K,), dtype=X.dtype)

    contrib = utterance_contrib(X, old_embeds, old_ks, K, full_cov=True)
    lo = leave_out_stats(stats, contrib)
    params_g = cf.predictive_params(prior, stats)
    touched = touched_leave_out(prior, stats, X, old_embeds, old_ks)
    S = new_embeds.shape[1]
    G_new = cf.log_post_pred_batch(
        params_g, X[jnp.maximum(new_embeds, 0)].reshape(B * S, D)
    ).reshape(B, S, K)
    # Viterbi (argmax) equals temp->0 Gumbel-max with zero noise.
    vit = fullcov_chain(
        prior, X, params_g, stats.counts, lo.counts, touched, new_embeds,
        G_new, gumbel, log_prior_vec, 1.0, K, 1.0, 1.0, use_argmax=True,
    )
    gm = fullcov_chain(
        prior, X, params_g, stats.counts, lo.counts, touched, new_embeds,
        G_new, gumbel, log_prior_vec, 1.0, K, 1.0, 1e-6, use_argmax=False,
    )
    np.testing.assert_array_equal(np.asarray(vit), np.asarray(gm))
