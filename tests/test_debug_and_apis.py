"""Observability (monitor_i / validate), bigram host APIs, and batched
set_K reassignment (VERDICT round 1, items 5, 7, 8)."""

import logging

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from segmentalist_tpu import FBGMM, FixedVarPrior
from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg
from segmentalist_tpu.segmenters.kmeans_seg import SegmentalKMeansWordseg
from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
from segmentalist_tpu.utils.debug import ValidationError
from segmentalist_tpu.utils.synth import synthetic_corpus

D = 4


def _corpus(seed=11):
    return synthetic_corpus(n_utterances=6, n_landmarks_max=5, D=D, K_true=3,
                            n_slices_max=3, seed=seed)[:4]


def _prior():
    return FixedVarPrior.create(0.05 * np.ones(D), np.zeros(D), np.ones(D))


def _unigram(seed=11, **kw):
    em, vi, du, lm = _corpus(seed)
    np.random.seed(seed)
    return UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=6, am_param_prior=_prior(),
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=3, batch_size=3, seed=seed, **kw)


def _bigram(seed=11):
    em, vi, du, lm = _corpus(seed)
    np.random.seed(seed)
    return BigramAcousticWordseg(
        am_K=6, am_param_prior=_prior(),
        lm_params={"type": "smooth", "intrp_lambda": 0.1, "a": 1.0, "b": 1.0},
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, fb_type="unigram", p_boundary_init=0.5,
        beta_sent_boundary=-1, n_slices_max=3, batch_size=3, seed=seed)


def _kmeans(seed=11):
    em, vi, du, lm = _corpus(seed)
    np.random.seed(seed)
    return SegmentalKMeansWordseg(
        am_K=6, embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, n_slices_max=3,
        batch_size=3, seed=seed)


# ------------------------------------------------------------- monitor_i --

@pytest.mark.parametrize("family", ["unigram", "bigram", "kmeans"])
def test_monitor_and_validate(family, caplog):
    seg = {"unigram": _unigram, "bigram": _bigram, "kmeans": _kmeans}[family]()
    with caplog.at_level(logging.DEBUG, logger="segmentalist_tpu"):
        if family == "kmeans":
            rec = seg.segment(2, monitor_i=1, validate=True)
            assert np.isfinite(rec["sum_neg_sqrd_norm"]).all()
        else:
            rec = seg.gibbs_sample(2, monitor_i=1, validate=True)
            assert np.isfinite(rec["log_marg"]).all()
    msgs = [r.message for r in caplog.records if "monitor utterance 1" in r.message]
    # Two sweeps x (state line + score table line).
    assert len(msgs) == 4
    assert any("candidate scores" in m for m in msgs)
    assert any("transcript" in m for m in msgs)


def test_debug_only_flags_touch_one_utterance():
    """debug_gibbs_only / segment_debug_only resample ONLY the monitored
    utterance (reference standing flags, unigram_acoustic_wordseg.py:20,
    kmeans_acoustic_wordseg.py:20): every other utterance's boundaries and
    assignments are untouched."""
    for family, build in (("unigram", _unigram), ("kmeans", _kmeans)):
        seg = build()
        bounds0 = np.asarray(seg._boundaries_dev).copy()
        if family == "kmeans":
            seg.segment(2, monitor_i=1, segment_debug_only=True)
        else:
            seg.gibbs_sample(2, monitor_i=1, debug_gibbs_only=True)
        bounds1 = np.asarray(seg._boundaries_dev)
        others = [i for i in range(seg.utterances.D) if i != 1]
        npt.assert_array_equal(bounds1[others], bounds0[others])


def test_validate_raises_on_poisoned_state():
    seg = _unigram(seed=12)
    am = seg.acoustic_model
    am.stats = am.stats._replace(sum_x=am.stats.sum_x.at[0, 0].set(jnp.nan))
    with pytest.raises(ValidationError, match="sum_x"):
        seg.gibbs_sample(1, validate=True)


def test_validate_passes_on_healthy_run():
    seg = _bigram(seed=13)
    rec = seg.gibbs_sample(2, validate=True)
    assert np.isfinite(rec["log_marg"]).all()


# ------------------------------------------------------ bigram host APIs --

def test_get_vec_embed_log_probs_unigram_matches_scalar():
    seg = _bigram(seed=14)
    seg.gibbs_sample(1)
    vec_ids = np.asarray(seg.utterances.vec_ids[0])
    durations = np.asarray(seg.utterances.durations[0])
    out = seg.get_vec_embed_log_probs_unigram(vec_ids, durations)
    assert out.shape == vec_ids.shape
    for j in range(len(vec_ids)):
        if vec_ids[j] == -1 or np.isnan(durations[j]):
            assert out[j] == -np.inf
        else:
            expect = (seg.log_marg_i_embed_unigram(int(vec_ids[j]))
                      * durations[j] ** seg.time_power_term + seg.wip)
            npt.assert_allclose(out[j], expect, rtol=1e-6)


def _windowed_mask(N, W):
    """Packed-slot mask of spans the DP window can consume (w < W)."""
    t = np.repeat(np.arange(N), np.arange(N) + 1)
    j = np.concatenate([np.arange(k + 1) for k in range(N)])
    return (t - j) < W


@pytest.mark.parametrize("family", ["unigram", "bigram"])
def test_vec_embed_log_probs_batch_matches_per_utterance(family):
    """The ONE-dispatch batch scorer (VERDICT r3 item 7) reproduces the
    per-utterance reference API exactly on every windowed slot, for every
    utterance, after a sweep has moved the model state."""
    if family == "unigram":
        seg = _unigram(seed=21)
        per_fn, batch_fn = (seg.get_vec_embed_log_probs,
                            seg.get_vec_embed_log_probs_all)
    else:
        seg = _bigram(seed=21)
        per_fn, batch_fn = (seg.get_vec_embed_log_probs_unigram,
                            seg.get_vec_embed_log_probs_unigram_all)
    seg.gibbs_sample(1)
    utt = seg.utterances
    batch = batch_fn()
    assert len(batch) == utt.D
    for i in range(utt.D):
        N = utt.lengths[i]
        T = N * (N + 1) // 2
        per = per_fn(utt.vec_ids[i, :T], utt.durations[i, :T])
        m = _windowed_mask(N, utt.n_slices_max)
        assert batch[i].shape == per.shape == (T,)
        npt.assert_allclose(batch[i][m], per[m], rtol=1e-5, atol=1e-5)
        assert np.all(batch[i][~m] == -np.inf)
    # Subsets select the right rows.
    sub = batch_fn(utt_ids=[2, 0])
    npt.assert_array_equal(sub[0], batch[2])
    npt.assert_array_equal(sub[1], batch[0])


def test_tri_to_dense_roundtrip():
    """Vectorised _tri_to_dense / _dense_to_tri are mutual inverses on the
    windowed slots."""
    from segmentalist_tpu.segmenters.unigram import _dense_to_tri, _tri_to_dense

    rng = np.random.RandomState(0)
    N, W = 7, 3
    vec = rng.randn(N * (N + 1) // 2)
    dense = _tri_to_dense(vec, N, W)
    back = _dense_to_tri(dense, [N])[0]
    m = _windowed_mask(N, W)
    npt.assert_allclose(back[m], vec[m], rtol=1e-12)
    assert np.all(back[~m] == -np.inf)


def test_gibbs_sample_inside_loop_i_embed_public():
    seg = _bigram(seed=15)
    am = seg.acoustic_model
    # Pick an assigned embedding, remove it, and re-sample conditioned on a
    # previous component.
    i_embed = int(np.flatnonzero(np.asarray(am.assignments) >= 0)[0])
    am.del_item(i_embed)
    n_before = int(jnp.sum(am.stats.counts))
    k = seg.gibbs_sample_inside_loop_i_embed(i_embed, j_prev_assignment=0)
    assert 0 <= k < am.K_max
    assert int(am.assignments[i_embed]) == k
    assert int(jnp.sum(am.stats.counts)) == n_before + 1
    # First-token path (no previous assignment) also works.
    am.del_item(i_embed)
    k2 = seg.gibbs_sample_inside_loop_i_embed(i_embed, j_prev_assignment=-1)
    assert 0 <= k2 < am.K_max


# ------------------------------------------------------- batched set_K ----

def test_set_k_reassigns_in_one_device_call():
    rng = np.random.RandomState(3)
    X = rng.randn(40, D)
    prior = _prior()
    np.random.seed(3)
    model = FBGMM(X, prior, alpha=1.0, K=10, assignments="rand",
                  covariance_type="fixed")
    n_assigned = model.get_n_assigned()
    calls = []
    orig = model.gibbs_sample_inside_loop_i
    model.gibbs_sample_inside_loop_i = lambda *a, **k: calls.append(1) or orig(*a, **k)
    model.set_K(3, reassign=True)
    assert not calls, "set_K must not fall back to per-item host dispatches"
    assert model.K_max == 3
    assert model.get_n_assigned() == n_assigned
    # Statistics consistent with the assignment vector.
    from segmentalist_tpu.ops.stats import suff_stats_from_assignments

    rebuilt = suff_stats_from_assignments(model.X, model.assignments, 3)
    npt.assert_array_equal(np.asarray(model.stats.counts),
                           np.asarray(rebuilt.counts))
    npt.assert_allclose(np.asarray(model.stats.sum_x),
                        np.asarray(rebuilt.sum_x), rtol=1e-9, atol=1e-12)


def test_components_view_del_component():
    """components.del_component(k) unassigns the slot's members and zeroes
    its statistics (reference del_component, gaussian_components.py:188-205;
    masked slots instead of swap-with-last relabelling)."""
    rng = np.random.RandomState(5)
    X = rng.randn(20, D)
    np.random.seed(5)
    model = FBGMM(X, _prior(), alpha=1.0, K=4, assignments="rand",
                  covariance_type="fixed")
    k = int(np.asarray(model.assignments)[0])
    n_members = int((np.asarray(model.assignments) == k).sum())
    n_before = model.get_n_assigned()
    model.components.del_component(k)
    assert int(model.stats.counts[k]) == 0
    npt.assert_allclose(np.asarray(model.stats.sum_x[k]), 0.0, atol=1e-12)
    assert model.get_n_assigned() == n_before - n_members
    assert not (np.asarray(model.assignments) == k).any()


def test_bigram_dp_stub_raises():
    seg = _bigram(seed=16)
    with pytest.raises(NotImplementedError):
        seg.get_vec_embed_log_probs_bigram([0, 1], [1.0, 2.0])


def test_kmeans_fit_no_empty_kwarg():
    """Signature parity with the reference fit(n_iter, consider_unassigned,
    no_empty) (kmeans.py:97; no_empty is vestigial there too)."""
    from segmentalist_tpu import KMeans

    rng = np.random.RandomState(6)
    np.random.seed(6)
    km = KMeans(rng.randn(30, D), 4, "rand")
    rec = km.fit(3, consider_unassigned=True, no_empty=True)
    assert np.isfinite(rec["sum_neg_sqrd_norm"]).all()
