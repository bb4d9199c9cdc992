"""Reference public-API surface parity.

Asserts every public method/attribute of the reference's user-facing classes
(SURVEY.md section 2 inventory) responds on the corresponding
segmentalist_tpu object, and exercises the duck-typed component-view
mutators behaviourally.  Reference surfaces extracted from
/root/reference/segmentalist/*.py class bodies (public ``def``s and
``self.<attr> =`` bindings).
"""
import numpy as np
import numpy.testing as npt
import pytest

# Class -> space-separated public names (methods + attributes).
SURFACE = {
    "FBGMM": (
        "setup_components set_K log_prob_z log_prob_X_given_z log_marg "
        "log_marg_i gibbs_sample gibbs_sample_inside_loop_i map_assign_i "
        "get_n_assigned alpha covariance_type lms prior components"
    ),
    "BigramFBGMM": (
        "setup_components log_prob_X_given_z get_n_assigned covariance_type "
        "lms prior"
    ),
    "BigramSmoothLM": (
        "prob_i prob_i_given_j log_prob_vec_i prob_vec_i log_prob_vec_given_j "
        "prob_vec_given_j counts_from_data counts_from_utterance "
        "remove_counts_from_utterance a b bigram_counts intrp_lambda "
        "unigram_counts"
    ),
    "KMeans": "setup_components fit get_n_assigned components",
    "Utterances": (
        "get_segmented_embeds_i get_segmented_durations_i "
        "get_original_segmented_embeds_i get_segmented_landmark_indices "
        "get_segmented_landmarks boundaries durations landmarks lengths "
        "vec_ids"
    ),
    "UnigramAcousticWordseg": (
        "set_fb_type gibbs_sample_i gibbs_sample get_vec_embed_log_probs "
        "calc_p_continue get_unsup_transcript_i get_log_margs_i "
        "beta_sent_boundary fb_type ids_to_utterance_labels n_slices_max "
        "n_slices_min time_power_term utterances wip"
    ),
    "BigramAcousticWordseg": (
        "set_fb_type set_lm_counts log_prob_z log_marg "
        "log_marg_i_embed_unigram gibbs_sample_inside_loop_i_embed "
        "gibbs_sample_i gibbs_sample get_vec_embed_log_probs_unigram "
        "get_vec_embed_log_probs_bigram calc_p_continue "
        "get_unsup_transcript_i beta_sent_boundary fb_type "
        "ids_to_utterance_labels lms n_slices_max n_slices_min "
        "time_power_term utterances wip"
    ),
    "SegmentalKMeansWordseg": (
        "segment_i get_vec_embed_neg_len_sqrd_norms segment "
        "get_unsup_transcript_i get_max_unsup_transcript_i "
        "ids_to_utterance_labels n_slices_max n_slices_min utterances wip"
    ),
    # Duck-typed component-store views (reference gaussian_components*.py /
    # kmeans_components.py surfaces).
    "ComponentsView": (
        "add_item del_item del_component log_prior log_post_pred_k "
        "log_post_pred log_marg_k log_marg rand_k map counts prior "
        "get_assignments assignments"
    ),
    "KMeansComponentsView": (
        "add_item del_item del_component neg_sqrd_norm max_neg_sqrd_norm_i "
        "argmax_neg_sqrd_norm_i sum_neg_sqrd_norm get_assignments "
        "get_max_assignments clean_components setup_random_means "
        "assignments counts mean_numerators means random_means"
    ),
}


@pytest.fixture(scope="module")
def objs():
    from segmentalist_tpu import FBGMM, FixedVarPrior
    from segmentalist_tpu.models.bigram_lm import BigramSmoothLM
    from segmentalist_tpu.models.kmeans import KMeans
    from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg
    from segmentalist_tpu.segmenters.kmeans_seg import SegmentalKMeansWordseg
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
    from segmentalist_tpu.utils.synth import synthetic_corpus

    D = 4
    em, vi, du, lm, _ = synthetic_corpus(
        n_utterances=6, n_landmarks_max=6, D=D, K_true=3, n_slices_max=3,
        seed=0)
    em = {k: v.astype(np.float32) for k, v in em.items()}
    prior = FixedVarPrior.create(0.1 * np.ones(D, np.float32),
                                 np.zeros(D, np.float32),
                                 np.ones(D, np.float32))
    X = np.random.RandomState(0).randn(20, D).astype(np.float32)
    fb = FBGMM(X, prior, 1.0, 8, "rand", covariance_type="fixed")
    km = KMeans(X, 4, "rand")
    useg = UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=8, am_param_prior=prior,
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, n_slices_max=3,
        batch_size=2, seed=0)
    bseg = BigramAcousticWordseg(
        am_K=8, am_param_prior=prior,
        lm_params={"type": "smooth", "intrp_lambda": 0.1, "a": 1.0, "b": 1.0},
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, n_slices_max=3,
        fb_type="unigram", batch_size=2, seed=0)
    kseg = SegmentalKMeansWordseg(
        am_K=8, embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, n_slices_max=3,
        batch_size=2, seed=0)
    return {
        "FBGMM": fb,
        "BigramFBGMM": bseg.acoustic_model,
        "BigramSmoothLM": BigramSmoothLM(intrp_lambda=0.1, a=1.0, b=1.0, K=8),
        "KMeans": km,
        "Utterances": useg.utterances,
        "UnigramAcousticWordseg": useg,
        "BigramAcousticWordseg": bseg,
        "SegmentalKMeansWordseg": kseg,
        "ComponentsView": fb.components,
        "KMeansComponentsView": kseg.acoustic_model.components,
    }


@pytest.mark.parametrize("cls", sorted(SURFACE))
def test_reference_surface_present(objs, cls):
    obj = objs[cls]
    missing = [n for n in SURFACE[cls].split() if not hasattr(obj, n)]
    assert not missing, "%s missing reference names: %s" % (cls, missing)


def test_kmeans_view_mutators_consistent():
    """add_item/del_item/del_component keep (counts, sum_x) equal to a
    from-scratch rebuild of the mutated assignment vector."""
    from segmentalist_tpu.models.kmeans import (
        KMeans, kmeans_state_from_assignments)

    rng = np.random.RandomState(3)
    X = rng.randn(12, 3).astype(np.float32)
    km = KMeans(X, 4, rng.randint(0, 4, 12), rng=rng)
    view = km.components

    def check():
        rebuilt = kmeans_state_from_assignments(
            km.X, km.state.assignments, km.K_max)
        npt.assert_array_equal(np.asarray(km.state.counts),
                               np.asarray(rebuilt.counts))
        npt.assert_allclose(np.asarray(km.state.sum_x),
                            np.asarray(rebuilt.sum_x), atol=1e-5)

    view.del_item(5)
    assert int(km.state.assignments[5]) == -1
    check()
    view.add_item(5, 2)
    assert int(km.state.assignments[5]) == 2
    check()
    k_del = int(km.state.assignments[0])
    n_members = int(np.sum(np.asarray(km.state.assignments) == k_del))
    view.del_component(k_del)
    assert int(km.state.counts[k_del]) == 0
    assert km.get_n_assigned() == 12 - n_members
    check()
    old_rm = np.asarray(km.random_means).copy()
    view.setup_random_means()
    assert np.asarray(km.random_means).shape == old_rm.shape


def test_components_view_prior_is_model_prior():
    from segmentalist_tpu import FBGMM, FixedVarPrior

    X = np.random.RandomState(0).randn(10, 3).astype(np.float32)
    prior = FixedVarPrior.create(0.1 * np.ones(3, np.float32),
                                 np.zeros(3, np.float32),
                                 np.ones(3, np.float32))
    fb = FBGMM(X, prior, 1.0, 4, "rand", covariance_type="fixed")
    assert fb.components.prior is fb.prior
