"""Multi-device sharding tests (virtual 8-device CPU mesh, see conftest)."""

import jax
import numpy as np
import pytest

from segmentalist_tpu.parallel import make_mesh, shard_segmenter


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_unigram_sweep_on_8_device_mesh():
    import __graft_entry__ as ge

    mesh = make_mesh(8)
    seg = ge._build_segmenter(n_utterances=16, batch_size=8, seed=0)
    shard_segmenter(seg, mesh)
    with mesh:
        record = seg.gibbs_sample(2)
    assert np.isfinite(record["log_marg"]).all()
    # State stays consistent: stats match a from-scratch rebuild.
    am = seg.acoustic_model
    from segmentalist_tpu.ops.stats import suff_stats_from_assignments

    rebuilt = suff_stats_from_assignments(am.X, am.assignments, am.K_max)
    np.testing.assert_array_equal(
        np.asarray(am.stats.counts), np.asarray(rebuilt.counts)
    )
    np.testing.assert_allclose(
        np.asarray(am.stats.sum_x), np.asarray(rebuilt.sum_x), rtol=1e-8
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_unsharded():
    """The sharded sweep must produce the same chain as the single-device one
    (same keys, same blocks => identical results up to float reduction)."""
    import __graft_entry__ as ge

    seg_a = ge._build_segmenter(n_utterances=16, batch_size=8, seed=3)
    rec_a = seg_a.gibbs_sample(2)

    seg_b = ge._build_segmenter(n_utterances=16, batch_size=8, seed=3)
    shard_segmenter(seg_b, make_mesh(8))
    with seg_b._mesh:
        rec_b = seg_b.gibbs_sample(2)

    np.testing.assert_array_equal(
        np.asarray(seg_a.acoustic_model.assignments),
        np.asarray(seg_b.acoustic_model.assignments),
    )
    np.testing.assert_allclose(rec_a["log_marg"], rec_b["log_marg"], rtol=1e-6)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    n = min(len(jax.devices()), 8)
    ge.dryrun_multichip(n)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    jax.block_until_ready(out)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_map_sweep():
    """Explicit-collective (shard_map) sweep: runs per-shard with psum'ed
    statistics; state stays globally consistent and sampling is healthy."""
    import __graft_entry__ as ge
    from segmentalist_tpu.parallel.shard_sweep import use_shard_map_sweep

    mesh = make_mesh(8)
    seg = ge._build_segmenter(n_utterances=16, batch_size=8, seed=4)
    shard_segmenter(seg, mesh)
    use_shard_map_sweep(seg, mesh)
    record = seg.gibbs_sample(3)
    assert np.isfinite(record["log_marg"]).all()
    # Statistics match a from-scratch rebuild of the (replicated) assignments.
    am = seg.acoustic_model
    from segmentalist_tpu.ops.stats import suff_stats_from_assignments

    rebuilt = suff_stats_from_assignments(am.X, am.assignments, am.K_max)
    np.testing.assert_array_equal(
        np.asarray(am.stats.counts), np.asarray(rebuilt.counts)
    )
    np.testing.assert_allclose(
        np.asarray(am.stats.sum_x), np.asarray(rebuilt.sum_x),
        rtol=1e-5, atol=1e-6,
    )
    # Boundaries remain sharded over the mesh.
    assert not seg._boundaries_dev.sharding.is_fully_replicated
    # log_marg improves or holds (healthy sampling).
    assert record["log_marg"][-1] > record["log_marg"][0] - 50.0
