"""Micro-tune of the fullcov scoring kernel's utterance tile on hardware.

Times fullcov_log_margs alone at benchmark shapes (B=125 utterances, M=120
candidates, K=1000, D=13, S=8 touched slots) for each B_tile override.
Run:  python benchmarks/fullcov_score_tune.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, M, D, K, S = (125, 120, 13, 1000,
                 int(os.environ.get("SEGTPU_TUNE_S", "8")))
DD = D * D


def inputs(rng):
    Xc = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    prior_c = jnp.asarray(rng.randn(B, M).astype(np.float32))
    g_A2 = jnp.asarray(rng.randn(K, DD).astype(np.float32))
    g_A1 = jnp.asarray(rng.randn(K, D).astype(np.float32))
    g_a0 = jnp.asarray(np.abs(rng.randn(K)).astype(np.float32))
    g_ck = jnp.asarray(rng.randn(K).astype(np.float32))
    g_vinv = jnp.asarray((1.0 / (D + np.abs(rng.randn(K)))).astype(np.float32))
    g_vh = jnp.asarray((D + np.abs(rng.randn(K))).astype(np.float32))
    t_A2 = jnp.asarray(rng.randn(B, S, DD).astype(np.float32))
    t_A1 = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    t_a0 = jnp.asarray(np.abs(rng.randn(B, S)).astype(np.float32))
    t_ck = jnp.asarray(rng.randn(B, S).astype(np.float32))
    t_vinv = jnp.asarray((1.0 / (D + np.abs(rng.randn(B, S)))).astype(np.float32))
    t_vh = jnp.asarray((D + np.abs(rng.randn(B, S))).astype(np.float32))
    ks = rng.randint(0, K, (B, S))
    t_oh = jnp.asarray(np.eye(K, dtype=np.float32)[ks])
    tmask = jnp.asarray(t_oh.sum(1))
    w = jnp.asarray(rng.randn(B, K).astype(np.float32))
    counts = jnp.asarray(rng.randint(0, 3, (B, K)).astype(np.float32))
    return (Xc, prior_c, g_A2, g_A1, g_a0, g_ck, g_vinv, g_vh,
            t_A2, t_A1, t_a0, t_ck, t_vinv, t_vh, t_oh, tmask, w, counts)


def main():
    rng = np.random.RandomState(0)
    args = inputs(rng)
    for bt in (None, 1, 2, 4, 8, 16):
        if bt is not None:
            os.environ["SEGTPU_FULLCOV_SCORE_BT"] = str(bt)
        else:
            os.environ.pop("SEGTPU_FULLCOV_SCORE_BT", None)
        # Re-import per setting: the kernel reads the env at trace time and
        # jit caches on the python callable, so clear caches.
        import segmentalist_tpu.ops.pallas_score as ps

        ps.fullcov_log_margs.clear_cache()
        out = ps.fullcov_log_margs(*args, K=K, interpret=False)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(50):
            out = ps.fullcov_log_margs(*args, K=K, interpret=False)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 50
        print("B_tile=%-5s  %.3f ms/call  (x8 blocks -> %.2f ms/sweep)"
              % (bt, dt * 1e3, dt * 8e3), flush=True)


if __name__ == "__main__":
    main()


def profiled(bt=16):
    """Trace the kernel standalone and print its event duration -- checks
    that the timeline attribution matches the eager wall measurement."""
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from op_profile import parse_xspace

    os.environ["SEGTPU_FULLCOV_SCORE_BT"] = str(bt)
    import segmentalist_tpu.ops.pallas_score as ps

    ps.fullcov_log_margs.clear_cache()
    rng = np.random.RandomState(0)
    args = inputs(rng)
    out = ps.fullcov_log_margs(*args, K=K, interpret=False)
    jax.block_until_ready(out)
    logdir = tempfile.mkdtemp(prefix="fctune_")
    with jax.profiler.trace(logdir):
        for _ in range(50):
            out = ps.fullcov_log_margs(*args, K=K, interpret=False)
        jax.block_until_ready(out)
    totals, _ = parse_xspace(logdir)
    for name, s in totals.most_common(6):
        print("  %8.4f ms/call  %s" % (s / 50 * 1e3, name[:90]), flush=True)
