"""Shard_map sweep overhead: 1 vs N virtual CPU devices (correctness scale).

Real multi-chip hardware is unavailable in this environment, so this does
NOT measure ICI -- virtual CPU devices share one host and their collectives
are memcpy-speed.  What it CAN show is the overhead *shape* of the explicit-
collective sweep (parallel/shard_sweep.py): per-block collective count and
the fixed per-sweep cost that does not shrink with the shard count, which
the analytic communication budget in PERFORMANCE.md ("Multi-chip
communication budget") predicts from psum volumes vs ICI bandwidth.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python benchmarks/multichip_overhead.py

Measurement protocol: the same corpus (U utterances) swept with the
shard_map sweep on a 1-device mesh and an 8-device mesh; per-sweep walltime
best-of-3 x SWEEPS sweeps, after a warmup call that compiles both programs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

U, N_LM, D, K, W = 64, 12, 13, 200, 4
SWEEPS = 16


def build(batch_size, seed=0):
    from segmentalist_tpu import FBGMM, FixedVarPrior
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
    from segmentalist_tpu.utils.synth import synthetic_corpus

    em, vi, du, lm, _ = synthetic_corpus(
        n_utterances=U, n_landmarks_max=N_LM, D=D, K_true=20,
        n_slices_max=W, seed=seed)
    em = {k: v.astype(np.float32) for k, v in em.items()}
    prior = FixedVarPrior.create(0.05 * np.ones(D, np.float32),
                                 np.zeros(D, np.float32),
                                 np.ones(D, np.float32))
    np.random.seed(seed)
    return UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=K, am_param_prior=prior,
        embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
        landmarks_dict=lm, p_boundary_init=0.5, beta_sent_boundary=-1,
        n_slices_max=W, batch_size=batch_size, seed=seed)


def timed(n_devices):
    from segmentalist_tpu.parallel import make_mesh, shard_segmenter
    from segmentalist_tpu.parallel.shard_sweep import use_shard_map_sweep

    mesh = make_mesh(n_devices)
    seg = build(batch_size=8 * n_devices)  # same global block size per step
    shard_segmenter(seg, mesh)
    use_shard_map_sweep(seg, mesh)
    seg.gibbs_sample(2)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        seg.gibbs_sample(SWEEPS)
        best = min(best, (time.time() - t0) / SWEEPS)
    return best


def main():
    n = len(jax.devices())
    assert n >= 8, ("need XLA_FLAGS=--xla_force_host_platform_device_count=8 "
                    "JAX_PLATFORMS=cpu")
    t1 = timed(1)
    t8 = timed(8)
    print("shard_map sweep, U=%d, global block 8x n_shards:" % U)
    print("  1 device : %.2f ms/sweep" % (t1 * 1e3))
    print("  8 devices: %.2f ms/sweep  (x%.2f)" % (t8 * 1e3, t1 / t8))
    print("(virtual CPU devices -- collective cost is memcpy, not ICI; "
          "use PERFORMANCE.md's analytic budget for real-chip predictions)")


if __name__ == "__main__":
    main()
