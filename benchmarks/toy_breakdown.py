"""Per-sweep device-cost breakdown of the 2-D toy FBGMM blocked sweep
(the `clustering_2d` bench config): where do the microseconds go when the
model is far too small to exploit the TPU?

Times, per sweep, amortised over fused 16-sweep chunks x 32 chunks:
  * empty       -- a scan of 16 no-op sweeps (carry passthrough + trivial
                   update so XLA cannot elide the loop): loop/dispatch floor
  * sweep-only  -- the blocked Gibbs sweep without per-sweep metrics
  * full        -- sweep + fused metrics (what bench.py times)
plus the single-dispatch path for comparison.

Run on the TPU chip:  python benchmarks/toy_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N, K, D = 100, 4, 2
CHUNK = 16
REPS = 32


def build_model():
    from segmentalist_tpu import FBGMM, FixedVarPrior

    rng = np.random.RandomState(0)
    means = rng.randn(K, D) * 3.0
    X = (means[rng.randint(0, K, N)]
         + rng.randn(N, D) * 0.5).astype(np.float32)
    prior = FixedVarPrior.create(
        0.5 * np.ones(D, np.float32), np.zeros(D, np.float32),
        np.ones(D, np.float32))
    np.random.seed(1)
    return FBGMM(X, prior, alpha=1.0, K=K, assignments="rand",
                 covariance_type="fixed")


def time_chunked(fn, model, label):
    """Amortised per-sweep seconds of `fn(stats, assignments, key, ts)`."""
    ts = np.ones(CHUNK, np.float32)
    s, a, k = model.stats, model.assignments, model.key
    s, a, k, _ = fn(s, a, k, ts)  # compile
    jax.block_until_ready(s.counts)
    t0 = time.time()
    for _ in range(REPS):
        s, a, k, m = fn(s, a, k, ts)
    jax.block_until_ready(s.counts)
    dt = (time.time() - t0) / (REPS * CHUNK)
    print("%-12s %8.1f us/sweep" % (label, dt * 1e6), flush=True)
    return dt


def main():
    model = build_model()
    sweep = model._get_sweep_fn("blocked", True)

    # --- empty loop floor -------------------------------------------- #
    @jax.jit
    def empty_chunk(stats, assignments, key, ts):
        def f(carry, temp):
            stats, assignments, key = carry
            key, _ = jax.random.split(key)
            return (stats, assignments, key), stats.counts[0]

        (stats, assignments, key), ms = jax.lax.scan(
            f, (stats, assignments, key), ts)
        return stats, assignments, key, ms

    # --- sweep only --------------------------------------------------- #
    @jax.jit
    def sweep_chunk(stats, assignments, key, ts):
        def f(carry, temp):
            stats, assignments, key = carry
            stats, assignments, key = sweep(stats, assignments, key, temp)
            return (stats, assignments, key), stats.counts[0]

        (stats, assignments, key), ms = jax.lax.scan(
            f, (stats, assignments, key), ts)
        return stats, assignments, key, ms

    # --- full (sweep + metrics), as FBGMM._get_chunk_fn --------------- #
    full_chunk = model._get_chunk_fn("blocked", True)

    time_chunked(empty_chunk, model, "empty")
    time_chunked(sweep_chunk, model, "sweep-only")

    ts = np.ones(CHUNK, np.float32)
    s, a, k = model.stats, model.assignments, model.key
    s, a, k, m = full_chunk(s, a, k, ts)
    jax.block_until_ready(s.counts)
    t0 = time.time()
    for _ in range(REPS):
        s, a, k, m = full_chunk(s, a, k, ts)
    jax.block_until_ready(s.counts)
    dt = (time.time() - t0) / (REPS * CHUNK)
    print("%-12s %8.1f us/sweep" % ("full", dt * 1e6), flush=True)

    # --- single-sweep dispatch path (for reference) ------------------- #
    s, a, k = model.stats, model.assignments, model.key
    temp = np.float32(1.0)
    s, a, k = sweep(s, a, k, temp)
    jax.block_until_ready(s.counts)
    t0 = time.time()
    for _ in range(256):
        s, a, k = sweep(s, a, k, temp)
    jax.block_until_ready(s.counts)
    print("%-12s %8.1f us/sweep (unfused single dispatch)"
          % ("1-dispatch", (time.time() - t0) / 256 * 1e6), flush=True)


if __name__ == "__main__":
    main()
