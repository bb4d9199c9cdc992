"""Per-op device-time attribution from a JAX profiler trace.

Runs N timed sweeps of one model family under ``jax.profiler.trace``, parses
the written ``*.xplane.pb`` (XSpace proto, via tensorflow's bundled
``tsl.profiler`` protobuf), and prints device-side op durations aggregated
by kernel/fusion name.  Unlike stage-stub attribution (monkeypatching a
stage with a shape-compatible stub), the trace sees the program that
actually ran, so it cannot mis-attribute cost through semantic changes
(PERFORMANCE.md, "Attribution artifacts to beware").

Usage:  python benchmarks/op_profile.py [family] [n_sweeps]
        family in {fixed, diag, full, bigram, bigram_diag, bigram_full,
                   kmeans}; default fixed, 8 sweeps (one fused chunk).

Re-implements no reference behaviour; measurement tooling only.
"""
import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

D, K, W, B = 13, 1000, 6, 125
N_UTT = int(os.environ.get("OPPROF_UTT", "1000"))
if N_UTT != 1000:  # tiny-corpus smoke mode
    K, B = 50, max(4, N_UTT // 8)


def build(family):
    from segmentalist_tpu import FBGMM, NIW, FixedVarPrior
    from segmentalist_tpu.segmenters.bigram import BigramAcousticWordseg
    from segmentalist_tpu.segmenters.kmeans_seg import SegmentalKMeansWordseg
    from segmentalist_tpu.segmenters.unigram import UnigramAcousticWordseg
    from segmentalist_tpu.utils.synth import synthetic_corpus

    em, vi, du, lm, _ = synthetic_corpus(
        n_utterances=N_UTT, n_landmarks_max=20, D=D, K_true=50,
        n_slices_max=W, seed=0)
    em = {k: v.astype(np.float32) for k, v in em.items()}
    fixed = FixedVarPrior.create(0.05 * np.ones(D, np.float32),
                                 np.zeros(D, np.float32),
                                 np.ones(D, np.float32))
    niw = NIW.create(np.zeros(D, np.float32), 0.05, float(D) + 3.0,
                     0.05 * np.eye(D, dtype=np.float32))
    # The diag backend expects a DIAGONAL S_0 vector, not a matrix.
    niw_diag = NIW.create(np.zeros(D, np.float32), 0.05, float(D) + 3.0,
                          0.05 * np.ones(D, np.float32))
    kw = dict(embedding_mats=em, vec_ids_dict=vi, durations_dict=du,
              landmarks_dict=lm, p_boundary_init=0.5,
              n_slices_max=W, batch_size=B, seed=0)
    np.random.seed(0)
    if family == "kmeans":
        return SegmentalKMeansWordseg(am_K=K, **kw), "segment"
    if family.startswith("bigram"):
        cov = {"bigram": ("fixed", fixed), "bigram_diag": ("diag", niw_diag),
               "bigram_full": ("full", niw)}[family]
        return BigramAcousticWordseg(
            am_K=K, am_param_prior=cov[1], covariance_type=cov[0],
            lm_params={"type": "smooth", "intrp_lambda": 0.1, "a": 1.0,
                       "b": 1.0},
            beta_sent_boundary=-1, fb_type="unigram", **kw), "gibbs_sample"
    cov = {"fixed": ("fixed", fixed), "diag": ("diag", niw_diag),
           "full": ("full", niw)}[family]
    return UnigramAcousticWordseg(
        FBGMM, am_alpha=1.0, am_K=K, am_param_prior=cov[1],
        covariance_type=cov[0], beta_sent_boundary=-1, **kw), "gibbs_sample"


def parse_xspace(logdir):
    """Aggregate device-plane event durations by op name -> seconds."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise RuntimeError("no xplane.pb under %s" % logdir)
    totals = collections.Counter()
    plane_names = []
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            plane_names.append(plane.name)
            # Device planes only: host threads carry python/runtime noise.
            if not ("TPU" in plane.name or "/device:" in plane.name):
                continue
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            # A device plane may carry several op-view lines ("XLA Ops",
            # "TensorFlow Ops", name-scope views, ...) describing the SAME
            # device time ranges — summing more than one double-counts every
            # kernel.  Pick exactly one line per plane, best view first.
            def line_rank(ln):
                prio = {"XLA Ops": 0, "TensorFlow Ops": 1, "Ops": 2}
                if ln.name in prio:
                    return prio[ln.name]
                low = ln.name.lower()
                if "ops" in low and "scope" not in low:
                    return 3
                return None
            ranked = [(r, ln) for ln in plane.lines
                      if (r := line_rank(ln)) is not None and ln.events]
            if not ranked:
                continue
            best = min(ranked, key=lambda p: p[0])[1]
            for ev in best.events:
                name = meta.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps / 1e12
    return totals, plane_names


GROUPS = (
    ("pallas chain", ("chain_kernel", "fixedvar_chain", "diag_chain",
                      "fullcov_chain", "bigram")),
    ("pallas scoring", ("log_margs", "score_kernel", "pallas_score")),
    ("pallas dp", ("dp_kernel", "forward_filter", "pallas_dp")),
    ("fusion", ("fusion",)),
    ("convert/copy", ("convert", "copy", "bitcast", "transpose")),
    ("sort", ("sort",)),
    ("rng", ("rng", "threefry", "gumbel")),
    ("dot", ("dot", "conv")),
    ("scatter/gather", ("scatter", "gather", "dynamic")),
)


def group_of(name):
    low = name.lower()
    for g, keys in GROUPS:
        if any(k in low for k in keys):
            return g
    return "other"


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "fixed"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seg, method = build(family)
    run = getattr(seg, method)
    run(1)
    run(8)  # warm the fused chunk
    t0 = time.time()
    run(n)
    wall = time.time() - t0
    print("%s: %.4f s/sweep (untraced)" % (family, wall / n), flush=True)

    logdir = tempfile.mkdtemp(prefix="opprof_")
    with jax.profiler.trace(logdir):
        run(n)
    totals, planes = parse_xspace(logdir)
    if not totals:
        print("no device events parsed; planes seen:", planes)
        return
    dev_total = sum(totals.values())
    print("device time: %.4f s/sweep over %d sweeps (%.0f%% of wall)"
          % (dev_total / n, n, 100 * dev_total / wall))
    by_group = collections.Counter()
    for name, s in totals.items():
        by_group[group_of(name)] += s
    print("\nby group (ms/sweep):")
    for g, s in by_group.most_common():
        print("  %-18s %7.3f" % (g, s / n * 1e3))
    print("\ntop 25 ops (ms/sweep):")
    for name, s in totals.most_common(25):
        print("  %7.3f  %s" % (s / n * 1e3, name[:110]))


if __name__ == "__main__":
    main()
