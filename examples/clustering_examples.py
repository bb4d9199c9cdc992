"""FBGMM vs. k-means clustering on 2-D synthetic data.

Runnable counterpart of the reference's ``examples/clustering_examples.ipynb``
(C17 in SURVEY.md section 2): draw N = 100 points from four 2-D Gaussians,
cluster them with (a) a fixed-variance finite Bayesian GMM under collapsed
Gibbs sampling and (b) k-means, report the per-iteration record statistics,
and save a side-by-side scatter plot.

Run on CPU (seconds) or the TPU chip:

    JAX_PLATFORMS=cpu python examples/clustering_examples.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from segmentalist_tpu import FBGMM, FixedVarPrior, KMeans
from examples.plot_utils import plot_mixture_model


def generate_data(seed=2, N=100, D=2, K_true=4, mu_scale=4.0, covar_scale=0.7):
    rng = np.random.RandomState(seed)
    z_true = rng.randint(0, K_true, N)
    mu = rng.randn(D, K_true) * mu_scale
    X = mu[:, z_true] + rng.randn(D, N) * covar_scale
    return X.T.astype(np.float32), z_true, mu.T


def main():
    X, z_true, mu_true = generate_data()
    N, D = X.shape
    K = 4

    # --- FBGMM (fixed variance), collapsed Gibbs -------------------------- #
    covar_scale = 0.7
    mu_scale = 4.0
    prior = FixedVarPrior.create(
        covar_scale**2 * np.ones(D),
        np.zeros(D),
        (covar_scale**2 / 0.05) * np.ones(D),
    )
    np.random.seed(2)
    fbgmm = FBGMM(X, prior, alpha=1.0, K=K, assignments="rand",
                  covariance_type="fixed")
    t0 = time.time()
    record = fbgmm.gibbs_sample(20)
    fbgmm_time = time.time() - t0
    print("FBGMM: 20 sweeps in %.3fs, final log_marg %.3f, K=%d"
          % (fbgmm_time, record["log_marg"][-1], record["components"][-1]))

    # --- k-means ----------------------------------------------------------- #
    np.random.seed(2)
    km = KMeans(X, K, assignments="rand")
    t0 = time.time()
    km_record = km.fit(20)
    km_time = time.time() - t0
    print("KMeans: %d iterations in %.3fs, final sum_neg_sqrd_norm %.3f"
          % (len(km_record["sum_neg_sqrd_norm"]), km_time,
             km_record["sum_neg_sqrd_norm"][-1]))

    # --- plot --------------------------------------------------------------- #
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].scatter(X[:, 0], X[:, 1], c=z_true, s=12, cmap="tab10")
    axes[0].set_title("ground truth")
    plot_mixture_model(axes[1], X, np.asarray(fbgmm.assignments))
    axes[1].set_title("FBGMM (fixed var), 20 Gibbs sweeps")
    plot_mixture_model(axes[2], X, np.asarray(km.assignments),
                       means=np.asarray(km.means()))
    axes[2].set_title("k-means, 20 iterations")
    out = os.path.join(os.path.dirname(__file__), "clustering_examples.png")
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
