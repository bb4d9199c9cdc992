"""Finite Bayesian GMM with collapsed Gibbs sampling, TPU-native.

Re-design of the reference ``FBGMM`` (``fbgmm.py``).  Differences in shape,
not behaviour:

* All state is a pytree of fixed-shape arrays (sufficient statistics +
  assignment vector + PRNG key); every sampling operation is a pure, jitted
  function of that state.
* Component deletion/compaction (``gaussian_components*.del_component``)
  becomes masking on ``counts > 0``; labels are stable and arrays static.
* Two sweep modes:
    - ``mode="sequential"``: a ``lax.scan`` over data items that reproduces the
      reference's collapsed-Gibbs Markov chain *exactly* (same conditional at
      every step, reference ``fbgmm.py:351-403``), entirely on device.
    - ``mode="blocked"``: all items are scored against leave-one-out statistics
      in one batched [N, K] kernel and resampled simultaneously, then the
      statistics are rebuilt with a segment-sum.  This is the
      throughput-oriented parallel-Gibbs approximation.
* Categorical draws use Gumbel-max under threefry keys (``ops/random.py``)
  instead of the Cython inverse-CDF ``draw``.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln

from ..ops import random as rnd
from ..ops.stats import (
    decollide_new_items,
    SuffStats,
    add_item,
    canonicalize_new_component,
    del_item,
    num_active,
    suff_stats_from_assignments,
)
from . import cov_module

# Sweeps fused per device dispatch in ``FBGMM.gibbs_sample`` (a lax.scan over
# per-sweep temperatures).  Fixed chunk lengths keep the jit cache to three
# entries (big chunk + chunk + single-sweep remainder) regardless of n_iter.
# The big chunk exists because per-dispatch overhead on a remote-attached
# chip (~2 ms RPC) dwarfs the toy model's ~75 us in-chunk sweep cost; long
# runs amortise it over 256 sweeps per dispatch.
_SWEEP_CHUNK = 16
_SWEEP_CHUNK_BIG = 256


# ---------------------------------------------------------------------------#
#                      mixture-weight / marginal terms                        #
# ---------------------------------------------------------------------------#

def log_weights(counts: jnp.ndarray, alpha, K_max: int, lms=1.0,
                include_denominator: bool = False, dtype=jnp.float32) -> jnp.ndarray:
    """[K] collapsed mixture-weight term lms * log(alpha/K + N_k) (- log(N + alpha)).

    Reference: numerator-only inside the Gibbs loop (``fbgmm.py:371-375``,
    the denominator is constant over k), both terms in ``log_marg_i``
    (``fbgmm.py:268-272``).
    """
    c = counts.astype(dtype)
    w = jnp.log(alpha / K_max + c)
    if include_denominator:
        w = w - jnp.log(jnp.sum(c) + alpha)
    return lms * w


def log_prob_z_dirichlet(counts: jnp.ndarray, alpha, K_max: int) -> jnp.ndarray:
    """log P(z) under the symmetric Dirichlet prior, Murphy (24.24)
    (reference ``FBGMM.log_prob_z``, ``fbgmm.py:208-225``).

    Empty slots contribute gammaln(a/K) - gammaln(a/K) = 0, so summing over all
    K_max slots matches the reference exactly.
    """
    c = counts.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    a = jnp.asarray(alpha, dtype=c.dtype)
    return (
        gammaln(a)
        - gammaln(a + jnp.sum(c))
        + jnp.sum(gammaln(c + a / K_max) - gammaln(a / K_max))
    )


def component_logits_batch(cov, prior, stats: SuffStats, params, X_batch,
                           log_prior_vec, alpha, K_max: int, lms=1.0,
                           include_denominator: bool = True) -> jnp.ndarray:
    """[M, K] log P(z_i = k) + log p(x_i | k) for a batch of query vectors.

    Active slots use the posterior predictive, empty slots the prior density
    (reference ``fbgmm.py:377-379`` / ``log_marg_i`` ``fbgmm.py:281-284``).
    """
    w = log_weights(counts=stats.counts, alpha=alpha, K_max=K_max, lms=lms,
                    include_denominator=include_denominator, dtype=X_batch.dtype)
    post = cov.log_post_pred_batch(params, X_batch)  # [M, K]
    active = (stats.counts > 0)[None, :]
    return w[None, :] + jnp.where(active, post, log_prior_vec[:, None])


# ---------------------------------------------------------------------------#
#                                  FBGMM                                      #
# ---------------------------------------------------------------------------#

class FBGMM:
    """Finite Bayesian Gaussian mixture model (reference ``fbgmm.py:27-498``).

    Parameters mirror the reference: ``alpha`` is the symmetric-Dirichlet
    concentration, ``K`` the maximum number of components, ``assignments`` an
    int vector / "rand" / "each-in-own", ``covariance_type`` one of
    "full" | "diag" | "fixed", ``lms`` the language-model scaling factor.
    """

    def __init__(self, X, prior, alpha, K, assignments="rand",
                 covariance_type="full", lms=1.0, key: Optional[jax.Array] = None,
                 decollide_new: bool = True):
        self.X = jnp.asarray(X)
        self.N, self.D = self.X.shape
        self.prior = prior
        self.alpha = float(alpha)
        self.K_max = int(K)
        self.covariance_type = covariance_type
        self.cov = cov_module(covariance_type)
        self.lms = float(lms)
        self.decollide_new = bool(decollide_new)
        self.key = key if key is not None else jax.random.PRNGKey(0)

        self.setup_components(K, assignments, self.X)

    # -- construction / reset (reference ``setup_components``, fbgmm.py:93-137)

    def setup_components(self, K, assignments="rand", X=None):
        if X is not None:
            self.X = jnp.asarray(X)
            self.N, self.D = self.X.shape
        self.K_max = int(K)

        if isinstance(assignments, str) and assignments == "rand":
            assignments = np.random.randint(0, self.K_max, self.N)
        elif isinstance(assignments, str) and assignments == "each-in-own":
            assignments = np.arange(self.N)
        else:
            assignments = np.asarray(assignments, dtype=np.int64)
        assignments = np.asarray(assignments, dtype=np.int64)
        # Consecutive labels (reference fbgmm.py:123-128).  With masked slots
        # this is cosmetic, but it keeps label layouts comparable.
        assignments = _make_consecutive(assignments)
        assert assignments.max(initial=-1) < self.K_max

        self.assignments = jnp.asarray(assignments, dtype=jnp.int32)
        self.stats = suff_stats_from_assignments(
            self.X, self.assignments, self.K_max, full_cov=self.cov.FULL_COV
        )
        self.log_prior_vec = self.cov.log_prior_batch(self.prior, self.X)
        self._jit_cache = {}

    # -- scalar queries (reference API parity) ------------------------------

    @property
    def K(self) -> int:
        """Number of active (non-empty) components."""
        return int(num_active(self.stats))

    def get_n_assigned(self) -> int:
        """Reference ``get_n_assigned`` (fbgmm.py:496-498)."""
        return int(jnp.sum(self.assignments >= 0))

    def log_prob_z(self) -> float:
        return float(log_prob_z_dirichlet(self.stats.counts, self.alpha, self.K_max))

    def log_prob_X_given_z(self) -> float:
        return float(self.cov.log_marg(self.prior, self.stats))

    def log_marg(self) -> float:
        """log p(X, z) (reference ``log_marg``, fbgmm.py:231-253)."""
        return self.log_prob_z() + self.log_prob_X_given_z()

    def sweep_metrics_device(self):
        """Enqueue all per-iteration record statistics as ONE device call and
        return the (unfetched) device tuple.

        Computes the reference record_dict quantities (``fbgmm.py:322-330``,
        ``unigram_acoustic_wordseg.py:423-432``) -- log_prob_z,
        log_prob_X_given_z, active K, n_assigned, n_tokens.  Returning
        device values keeps the sampling loop fully asynchronous: on a
        remote-attached TPU every synchronous fetch costs a full RPC
        round-trip, so callers batch-fetch after the last sweep
        (``metrics_to_dict``).
        """
        key = ("metrics", self.K_max)
        if key not in self._jit_cache:
            cov, prior, alpha, K_max = self.cov, self.prior, self.alpha, self.K_max

            @jax.jit
            def metrics(stats, assignments):
                lpz = log_prob_z_dirichlet(stats.counts, alpha, K_max)
                lpx = cov.log_marg(prior, stats)
                return (
                    lpz, lpx, num_active(stats),
                    jnp.sum((assignments >= 0).astype(jnp.int32)),
                    jnp.sum(stats.counts),
                )

            self._jit_cache[key] = metrics
        return self._jit_cache[key](self.stats, self.assignments)

    @staticmethod
    def metrics_to_dict(fetched) -> dict:
        """Convert one fetched ``sweep_metrics_device`` tuple to a dict."""
        lpz, lpx, k_act, n_assigned, n_tokens = fetched
        return {
            "log_prob_z": float(lpz),
            "log_prob_X_given_z": float(lpx),
            "log_marg": float(lpz) + float(lpx),
            "components": int(k_act),
            "n_assigned": int(n_assigned),
            "n_tokens": int(n_tokens),
        }

    def sweep_metrics(self) -> dict:
        """Synchronous convenience wrapper around ``sweep_metrics_device``."""
        return self.metrics_to_dict(jax.device_get(self.sweep_metrics_device()))

    def log_marg_i(self, i: int) -> float:
        """Collapsed marginal of one *held-out* vector (reference
        ``log_marg_i``, fbgmm.py:256-286): assumes x_i is not in the model."""
        params = self.cov.predictive_params(self.prior, self.stats)
        logits = component_logits_batch(
            self.cov, self.prior, self.stats, params, self.X[i : i + 1],
            self.log_prior_vec[i : i + 1], self.alpha, self.K_max, self.lms,
            include_denominator=True,
        )
        return float(rnd.logsumexp(logits[0]))

    def log_marg_batch(self, embed_ids) -> jnp.ndarray:
        """Vectorised ``log_marg_i`` over many held-out ids."""
        params = self.cov.predictive_params(self.prior, self.stats)
        ids = jnp.asarray(embed_ids)
        logits = component_logits_batch(
            self.cov, self.prior, self.stats, params, self.X[ids],
            self.log_prior_vec[ids], self.alpha, self.K_max, self.lms,
            include_denominator=True,
        )
        return rnd.logsumexp(logits, axis=-1)

    # -- single-item sampling (reference gibbs_sample_inside_loop_i /
    #    map_assign_i, fbgmm.py:422-494) ------------------------------------

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def gibbs_sample_inside_loop_i(self, i: int, anneal_temp: float = 1.0):
        """Sample an assignment for (currently unassigned) item ``i`` and add it."""
        params = self.cov.predictive_params(self.prior, self.stats)
        logits = component_logits_batch(
            self.cov, self.prior, self.stats, params, self.X[i : i + 1],
            self.log_prior_vec[i : i + 1], self.alpha, self.K_max, self.lms,
            include_denominator=False,
        )[0]
        k = rnd.annealed_gumbel_max(self._next_key(), logits, anneal_temp)
        k = canonicalize_new_component(self.stats.counts, k)
        self._add(i, k)

    def map_assign_i(self, i: int):
        """MAP assignment (reference ``map_assign_i``, fbgmm.py:465-494).
        Note the reference omits the ``lms`` scaling here; so do we."""
        params = self.cov.predictive_params(self.prior, self.stats)
        logits = component_logits_batch(
            self.cov, self.prior, self.stats, params, self.X[i : i + 1],
            self.log_prior_vec[i : i + 1], self.alpha, self.K_max, lms=1.0,
            include_denominator=False,
        )[0]
        k = jnp.argmax(logits)
        k = canonicalize_new_component(self.stats.counts, k)
        self._add(i, k)

    def _add(self, i, k):
        self.stats = add_item(self.stats, self.X[i], k, full_cov=self.cov.FULL_COV)
        self.assignments = self.assignments.at[i].set(k.astype(jnp.int32))

    def del_item(self, i: int):
        """Remove item ``i`` from its component (components.del_item parity)."""
        k = self.assignments[i]
        assigned = k >= 0
        self.stats = del_item(
            self.stats, self.X[i], jnp.maximum(k, 0),
            full_cov=self.cov.FULL_COV, weight=assigned.astype(jnp.int32),
        )
        self.assignments = self.assignments.at[i].set(-1)

    # -- set_K (reference fbgmm.py:139-180) ---------------------------------

    def set_K(self, K: int, reassign: bool = True):
        """Keep the ``K`` largest components; optionally re-sample the rest."""
        if self.K <= K:
            self.K_max = K
            # Re-pack stats into the new K_max.
            self.stats = suff_stats_from_assignments(
                self.X, self.assignments, self.K_max, full_cov=self.cov.FULL_COV
            )
            self._jit_cache = {}
            return
        counts = np.asarray(self.stats.counts)
        old_assignments = np.asarray(self.assignments)
        keep = list(np.argsort(counts)[-K:])
        mapping = {int(old): new for new, old in enumerate(keep)}
        new_assignments = np.array(
            [mapping.get(int(a), -1) for a in old_assignments], dtype=np.int64
        )
        self.setup_components(K, new_assignments)
        if reassign:
            orphans = np.where(
                (old_assignments != -1) & (new_assignments == -1)
            )[0]
            if len(orphans):
                self.reassign_items(orphans)

    def reassign_items(self, ids, anneal_temp: float = 1.0):
        """Gibbs-assign the listed (unassigned) items sequentially in ONE
        device call -- a masked scan that scores each item against the
        running statistics, exactly ``gibbs_sample_inside_loop_i`` chained
        (reference fbgmm.py:422-463) without O(len(ids)) host round-trips.

        The id list is padded to the next power-of-two bucket with -1
        sentinels (masked inside the scan), so the jit cache holds
        O(log N) entries instead of one per distinct orphan count.  Per-item
        keys come from position-indexed ``fold_in``, not ``split(sub,
        bucket)``, so the draws for the real items are identical whatever
        bucket the list pads to (seed-reproducible across versions)."""
        ids = np.asarray(ids, dtype=np.int64)
        n_real = len(ids)
        bucket = 8
        while bucket < n_real:
            bucket *= 2
        ids = np.concatenate(
            [ids, np.full((bucket - n_real,), -1, np.int64)]
        )
        cache_key = ("reassign", self.K_max, bucket)
        if cache_key not in self._jit_cache:
            cov, prior, X = self.cov, self.prior, self.X
            alpha, K_max, lms = self.alpha, self.K_max, self.lms
            log_prior_vec = self.log_prior_vec
            full_cov = cov.FULL_COV

            @jax.jit
            def run(stats, assignments, key, item_ids, temp):
                key, sub = jax.random.split(key)
                item_keys = jax.vmap(lambda j: jax.random.fold_in(sub, j))(
                    jnp.arange(item_ids.shape[0]))
                params0 = cov.predictive_params(prior, stats)

                def step(carry, inp):
                    stats, params, assignments = carry
                    i, k_i = inp
                    ok = i >= 0
                    i_s = jnp.maximum(i, 0)
                    x = X[i_s]
                    w = log_weights(stats.counts, alpha, K_max, lms,
                                    include_denominator=False, dtype=x.dtype)
                    post = cov.log_post_pred(params, x)
                    logits = w + jnp.where(stats.counts > 0, post,
                                           log_prior_vec[i_s])
                    k = rnd.annealed_gumbel_max(k_i, logits, temp)
                    k = canonicalize_new_component(stats.counts, k)
                    stats = add_item(stats, x, k, full_cov=full_cov,
                                     weight=ok.astype(jnp.int32))
                    params = cov.update_predictive_row(prior, stats, params, k)
                    assignments = assignments.at[
                        jnp.where(ok, i_s, assignments.shape[0])
                    ].set(k.astype(jnp.int32), mode="drop")
                    return (stats, params, assignments), None

                (stats, _, assignments), _ = jax.lax.scan(
                    step, (stats, params0, assignments), (item_ids, item_keys)
                )
                return stats, assignments, key

            self._jit_cache[cache_key] = run
        self.stats, self.assignments, self.key = self._jit_cache[cache_key](
            self.stats, self.assignments, self.key, jnp.asarray(ids),
            np.asarray(anneal_temp, dtype=self.X.dtype),
        )

    # -- full sweeps ---------------------------------------------------------

    def gibbs_sample(self, n_iter: int, consider_unassigned: bool = True,
                     anneal_schedule=None, anneal_start_temp_inv: float = 0.1,
                     anneal_end_temp_inv: float = 1.0, n_anneal_steps: int = -1,
                     mode: str = "sequential") -> dict:
        """Run ``n_iter`` collapsed-Gibbs sweeps; return the reference-format
        record dict (reference ``gibbs_sample``, fbgmm.py:288-420).

        Timing semantics: sweeps are dispatched in fused ``_SWEEP_CHUNK``-
        sized device calls, so ``record["sample_time"]`` entries within a
        chunk are the chunk's wall time divided evenly across its sweeps
        (all 16 report identical values) -- the *sum* over any range of
        sweeps is honest wall time, per-sweep jitter is not observable."""
        from ..utils.annealing import anneal_temperatures

        temps = anneal_temperatures(
            n_iter, anneal_schedule, anneal_start_temp_inv,
            anneal_end_temp_inv, n_anneal_steps,
        )

        record = {k: [] for k in
                  ("sample_time", "log_marg", "log_prob_z",
                   "log_prob_X_given_z", "anneal_temp", "components")}
        sweep = self._get_sweep_fn(mode, consider_unassigned)

        # Asynchronous loop: enqueue every sweep + its metrics, fetch once
        # (a per-iteration sync costs an RPC round-trip on remote TPUs).
        # Full _SWEEP_CHUNK-sized runs of sweeps are fused into ONE dispatch
        # (a lax.scan over the per-sweep temperatures): at toy model sizes
        # the per-sweep cost is pure dispatch latency, so chunking is the
        # difference between ~1 ms/sweep and ~30 us/sweep on a remote chip.
        # The chunked path calls the same jitted sweep + metrics functions
        # in the same key-splitting order, so the chain is unchanged.
        pending = []  # (t_dispatched, n_sweeps, temps, metric device tuples)
        start = time.time()
        i_iter = 0
        while i_iter < n_iter:
            remaining = n_iter - i_iter
            if remaining >= _SWEEP_CHUNK:
                # jit specialises the same chunk fn on the ts length, so the
                # big chunk costs no extra machinery -- just a second cache
                # entry when a run is long enough to use it.
                n_chunk = (_SWEEP_CHUNK_BIG
                           if remaining >= _SWEEP_CHUNK_BIG else _SWEEP_CHUNK)
                chunk = self._get_chunk_fn(mode, consider_unassigned)
                ts = np.asarray(
                    temps[i_iter:i_iter + n_chunk], dtype=self.X.dtype
                )
                (self.stats, self.assignments, self.key, ms) = chunk(
                    self.stats, self.assignments, self.key, ts
                )
                pending.append((time.time(), n_chunk, ts, ms))
                i_iter += n_chunk
            else:
                temp = float(temps[i_iter])
                self.stats, self.assignments, self.key = sweep(
                    self.stats, self.assignments, self.key,
                    np.asarray(temp, dtype=self.X.dtype),
                )
                pending.append(
                    (time.time(), 1, [temp], self.sweep_metrics_device())
                )
                i_iter += 1

        fetched = jax.device_get([m for _, _, _, m in pending])
        prev_t = start
        for (t_disp, n, ts, _), m_fetched in zip(pending, fetched):
            dt = (t_disp - prev_t) / n
            prev_t = t_disp
            for j in range(n):
                m_tuple = (jax.tree.map(lambda a: a[j], m_fetched)
                           if n > 1 else m_fetched)
                m = self.metrics_to_dict(m_tuple)
                record["sample_time"].append(dt)
                record["log_marg"].append(m["log_marg"])
                record["log_prob_z"].append(m["log_prob_z"])
                record["log_prob_X_given_z"].append(m["log_prob_X_given_z"])
                record["anneal_temp"].append(float(ts[j]))
                record["components"].append(m["components"])
        total = time.time() - start
        if record["sample_time"]:
            record["sample_time"][-1] += total - sum(record["sample_time"])
        return record

    def _get_chunk_fn(self, mode: str, consider_unassigned: bool):
        """_SWEEP_CHUNK sweeps + their per-sweep metrics as one jitted scan."""
        cache_key = ("chunk", mode, consider_unassigned, self.K_max)
        if cache_key in self._jit_cache:
            return self._jit_cache[cache_key]
        sweep = self._get_sweep_fn(mode, consider_unassigned)
        cov, prior, alpha, K_max = self.cov, self.prior, self.alpha, self.K_max

        @jax.jit
        def chunk(stats, assignments, key, ts):
            def f(carry, temp):
                stats, assignments, key = carry
                stats, assignments, key = sweep(stats, assignments, key, temp)
                m = (
                    log_prob_z_dirichlet(stats.counts, alpha, K_max),
                    cov.log_marg(prior, stats),
                    num_active(stats),
                    jnp.sum((assignments >= 0).astype(jnp.int32)),
                    jnp.sum(stats.counts),
                )
                return (stats, assignments, key), m

            (stats, assignments, key), ms = jax.lax.scan(
                f, (stats, assignments, key), ts
            )
            return stats, assignments, key, ms

        self._jit_cache[cache_key] = chunk
        return chunk

    def _get_sweep_fn(self, mode: str, consider_unassigned: bool):
        cache_key = (mode, consider_unassigned, self.K_max)
        if cache_key in self._jit_cache:
            return self._jit_cache[cache_key]
        if mode == "sequential":
            fn = self._build_sequential_sweep(consider_unassigned)
        elif mode == "blocked":
            fn = self._build_blocked_sweep(consider_unassigned)
        else:
            raise ValueError("invalid mode: %r" % (mode,))
        self._jit_cache[cache_key] = fn
        return fn

    def _build_sequential_sweep(self, consider_unassigned: bool):
        cov, prior, X = self.cov, self.prior, self.X
        alpha, K_max, lms = self.alpha, self.K_max, self.lms
        log_prior_vec = self.log_prior_vec
        full_cov = cov.FULL_COV

        @jax.jit
        def sweep(stats, assignments, key, anneal_temp):
            key, sweep_key = jax.random.split(key)
            item_keys = jax.random.split(sweep_key, X.shape[0])
            params0 = cov.predictive_params(prior, stats)

            def step(carry, inp):
                stats, params, assignments = carry
                i, k_i = inp
                x = X[i]
                k_old = assignments[i]
                assigned = k_old >= 0
                active = assigned if not consider_unassigned else jnp.bool_(True)

                # Remove x_i from its component (reference fbgmm.py:367).
                rm = (assigned & active).astype(jnp.int32)
                k_old_safe = jnp.maximum(k_old, 0)
                stats = del_item(stats, x, k_old_safe, full_cov=full_cov, weight=rm)
                params = update_row_if(params, stats, k_old_safe)

                # Score all K_max slots (reference fbgmm.py:371-379).
                w = log_weights(stats.counts, alpha, K_max, lms,
                                include_denominator=False, dtype=x.dtype)
                post = cov.log_post_pred(params, x)
                logits = w + jnp.where(stats.counts > 0, post, log_prior_vec[i])

                k_new = rnd.annealed_gumbel_max(k_i, logits, anneal_temp)
                k_new = canonicalize_new_component(stats.counts, k_new)
                k_new = jnp.where(active, k_new, k_old_safe)

                stats = add_item(stats, x, k_new, full_cov=full_cov,
                                 weight=active.astype(jnp.int32))
                params = update_row_if(params, stats, k_new)
                assignments = assignments.at[i].set(
                    jnp.where(active, k_new.astype(jnp.int32), k_old)
                )
                return (stats, params, assignments), None

            def update_row_if(params, stats, k):
                return cov.update_predictive_row(prior, stats, params, k)

            idx = jnp.arange(X.shape[0])
            (stats, _, assignments), _ = jax.lax.scan(
                step, (stats, params0, assignments), (idx, item_keys)
            )
            return stats, assignments, key

        return sweep

    def _build_blocked_sweep(self, consider_unassigned: bool):
        cov, prior, X = self.cov, self.prior, self.X
        alpha, K_max, lms = self.alpha, self.K_max, self.lms
        log_prior_vec = self.log_prior_vec
        full_cov = cov.FULL_COV
        N = X.shape[0]
        decollide = getattr(self, "decollide_new", True)

        @jax.jit
        def sweep(stats, assignments, key, anneal_temp):
            key, sub = jax.random.split(key)
            params = cov.predictive_params(prior, stats)

            # Global scores [N, K] against frozen stats.
            w = log_weights(stats.counts, alpha, K_max, lms,
                            include_denominator=False, dtype=X.dtype)
            post = cov.log_post_pred_batch(params, X)
            logits = w[None, :] + jnp.where(
                (stats.counts > 0)[None, :], post, log_prior_vec[:, None]
            )

            # Leave-one-out correction: only column k_i of row i changes when
            # x_i's own contribution is removed (reference removes the item
            # before scoring, fbgmm.py:367).
            k_i = assignments
            assigned = k_i >= 0
            k_safe = jnp.maximum(k_i, 0)
            cnt_wo = stats.counts[k_safe] - assigned.astype(jnp.int32)

            def _sq(x):
                return x[:, None] * x[None, :] if full_cov else x * x

            def corrected_score(i, k, cnt):
                row = SuffStats(
                    counts=cnt[None],
                    sum_x=(stats.sum_x[k] - X[i])[None],
                    sum_sq=(stats.sum_sq[k] - _sq(X[i]))[None],
                )
                p_row = cov.predictive_params(prior, row)
                pred = cov.log_post_pred(p_row, X[i])[0]
                pred = jnp.where(cnt > 0, pred, log_prior_vec[i])
                w_k = lms * jnp.log(alpha / K_max + cnt.astype(X.dtype))
                return w_k + pred

            corr = jax.vmap(corrected_score)(jnp.arange(N), k_safe, cnt_wo)
            logits = jnp.where(
                assigned[:, None]
                & (jnp.arange(K_max)[None, :] == k_safe[:, None]),
                corr[:, None],
                logits,
            )

            keys = jax.random.split(sub, N)
            k_new = jax.vmap(
                lambda kk, lg: rnd.annealed_gumbel_max(kk, lg, anneal_temp)
            )(keys, logits)

            if decollide:
                # Every simultaneous new-component draw gets its OWN empty
                # slot (exchangeable relabeling; the first-empty birth rule
                # fuses them all into one component under a blocked sweep —
                # see ops.stats.decollide_new_items).
                k_new = decollide_new_items(stats.counts, k_new)
            else:
                # Reference-shaped first-empty birth rule (fbgmm.py:391-393;
                # the sequential mode's semantics, collision-prone here).
                k_new = jax.vmap(
                    lambda k: canonicalize_new_component(stats.counts, k)
                )(k_new)

            keep_old = (~assigned) if not consider_unassigned else jnp.zeros(N, bool)
            new_assignments = jnp.where(keep_old, k_i, k_new.astype(jnp.int32))
            stats = suff_stats_from_assignments(X, new_assignments, K_max, full_cov)
            return stats, new_assignments, key

        return sweep

    # -- reference-style view ------------------------------------------------

    @property
    def components(self):
        """Duck-typed view mimicking ``fbgmm.components`` in the reference."""
        return _ComponentsView(self)


class _ComponentsView:
    """Read-mostly adapter exposing the reference component-store surface."""

    def __init__(self, owner: FBGMM):
        self._o = owner

    @property
    def X(self):
        return self._o.X

    @property
    def N(self):
        return self._o.N

    @property
    def D(self):
        return self._o.D

    @property
    def K(self):
        return self._o.K

    @property
    def K_max(self):
        return self._o.K_max

    @property
    def counts(self):
        return self._o.stats.counts

    @property
    def prior(self):
        """The component prior (reference stores expose ``self.prior``,
        e.g. gaussian_components.py:84)."""
        return self._o.prior

    @property
    def assignments(self):
        return self._o.assignments

    def get_assignments(self, list_of_i):
        ids = np.asarray(list_of_i)
        return np.asarray(self._o.assignments)[ids]

    def log_post_pred(self, i):
        params = self._o.cov.predictive_params(self._o.prior, self._o.stats)
        return self._o.cov.log_post_pred(params, self._o.X[i])

    def log_post_pred_k(self, i, k):
        return self.log_post_pred(i)[k]

    def log_prior(self, i):
        return self._o.log_prior_vec[i]

    def log_marg_k(self, k):
        return self._o.cov.log_marg_k_vec(self._o.prior, self._o.stats)[k]

    def log_marg(self):
        return self._o.cov.log_marg(self._o.prior, self._o.stats)

    def rand_k(self, k):
        """Posterior parameter draw for component ``k`` (reference
        ``rand_k``, gaussian_components.py:291-303)."""
        o = self._o
        return o.cov.rand_k(o._next_key(), o.prior, o.stats, k)

    def map(self, k):
        """MAP parameter estimate for component ``k`` (reference ``map``,
        gaussian_components.py:305-316; fixed-var exposes the predictive
        mean)."""
        o = self._o
        if hasattr(o.cov, "map_k"):
            return o.cov.map_k(o.prior, o.stats, k)
        params = o.cov.predictive_params(o.prior, o.stats)
        return params.mu_pred[k]

    def add_item(self, i, k):
        self._o._add(i, jnp.asarray(k))

    def del_item(self, i):
        self._o.del_item(i)

    def del_component(self, k):
        """Remove component ``k``: unassign its members and zero its
        statistics (reference ``del_component``,
        gaussian_components.py:188-205).  No swap-with-last relabelling --
        slot masking keeps labels stable (ops/stats.py docstring)."""
        o = self._o
        k = int(k)
        o.stats = SuffStats(
            counts=o.stats.counts.at[k].set(0),
            sum_x=o.stats.sum_x.at[k].set(0.0),
            sum_sq=o.stats.sum_sq.at[k].set(0.0),
        )
        o.assignments = jnp.where(o.assignments == k, -1, o.assignments)


def _make_consecutive(assignments: np.ndarray) -> np.ndarray:
    """Relabel assignments to consecutive 0..K-1 (reference fbgmm.py:123-128)."""
    assignments = np.asarray(assignments, dtype=np.int64).copy()
    used = np.unique(assignments[assignments >= 0])
    mapping = {int(old): new for new, old in enumerate(sorted(used))}
    out = np.array([mapping.get(int(a), -1) for a in assignments], dtype=np.int64)
    return out


if __name__ == "__main__":  # smoke demo (reference fbgmm.py:505-546)
    from segmentalist_tpu.demos import demo_fbgmm

    demo_fbgmm()
