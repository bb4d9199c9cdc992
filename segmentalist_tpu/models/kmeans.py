"""K-means model (TPU-native re-design of ``kmeans.py`` + ``kmeans_components.py``).

The reference's ``KMeansComponents`` mutates per-component ``mean_numerators``
and ``counts`` item by item; here the state is a flat pytree and the batch
``fit`` step is one [N, K] distance kernel (a matmul on the MXU) followed by a
segment-sum rebuild.  Empty components implicitly take a random data vector as
their mean (reference ``kmeans_components.py:90-91, :166``), reproduced with a
``random_means`` tensor drawn once at construction.
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class KMeansState(NamedTuple):
    assignments: jnp.ndarray  # [N] int32, -1 = unassigned
    counts: jnp.ndarray  # [K] int32
    sum_x: jnp.ndarray  # [K, D]


def kmeans_state_from_assignments(X, assignments, K_max: int) -> KMeansState:
    seg = jnp.where(assignments < 0, K_max, assignments)
    counts = jax.ops.segment_sum(
        jnp.ones(X.shape[0], jnp.int32), seg, num_segments=K_max + 1
    )[:-1]
    sum_x = jax.ops.segment_sum(X, seg, num_segments=K_max + 1)[:-1]
    return KMeansState(assignments=assignments.astype(jnp.int32),
                       counts=counts, sum_x=sum_x)


def means_from_state(state: KMeansState, random_means: jnp.ndarray) -> jnp.ndarray:
    """[K, D] component means; empty slots fall back to their random mean
    (reference ``kmeans_components.py:90-91, :166, :225``)."""
    c = jnp.maximum(state.counts, 1).astype(state.sum_x.dtype)[:, None]
    means = state.sum_x / c
    return jnp.where((state.counts > 0)[:, None], means, random_means)


def neg_sqrd_norms(X: jnp.ndarray, means: jnp.ndarray) -> jnp.ndarray:
    """[M, K] negative squared distances, in matmul form for the MXU
    (reference ``neg_sqrd_norm``, kmeans_components.py:169-226)."""
    x_sq = jnp.sum(X * X, axis=-1)  # [M]
    m_sq = jnp.sum(means * means, axis=-1)  # [K]
    cross = X @ means.T  # [M, K]
    return -(x_sq[:, None] - 2.0 * cross + m_sq[None, :])


def sum_neg_sqrd_norm(X, state: KMeansState, random_means) -> jnp.ndarray:
    """K-means objective over assigned items
    (reference ``sum_neg_sqrd_norm``, kmeans_components.py:234-247)."""
    means = means_from_state(state, random_means)
    assigned = state.assignments >= 0
    mu = means[jnp.maximum(state.assignments, 0)]
    d = X - mu
    per_item = -jnp.sum(d * d, axis=-1)
    return jnp.sum(jnp.where(assigned, per_item, 0.0))


class KMeans:
    """Batch k-means with the reference's API (``kmeans.py:26-177``)."""

    def __init__(self, X, K, assignments="rand",
                 rng: Optional[np.random.RandomState] = None):
        self.X = jnp.asarray(X)
        self.N, self.D = self.X.shape
        self.rng = rng
        self.setup_components(K, assignments, self.X)

    def setup_components(self, K, assignments="rand", X=None):
        if X is not None:
            self.X = jnp.asarray(X)
            self.N, self.D = self.X.shape
        self.K_max = int(K)
        rand = self.rng if self.rng is not None else np.random

        if isinstance(assignments, str) and assignments == "rand":
            assignments = rand.randint(0, self.K_max, self.N)
        elif isinstance(assignments, str) and assignments == "each-in-own":
            assignments = np.arange(self.N)
        elif isinstance(assignments, str) and assignments == "spread":
            # (reference kmeans.py:79-82)
            lst = (list(range(self.K_max))
                   * int(np.ceil(float(self.N) / self.K_max)))[: self.N]
            rand.shuffle(lst)
            assignments = np.array(lst)
        assignments = np.asarray(assignments, dtype=np.int64)
        assert assignments.max(initial=-1) < self.K_max

        # Random fallback means, drawn once (kmeans_components.py:90-91).
        choice = rand.randint(0, self.N, self.K_max)
        self.random_means = self.X[jnp.asarray(choice)]
        self.state = kmeans_state_from_assignments(
            self.X, jnp.asarray(assignments, jnp.int32), self.K_max
        )
        self._fit_step = None
        self._metrics_fn = None

    # ----------------------------------------------------------------- query

    @property
    def K(self) -> int:
        return int(jnp.sum((self.state.counts > 0).astype(jnp.int32)))

    @property
    def assignments(self):
        return self.state.assignments

    def means(self):
        return means_from_state(self.state, self.random_means)

    def get_n_assigned(self) -> int:
        return int(jnp.sum(self.state.assignments >= 0))

    def neg_sqrd_norm(self, i: int):
        return neg_sqrd_norms(self.X[i : i + 1], self.means())[0]

    def max_neg_sqrd_norm_i(self, i: int) -> float:
        return float(jnp.max(self.neg_sqrd_norm(i)))

    def argmax_neg_sqrd_norm_i(self, i: int) -> int:
        return int(jnp.argmax(self.neg_sqrd_norm(i)))

    def get_max_assignments(self, list_of_i):
        ids = jnp.asarray(np.asarray(list_of_i, dtype=np.int64))
        return list(
            np.asarray(jnp.argmax(neg_sqrd_norms(self.X[ids], self.means()), axis=-1))
        )

    def get_assignments(self, list_of_i):
        return np.asarray(self.state.assignments)[np.asarray(list_of_i)]

    def sum_neg_sqrd_norm(self) -> float:
        return float(sum_neg_sqrd_norm(self.X, self.state, self.random_means))

    def sweep_metrics_device(self):
        """Enqueue (objective, active K, n_assigned) as one fused device call
        (async record-loop counterpart of ``FBGMM.sweep_metrics_device``)."""
        if not hasattr(self, "_metrics_fn") or self._metrics_fn is None:
            X = self.X

            @jax.jit
            def metrics(state, random_means):
                return (
                    sum_neg_sqrd_norm(X, state, random_means),
                    jnp.sum((state.counts > 0).astype(jnp.int32)),
                    jnp.sum((state.assignments >= 0).astype(jnp.int32)),
                )

            self._metrics_fn = metrics
        return self._metrics_fn(self.state, self.random_means)

    # ------------------------------------------------------------------- fit

    def fit(self, n_iter: int, consider_unassigned: bool = True,
            no_empty: bool = True) -> dict:
        """Batch k-means iterations with deferred mean updates and early stop
        (reference ``fit``, kmeans.py:97-173)."""
        record = {k: [] for k in (
            "sum_neg_sqrd_norm", "components", "n_mean_updates", "sample_time")}
        step = self._get_fit_step(consider_unassigned)
        start = time.time()
        for _ in range(n_iter):
            self.state, n_updates = step(self.state, self.random_means)
            n_updates = int(n_updates)
            record["sum_neg_sqrd_norm"].append(self.sum_neg_sqrd_norm())
            record["components"].append(self.K)
            record["n_mean_updates"].append(n_updates)
            record["sample_time"].append(time.time() - start)
            start = time.time()
            if n_updates == 0:
                break
        return record

    def _get_fit_step(self, consider_unassigned: bool):
        if self._fit_step is not None and self._fit_flag == consider_unassigned:
            return self._fit_step
        X, K_max = self.X, self.K_max

        @jax.jit
        def step(state, random_means):
            means = means_from_state(state, random_means)
            scores = neg_sqrd_norms(X, means)  # [N, K]
            new = jnp.argmax(scores, axis=-1).astype(jnp.int32)
            if not consider_unassigned:
                new = jnp.where(state.assignments < 0, state.assignments, new)
            n_updates = jnp.sum((new != state.assignments).astype(jnp.int32))
            return kmeans_state_from_assignments(X, new, K_max), n_updates

        self._fit_step = step
        self._fit_flag = consider_unassigned
        return step

    # ------------------------------------------------- reference-style view

    @property
    def components(self):
        return _KMeansComponentsView(self)


class _KMeansComponentsView:
    def __init__(self, owner: KMeans):
        self._o = owner

    @property
    def X(self):
        return self._o.X

    @property
    def K(self):
        return self._o.K

    @property
    def K_max(self):
        return self._o.K_max

    @property
    def counts(self):
        return self._o.state.counts

    @property
    def assignments(self):
        return self._o.state.assignments

    @property
    def means(self):
        return self._o.means()

    @property
    def mean_numerators(self):
        return self._o.state.sum_x

    def neg_sqrd_norm(self, i):
        return self._o.neg_sqrd_norm(i)

    def max_neg_sqrd_norm_i(self, i):
        return self._o.max_neg_sqrd_norm_i(i)

    def argmax_neg_sqrd_norm_i(self, i):
        return self._o.argmax_neg_sqrd_norm_i(i)

    def sum_neg_sqrd_norm(self):
        return self._o.sum_neg_sqrd_norm()

    def get_assignments(self, list_of_i):
        return self._o.get_assignments(list_of_i)

    def get_max_assignments(self, list_of_i):
        return self._o.get_max_assignments(list_of_i)

    @property
    def random_means(self):
        return self._o.random_means

    def setup_random_means(self):
        """Redraw the empty-slot fallback means from the data (reference
        ``setup_random_means``, kmeans_components.py:90-91)."""
        o = self._o
        rand = o.rng if o.rng is not None else np.random
        choice = rand.randint(0, o.N, o.K_max)
        o.random_means = o.X[jnp.asarray(choice)]

    def add_item(self, i: int, k: int):
        """Assign ``X[i]`` to slot ``k`` (reference ``add_item``,
        kmeans_components.py:93-111).  Slot-masked design: component labels
        are stable, so the reference's "k >= K means a NEW component" maps
        to the FIRST EMPTY slot (the same canonicalisation as the chain
        kernels' new-component handling), never silently into an occupied
        one."""
        o = self._o
        st = o.state
        k = int(k)
        if k < 0 or k >= o.K_max:
            empty = np.flatnonzero(np.asarray(st.counts) == 0)
            assert empty.size, "add_item: new component requested, no empty slot"
            k = int(empty[0])
        assert int(st.assignments[i]) == -1
        o.state = KMeansState(
            assignments=st.assignments.at[i].set(k),
            counts=st.counts.at[k].add(1),
            sum_x=st.sum_x.at[k].add(o.X[i]),
        )

    def del_item(self, i: int):
        """Remove ``X[i]`` from its component (reference ``del_item``,
        kmeans_components.py:113-147, without the ``no_empty``
        re-initialisation — empty slots fall back to ``random_means``)."""
        o = self._o
        st = o.state
        k = int(st.assignments[i])
        if k < 0:
            return
        o.state = KMeansState(
            assignments=st.assignments.at[i].set(-1),
            counts=st.counts.at[k].add(-1),
            sum_x=st.sum_x.at[k].add(-o.X[i]),
        )

    def del_component(self, k: int):
        """Remove component ``k``: unassign its members and zero its
        statistics (reference ``del_component``,
        kmeans_components.py:149-166).  No swap-with-last relabelling —
        slot masking keeps labels stable (ops/stats.py docstring)."""
        o = self._o
        st = o.state
        members = st.assignments == k
        o.state = KMeansState(
            assignments=jnp.where(members, -1, st.assignments),
            counts=st.counts.at[k].set(0),
            sum_x=st.sum_x.at[k].set(0.0),
        )

    def clean_components(self):
        # Masked design: empty components are already "clean" (no relabelling).
        pass


if __name__ == "__main__":  # smoke demo (reference kmeans.py:176-217, kmeans_components.py:274-324)
    from segmentalist_tpu.demos import demo_kmeans

    demo_kmeans()
