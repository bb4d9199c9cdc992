"""Tracing / profiling hooks (SURVEY.md section 5.1).

The reference's only profiling machinery is commented-out ``@profile``
line-profiler decorators and hand-rolled ``time.time()`` deltas recorded as
``record_dict["sample_time"]``.  The TPU-native equivalents:

* ``trace(logdir)`` -- context manager around :func:`jax.profiler.trace`;
  view the result with TensorBoard or xprof.  Wrap any ``gibbs_sample`` /
  ``segment`` call to capture per-kernel device timelines.
* ``annotate(name)`` -- :class:`jax.profiler.TraceAnnotation` wrapper so
  host-side phases show up as named spans inside the trace.
* ``device_timer(fn)`` -- measure the *device* time of a jitted callable by
  synchronising before/after (one-off measurement; do not use inside the
  async sampling loops, where a sync costs an RPC round-trip).

Per-sweep wall times continue to be recorded in ``record_dict`` by every
driver (reference parity, ``fbgmm.py:325, :406``).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device/host profile of the enclosed block into ``logdir``."""
    with jax.profiler.trace(logdir, create_perfetto_link=create_perfetto_link):
        yield


def annotate(name: str):
    """Named span inside a profiler trace (host-side annotation)."""
    return jax.profiler.TraceAnnotation(name)


def device_timer(fn, *args, n_iter: int = 10, **kwargs):
    """(result, seconds_per_call) for a jitted callable, measured with a
    single sync after ``n_iter`` pipelined calls."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_iter):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, (time.time() - t0) / n_iter
