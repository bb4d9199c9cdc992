"""Observability + opt-in validation for the samplers.

Re-creations of the reference's two debug mechanisms (SURVEY.md section 5.5):

* ``i_debug_monitor`` deep traces (``unigram_acoustic_wordseg.py:19-20,
  :262-307``; ``bigram_acoustic_wordseg.py:24, :400-407``): pass
  ``monitor_i=<utterance index>`` to ``gibbs_sample``/``segment`` and the
  driver logs, per sweep, that utterance's candidate scores, chosen
  boundaries, and transcript at DEBUG level.  The quantities are the exact
  leave-one-utterance-out scores the sweep uses, computed post-sweep so the
  sampling loop stays fully asynchronous (the reference prints them inline,
  mid-update; the distribution is the same).

* NaN-guard asserts on sampling distributions (``fbgmm.py:453``,
  ``unigram_acoustic_wordseg.py:717-754``, ``bigram_acoustic_wordseg.py:368``):
  pass ``validate=True`` and each sweep enqueues a device-side invariant
  check (all statistics finite, counts non-negative and consistent with the
  assignment vector, every utterance's final boundary set).  Violations
  raise ``ValidationError`` after the batched fetch, naming the sweep and
  the failed invariant.  This is the jit-compatible equivalent of the
  reference's inline ``assert not np.isnan(...)``.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np


class ValidationError(AssertionError):
    """A sampler invariant was violated (see ``validate=True``)."""


FBGMM_CHECKS = (
    "non-finite component sum_x",
    "non-finite component sum_sq",
    "negative component count",
    "count/assignment-vector mismatch",
    "missing final utterance boundary",
)


def fbgmm_validation_flags(stats, assignments, boundaries, lengths):
    """[5] bool vector of sampler invariants (True = OK); jit-friendly."""
    B = boundaries.shape[0]
    last = boundaries[jnp.arange(B), jnp.maximum(lengths - 1, 0)]
    return jnp.stack([
        jnp.all(jnp.isfinite(stats.sum_x)),
        jnp.all(jnp.isfinite(stats.sum_sq)),
        jnp.all(stats.counts >= 0),
        jnp.sum(stats.counts) == jnp.sum(assignments >= 0),
        jnp.all(last | (lengths <= 0)),
    ])


BIGRAM_CHECKS = FBGMM_CHECKS + ("negative LM count",)


def bigram_validation_flags(stats, assignments, boundaries, lengths,
                            lm_state):
    lm_ok = jnp.all(lm_state.unigram_counts >= 0) & jnp.all(
        lm_state.bigram_counts >= 0
    )
    return jnp.concatenate([
        fbgmm_validation_flags(stats, assignments, boundaries, lengths),
        lm_ok[None],
    ])


KMEANS_CHECKS = (
    "non-finite component sum_x",
    "negative component count",
    "count/assignment-vector mismatch",
    "missing final utterance boundary",
)


def kmeans_validation_flags(state, boundaries, lengths):
    B = boundaries.shape[0]
    last = boundaries[jnp.arange(B), jnp.maximum(lengths - 1, 0)]
    return jnp.stack([
        jnp.all(jnp.isfinite(state.sum_x)),
        jnp.all(state.counts >= 0),
        jnp.sum(state.counts) == jnp.sum(state.assignments >= 0),
        jnp.all(last | (lengths <= 0)),
    ])


def check_validation(fetched_flags, check_names):
    """Raise ValidationError naming the first violated invariant."""
    for i_iter, flags in enumerate(fetched_flags):
        flags = np.asarray(flags)
        if not flags.all():
            bad = [n for n, ok in zip(check_names, flags) if not ok]
            raise ValidationError(
                "sampler invariant violated at iteration %d: %s"
                % (i_iter, ", ".join(bad))
            )


def log_monitor(logger: logging.Logger, monitor_i: int, fetched):
    """DEBUG-log one monitored utterance's per-sweep trace
    (reference ``i_debug_monitor`` output format, loosely:
    unigram_acoustic_wordseg.py:262-307)."""
    for i_iter, (scores, bounds, transcript) in enumerate(fetched):
        scores = np.asarray(scores)
        transcript = np.asarray(transcript)
        logger.debug(
            "monitor utterance %d, iteration %d: boundaries=%s, "
            "transcript=%s",
            monitor_i, i_iter,
            np.asarray(bounds).astype(int).tolist(),
            transcript[transcript >= -1].tolist(),
        )
        logger.debug(
            "monitor utterance %d, iteration %d: candidate scores "
            "(end x width, -inf masked):\n%s",
            monitor_i, i_iter, np.array2string(scores, precision=3),
        )
