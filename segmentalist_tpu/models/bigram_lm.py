"""Smoothed, interpolated maximum-likelihood bigram language model.

TPU-native re-design of the reference ``BigramSmoothLM`` (``bigram_lms.py``):
the count tables live on device as a pytree

    unigram_counts [K] int32
    bigram_counts  [K, K] int32

and all probability queries are pure vectorised functions; per-utterance count
add/remove (reference ``bigram_lms.py:98-114``) become scatter-adds over the
transcript's (prev, cur) pairs.

Because the component slots are never relabelled in this framework (masking
instead of compaction), the reference's LM <-> component-store count tying on
deletion (``gaussian_components_fixedvar.py:204-221``) is unnecessary: LM rows
stay aligned with component slots by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BigramLMState(NamedTuple):
    unigram_counts: jnp.ndarray  # [K] int32
    bigram_counts: jnp.ndarray  # [K, K] int32


# The tighter of two id bounds: (a) ids must fit the key field of
# transcript_pairs_batch's (position << 20) | id packing; (b) the corpus
# log_prob_z replay builds int32 PAIR keys j*K + i (sentinel K*K,
# segmenters/bigram.py), so K*K must fit int32: K <= floor(sqrt(2^31 - 1)).
_K_MAX_LM = min(1 << 20, 46340)


def empty_lm_state(K: int) -> BigramLMState:
    # K is static, so guard once here — every transcript id is < K.
    assert K <= _K_MAX_LM, (
        "bigram LM supports K <= %d (got %d): int32 pair keys j*K+i in the "
        "log_prob_z replay overflow past that" % (_K_MAX_LM, K))
    return BigramLMState(
        unigram_counts=jnp.zeros((K,), jnp.int32),
        bigram_counts=jnp.zeros((K, K), jnp.int32),
    )


def log_prob_vec_i(state: BigramLMState, a, K: int, dtype=jnp.float32):
    """[K] log unigram probabilities (reference ``log_prob_vec_i``,
    bigram_lms.py:64-69)."""
    c = state.unigram_counts.astype(dtype)
    return jnp.log(c + a / K) - jnp.log(jnp.sum(c) + a)


def prob_vec_i(state: BigramLMState, a, K: int, dtype=jnp.float32):
    c = state.unigram_counts.astype(dtype)
    return (c + a / K) / (jnp.sum(c) + a)


def prob_vec_given_j(state: BigramLMState, j, intrp_lambda, a, b, K: int,
                     dtype=jnp.float32):
    """[K] conditional bigram probabilities given previous component ``j``
    (reference ``prob_vec_given_j``, bigram_lms.py:84-91)."""
    uni = prob_vec_i(state, a, K, dtype)
    row = state.bigram_counts[j].astype(dtype)
    cj = state.unigram_counts[j].astype(dtype)
    big = (row + b / K) / (cj + b)
    return intrp_lambda * uni + (1.0 - intrp_lambda) * big


def transcript_pairs(transcript: jnp.ndarray):
    """(prev, cur) index pairs of a padded transcript ([S] int32, -1 pads;
    -1 entries are skipped, carrying the previous context over them, exactly
    like the reference's `continue` in the assignment loop
    (bigram_acoustic_wordseg.py:483-486)."""

    def step(j_prev, cur):
        ok = cur >= 0
        pair_j = jnp.where(ok, j_prev, -1)
        j_next = jnp.where(ok, cur, j_prev)
        return j_next, (pair_j, jnp.where(ok, cur, -1))

    _, (pj, pi) = jax.lax.scan(step, jnp.int32(-1), transcript)
    return pj, pi  # pair valid where pj >= 0 and pi >= 0


_PAIR_KEY_BITS = 20  # component ids < 2^20; positions < 2^11 (int32 safe)


def transcript_pairs_batch(transcripts: jnp.ndarray,
                           return_prev_pos: bool = False):
    """Batched, fully parallel ``transcript_pairs``: forward-fill the last
    valid component via ONE cumulative max over ``(position << 20) | key``
    encodings (monotone in position, so the max is the latest valid key; no
    gather needed to recover it).

    transcripts [B, S] int32 (-1 pads) -> (pj, pi) each [B, S]; with
    ``return_prev_pos`` also the previous valid POSITION per slot ([B, S],
    -1 where none), decoded from the same encoding — callers that need it
    (the LM-replay metric) must not re-derive it with a second cummax.
    """
    B, S = transcripts.shape
    assert S < (1 << (31 - _PAIR_KEY_BITS))
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = transcripts >= 0
    enc = jnp.where(
        valid, (pos << _PAIR_KEY_BITS) | transcripts, jnp.int32(-1)
    )
    inc = jax.lax.cummax(enc, axis=1)
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, inc.dtype), inc[:, :-1]], axis=1
    )
    pj = jnp.where(
        (prev >= 0) & valid, prev & ((1 << _PAIR_KEY_BITS) - 1), -1
    )
    pi = jnp.where(valid, transcripts, -1)
    if return_prev_pos:
        prev_pos = jnp.where(prev >= 0, prev >> _PAIR_KEY_BITS, -1)
        return pj, pi, prev_pos
    return pj, pi


def add_block_counts(state: BigramLMState, transcripts: jnp.ndarray,
                     valid: jnp.ndarray, sign: int = 1) -> BigramLMState:
    """Add/remove a whole block of utterance transcripts in two scatter-adds
    (counts are additive, so no per-utterance sequencing is needed)."""
    K = state.unigram_counts.shape[0]
    cur_valid = (transcripts >= 0) & valid[:, None]
    uni_idx = jnp.where(cur_valid, transcripts, K).reshape(-1)
    uni = state.unigram_counts.at[uni_idx].add(
        jnp.where(cur_valid, sign, 0).astype(jnp.int32).reshape(-1),
        mode="drop",
    )
    pj, pi = transcript_pairs_batch(transcripts)
    pair_valid = (pj >= 0) & (pi >= 0) & valid[:, None]
    bj = jnp.where(pair_valid, pj, K).reshape(-1)
    bi = jnp.where(pair_valid, pi, K).reshape(-1)
    big = state.bigram_counts.at[bj, bi].add(
        jnp.where(pair_valid, sign, 0).astype(jnp.int32).reshape(-1),
        mode="drop",
    )
    return BigramLMState(unigram_counts=uni, bigram_counts=big)


def block_count_delta(old_ks: jnp.ndarray, new_ks: jnp.ndarray,
                      valid: jnp.ndarray, K: int,
                      pairs_old=None) -> BigramLMState:
    """Signed LM count delta for a block swap (remove ``old_ks``, add
    ``new_ks``) with NO scatter-adds: the bigram-table delta rides one
    sign-weighted one-hot MXU matmul and the unigram delta one matvec.
    One-hot/sign values (0, +-1) are bf16-exact and the MXU accumulates in
    f32, so the default-precision matmul is integer-exact for |counts| <
    2**24 — unlike one-hot pulls of *float* tables, which need HIGHEST.

    Replaces four serialized scatter-adds per block (TPU scatters are
    latency-bound; measured ~2.2 ms/sweep of the bigram driver's overhead
    at benchmark scale).  ``pairs_old`` lets the caller reuse the block
    step's already-computed ``transcript_pairs_batch(old_ks)``.
    """
    if pairs_old is None:
        pairs_old = transcript_pairs_batch(old_ks)
    pj_o, pi_o = pairs_old
    pj_n, pi_n = transcript_pairs_batch(new_ks)
    B, S = old_ks.shape
    vm = jnp.broadcast_to(valid[:, None], (B, S))

    ts = jnp.concatenate([old_ks, new_ks], axis=0).reshape(-1)
    pj = jnp.concatenate([pj_o, pj_n], axis=0).reshape(-1)
    pi = jnp.concatenate([pi_o, pi_n], axis=0).reshape(-1)
    vs = jnp.concatenate([vm, vm], axis=0).reshape(-1)
    sign = jnp.concatenate(
        [jnp.full((B, S), -1.0, jnp.bfloat16),
         jnp.full((B, S), 1.0, jnp.bfloat16)], axis=0
    ).reshape(-1)

    cur_valid = (ts >= 0) & vs
    pair_valid = (pj >= 0) & (pi >= 0) & vs
    iota = jnp.arange(K, dtype=jnp.int32)

    oh_cur = jnp.where(cur_valid[:, None], (ts[:, None] == iota[None, :])
                       .astype(jnp.bfloat16), jnp.bfloat16(0))
    uni = jax.lax.dot_general(
        sign[None, :], oh_cur, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]

    oh_j = jnp.where(pair_valid[:, None], (pj[:, None] == iota[None, :])
                     .astype(jnp.bfloat16), jnp.bfloat16(0))
    oh_i = (pi[:, None] == iota[None, :]).astype(jnp.bfloat16)
    big = jax.lax.dot_general(
        oh_j * sign[:, None], oh_i, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return BigramLMState(unigram_counts=uni.astype(jnp.int32),
                         bigram_counts=big.astype(jnp.int32))


def add_transcript_counts(state: BigramLMState, transcript: jnp.ndarray,
                          sign: int = 1) -> BigramLMState:
    """Add (sign=+1) / remove (sign=-1) one utterance's counts
    (reference ``counts_from_utterance`` / ``remove_counts_from_utterance``,
    bigram_lms.py:98-114)."""
    K = state.unigram_counts.shape[0]
    cur_valid = transcript >= 0
    uni_idx = jnp.where(cur_valid, transcript, K)
    uni = state.unigram_counts.at[uni_idx].add(
        jnp.where(cur_valid, sign, 0).astype(jnp.int32), mode="drop"
    )
    pj, pi = transcript_pairs(transcript)
    pair_valid = (pj >= 0) & (pi >= 0)
    bj = jnp.where(pair_valid, pj, K)
    bi = jnp.where(pair_valid, pi, K)
    big = state.bigram_counts.at[bj, bi].add(
        jnp.where(pair_valid, sign, 0).astype(jnp.int32), mode="drop"
    )
    return BigramLMState(unigram_counts=uni, bigram_counts=big)


class BigramSmoothLM:
    """Reference-parity class wrapper (``BigramSmoothLM``, bigram_lms.py:17-114)."""

    def __init__(self, intrp_lambda, a, b, K):
        self.intrp_lambda = float(intrp_lambda)
        self.a = float(a)
        self.b = float(b)
        self.K = int(K)
        self.state = empty_lm_state(self.K)

    # numpy-visible count tables (reference exposes raw arrays)
    @property
    def unigram_counts(self):
        return np.asarray(self.state.unigram_counts)

    @property
    def bigram_counts(self):
        return np.asarray(self.state.bigram_counts)

    def prob_i(self, i):
        return float(prob_vec_i(self.state, self.a, self.K, jnp.float64)[i])

    def prob_i_given_j(self, i, j):
        return float(
            prob_vec_given_j(self.state, j, self.intrp_lambda, self.a, self.b,
                             self.K, jnp.float64)[i]
        )

    def log_prob_vec_i(self):
        return np.asarray(log_prob_vec_i(self.state, self.a, self.K, jnp.float64))

    def prob_vec_i(self):
        return np.asarray(prob_vec_i(self.state, self.a, self.K, jnp.float64))

    def log_prob_vec_given_j(self, j):
        return np.log(self.prob_vec_given_j(j))

    def prob_vec_given_j(self, j):
        return np.asarray(
            prob_vec_given_j(self.state, j, self.intrp_lambda, self.a, self.b,
                             self.K, jnp.float64)
        )

    def counts_from_data(self, data):
        for utterance in data:
            self.counts_from_utterance(utterance)

    def counts_from_utterance(self, utterance):
        t = jnp.asarray(np.asarray(list(utterance), dtype=np.int32))
        self.state = add_transcript_counts(self.state, t, sign=1)

    def remove_counts_from_utterance(self, utterance):
        t = jnp.asarray(np.asarray(list(utterance), dtype=np.int32))
        self.state = add_transcript_counts(self.state, t, sign=-1)


if __name__ == "__main__":  # smoke demo (reference bigram_lms.py:117-156)
    from segmentalist_tpu.demos import demo_bigram_lm

    demo_bigram_lm()
