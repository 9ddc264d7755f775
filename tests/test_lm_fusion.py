"""Bigram LM training + shallow fusion in the on-device prefix beam.

The reference decoder has no language model at all (reference
beam_search.py:2-42 ranks on acoustic scores only); fusion is a
beyond-parity serving capability."""

import numpy as np

import jax.numpy as jnp
import pytest

from multimodal_av_model_tpu.ops.prefix_beam_search import prefix_beam_search_decode
from multimodal_av_model_tpu.text.ngram_lm import (
    load_bigram_lm,
    save_bigram_lm,
    sequence_logprob,
    train_bigram_lm,
)


def test_bigram_lm_rows_normalize_and_learn_counts():
    V = 5
    lm = train_bigram_lm([[0, 1, 2], [0, 1, 1]], V, add_k=0.1)
    assert lm.shape == (V + 1, V)
    # Each context row is a distribution.
    np.testing.assert_allclose(np.exp(lm).sum(axis=1), 1.0, rtol=1e-5)
    # After 0 the corpus always has 1; P(1|0) must dominate.
    assert lm[0].argmax() == 1
    # BOS row: both sentences start with 0.
    assert lm[V].argmax() == 0
    # A seen sequence scores higher than an unseen permutation.
    assert sequence_logprob(lm, [0, 1, 2]) > sequence_logprob(lm, [2, 0, 1])


def test_bigram_lm_save_load_round_trip(tmp_path):
    lm = train_bigram_lm([[0, 1]], 3)
    p = str(tmp_path / "lm.npy")
    save_bigram_lm(p, lm)
    np.testing.assert_array_equal(load_bigram_lm(p), lm)
    with pytest.raises(ValueError):
        save_bigram_lm(p, np.zeros((3, 3), np.float32))
        load_bigram_lm(p)


def _two_way_logits():
    """Frames where tokens 0 and 1 are acoustically EQUAL; blank=2.

    Without an LM the decoder's choice between transcripts [0] and [1] is a
    tie (broken by candidate order); an LM preferring 1 must flip it.
    """
    T, V = 4, 3
    lp = np.full((T, V), np.log(1e-8), np.float32)
    lp[:, 0] = np.log(0.3)
    lp[:, 1] = np.log(0.3)
    lp[:, 2] = np.log(0.4)
    return jnp.asarray(lp[None]), jnp.asarray([T])


def test_fusion_zero_weight_matches_no_lm():
    lp, n = _two_way_logits()
    base = prefix_beam_search_decode(lp, n, beam_width=4, top_k=3, blank_id=2)
    lm = jnp.zeros((4, 3), jnp.float32)        # uniform-ish table
    fused = prefix_beam_search_decode(lp, n, beam_width=4, top_k=3, blank_id=2,
                                      lm=lm, lm_weight=0.0, length_bonus=0.0)
    for a, b in zip(base, fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fusion_lm_flips_acoustic_tie():
    lp, n = _two_way_logits()
    # LM that strongly prefers token 1 from any context.
    lm = train_bigram_lm([[1, 1, 1, 1]] * 50, 3, add_k=0.01)
    ids, out_len, _ = prefix_beam_search_decode(
        lp, n, beam_width=4, top_k=3, blank_id=2,
        lm=jnp.asarray(lm), lm_weight=1.0)
    ids = np.asarray(ids)[0][: int(out_len[0])].tolist()
    assert 1 in ids and 0 not in ids
    # And the opposite LM prefers 0.
    lm0 = train_bigram_lm([[0, 0, 0, 0]] * 50, 3, add_k=0.01)
    ids0, len0, _ = prefix_beam_search_decode(
        lp, n, beam_width=4, top_k=3, blank_id=2,
        lm=jnp.asarray(lm0), lm_weight=1.0)
    ids0 = np.asarray(ids0)[0][: int(len0[0])].tolist()
    assert 0 in ids0 and 1 not in ids0


def test_length_bonus_encourages_emission():
    # Blank-heavy frames: without a bonus the best transcript is empty.
    T, V = 6, 3
    lp = np.full((T, V), np.log(1e-9), np.float32)
    lp[:, 0] = np.log(0.25)
    lp[:, 1] = np.log(0.05)
    lp[:, 2] = np.log(0.70)
    lpj, n = jnp.asarray(lp[None]), jnp.asarray([T])
    lm = jnp.zeros((V + 1, V), jnp.float32)
    _, len_plain, _ = prefix_beam_search_decode(lpj, n, beam_width=4, top_k=3,
                                                blank_id=2)
    _, len_bonus, _ = prefix_beam_search_decode(lpj, n, beam_width=4, top_k=3,
                                                blank_id=2, lm=lm,
                                                lm_weight=0.0, length_bonus=3.0)
    assert int(len_bonus[0]) > int(len_plain[0])


def test_markov_structured_source_uses_chain():
    from multimodal_av_model_tpu.data.structured import StructuredPairSource

    class Tok:
        vocab_size = 800

    src = StructuredPairSource(Tok(), seed=0, markov=True)
    seqs = [src.one_utterance()[2] - 5 for _ in range(200)]
    n = len(src.token_ids)
    counts = np.zeros((n, n))
    for s in seqs:
        for a, b in zip(s[:-1], s[1:]):
            counts[a, b] += 1
    # Each row's top-3 successors should hold most of the mass (0.9 by
    # construction vs 0.1 spread uniformly).
    rows = counts.sum(axis=1) > 20
    top3 = np.sort(counts[rows], axis=1)[:, -3:].sum(axis=1)
    frac = top3 / counts[rows].sum(axis=1)
    assert (frac > 0.6).all()
    # Uniform mode has no such concentration.
    src_u = StructuredPairSource(Tok(), seed=0)
    assert src_u.transition is None
