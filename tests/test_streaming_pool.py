"""Batched multi-stream streaming (streaming.StreamingPool): per-stream
output must be EXACTLY the single-stream greedy transcriber's, with all
streams sharing one static [max_streams, window] forward."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_av_model_tpu.models import AudioOnlyCTC
from multimodal_av_model_tpu.streaming import (
    StreamingAudioTranscriber, StreamingPool,
)
from multimodal_av_model_tpu.text import CharTokenizer
from test_models import tiny_config

VOCAB = os.path.join(os.path.dirname(__file__), "..", "assets", "tokenizer800.vocab")
CHUNK_S, CTX_S = 0.25, 0.5


@pytest.fixture(scope="module")
def setup():
    tok = CharTokenizer(VOCAB)
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    pool = StreamingPool(cfg, tok, None, max_streams=4,
                         chunk_seconds=CHUNK_S, context_seconds=CTX_S,
                         dtype=jnp.float32)
    model = AudioOnlyCTC(cfg.model, dtype=jnp.float32)
    pool.variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, pool._window), jnp.float32),
        jnp.ones((1, pool._window), bool))
    return tok, cfg, pool


def _single_stream_text(cfg, tok, variables, audio, block):
    s = StreamingAudioTranscriber(cfg, tok, variables, dtype=jnp.float32,
                                  chunk_seconds=CHUNK_S, context_seconds=CTX_S,
                                  algorithm="greedy")
    out = "".join(s.feed(audio[i : i + block])
                  for i in range(0, len(audio), block))
    return out + s.flush()


def test_pool_matches_single_stream_greedy(setup):
    """3 concurrent streams with different audio and different feed block
    sizes transcribe exactly as 3 independent single-stream runners."""
    tok, cfg, pool = setup
    rng = np.random.default_rng(0)
    n = 3
    lengths = (9000, 6500, 12000)
    blocks = (700, 1100, 2500)
    audios = [(rng.standard_normal(L) * 0.3).astype(np.float32)
              for L in lengths]

    sids = [pool.open() for _ in range(n)]
    texts = [""] * n
    for step in range(max(L // b + 1 for L, b in zip(lengths, blocks))):
        for i, sid in enumerate(sids):
            lo = step * blocks[i]
            if lo < lengths[i]:
                texts[i] += pool.feed(sid, audios[i][lo : lo + blocks[i]])
    for i, sid in enumerate(sids):
        texts[i] += pool.flush(sid)

    for i in range(n):
        want = _single_stream_text(cfg, tok, pool.variables, audios[i],
                                   blocks[i])
        assert texts[i] == want, f"stream {i}: {texts[i]!r} != {want!r}"


def test_pool_slot_lifecycle(setup):
    tok, cfg, pool = setup
    free_before = pool.max_streams - pool.active_streams
    sids = [pool.open() for _ in range(free_before)]
    with pytest.raises(RuntimeError):
        pool.open()
    pool.flush(sids[0])                       # flush frees the slot
    again = pool.open()
    assert again == sids[0]
    for sid in [again] + sids[1:]:
        pool.close(sid)


def test_pool_text_accumulates(setup):
    tok, cfg, pool = setup
    rng = np.random.default_rng(1)
    sid = pool.open()
    audio = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    emitted = pool.feed(sid, audio) + pool.flush(sid)
    # char tokenizer: decode of the accumulated ids == concatenated emissions
    assert pool.text(sid) == emitted
