"""Streaming transcription: exact chunk-boundary semantics + real-model smoke.

The core claim of ``streaming.StreamingAudioTranscriber`` is that its greedy
CTC emission is an EXACT streaming algorithm: for a frame-local model, the
streamed token sequence equals the offline collapse of the full utterance,
regardless of how the audio is split into feed() blocks.  That is tested
against a synthetic frame-local forward (logits depend only on each frame's
anchor sample), which isolates the alignment/carry logic from encoder
context truncation (the documented streaming approximation).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from multimodal_av_model_tpu.config import Config  # noqa: E402
from multimodal_av_model_tpu.streaming import StreamingAudioTranscriber  # noqa: E402


class IdTokenizer:
    vocab_size = 16

    def decode(self, ids):
        return "".join(chr(ord("a") + i) for i in ids)


def tiny_config():
    cfg = Config()
    cfg.model.decoder.vocab_size = 16
    cfg.model.decoder.blank_id = 3
    cfg.model.audio.d_model = 16
    cfg.model.audio.num_layers = 2
    cfg.model.audio.num_heads = 2
    cfg.model.audio.ffn_dim = 32
    cfg.model.audio.output_dim = 16
    cfg.model.audio.middle_layers = (0, 1)
    cfg.model.frontend.n_mels = 16
    cfg.model.frontend.use_pallas = False
    return cfg


def local_forward(variables, window, sample_mask):
    """Frame-local oracle: frame t's winning token is determined by the
    window sample at the frame anchor t·320 (models/audio.py anchor math)."""
    del variables
    B, S = window.shape
    T = S // 320 + 1
    anchors = jnp.minimum(jnp.arange(T) * 320, S - 1)
    tok = (jnp.take(window, anchors, axis=1) * 100).astype(jnp.int32) % 16
    logits = jax.nn.one_hot(tok, 16) * 10.0
    return jax.nn.log_softmax(logits, axis=-1)


def offline_oracle(signal, blank):
    """Full-utterance greedy collapse under the same frame-local rule."""
    n_frames = -(-len(signal) // 320)
    out, prev = [], blank
    for t in range(n_frames):
        tok = int(signal[min(t * 320, len(signal) - 1)] * 100) % 16
        if tok != prev and tok != blank:
            out.append(tok)
        prev = tok
    return out


def piecewise_signal(rng, n_frames, run_min=1, run_max=6):
    """Piecewise-constant-over-frames signal so frame values are stable."""
    vals = []
    while sum(len(v) for v in vals) < n_frames:
        vals.append([rng.integers(0, 16)] * int(rng.integers(run_min, run_max)))
    frames = np.concatenate(vals)[:n_frames]
    return np.repeat(frames.astype(np.float32) / 100.0 + 0.001, 320)


@pytest.mark.parametrize("block", [160, 320, 1000, 7 * 320, 10_000])
def test_streaming_matches_offline_collapse(block):
    rng = np.random.default_rng(block)
    cfg = tiny_config()
    s = StreamingAudioTranscriber(
        cfg, IdTokenizer(), {}, chunk_seconds=0.2, context_seconds=0.4,
        forward_fn=local_forward, algorithm="greedy",
    )
    signal = piecewise_signal(rng, n_frames=40)

    got = ""
    for i in range(0, len(signal), block):
        got += s.feed(signal[i : i + block])
    got += s.flush()

    want = IdTokenizer().decode(offline_oracle(signal, blank=3))
    assert got == want


def test_streaming_boundary_repeat_collapses():
    """A token whose run spans a chunk boundary must be emitted once."""
    cfg = tiny_config()
    s = StreamingAudioTranscriber(
        cfg, IdTokenizer(), {}, chunk_seconds=0.2, context_seconds=0.2,
        forward_fn=local_forward, algorithm="greedy",
    )
    # chunk = 0.2 s = 3200 samples = 10 frames; one token spans frames 5..15.
    signal = np.repeat(
        np.array([3, 3, 3, 3, 3, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 3, 3, 3, 3, 3],
                 np.float32) / 100.0 + 0.001, 320)
    text = s.feed(signal) + s.flush()
    assert text == IdTokenizer().decode([7])


def test_streaming_text_accumulates_and_resets():
    cfg = tiny_config()
    s = StreamingAudioTranscriber(
        cfg, IdTokenizer(), {}, chunk_seconds=0.2, context_seconds=0.2,
        forward_fn=local_forward, algorithm="greedy",
    )
    signal = piecewise_signal(np.random.default_rng(0), n_frames=25)
    s.feed(signal)
    s.flush()  # flush resets
    assert s.text == ""
    part = s.feed(signal)
    assert s.text == part


def test_stream_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """`main.py --stream=file.wav` restores an audio checkpoint and streams a
    long WAV through the chunked transcriber."""
    import os

    from multimodal_av_model_tpu.data.audio_io import write_wav
    from multimodal_av_model_tpu.main import main
    from multimodal_av_model_tpu.models import AudioOnlyCTC
    from multimodal_av_model_tpu.train.checkpoints import save_checkpoint

    monkeypatch.chdir(tmp_path)
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = 800  # the CLI loads the shipped vocab

    chunk_s, ctx_s = 0.2, 0.2
    window = int((chunk_s + ctx_s) * 16000)
    model = AudioOnlyCTC(cfg.model, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, window), jnp.float32), jnp.ones((1, window), bool),
    )
    os.makedirs("ckpt", exist_ok=True)
    save_checkpoint("ckpt/last.ckpt",
                    {"state": {"params": jax.device_get(variables["params"])},
                     "epoch": 1})

    rng = np.random.default_rng(0)
    write_wav("long.wav", rng.standard_normal(int(0.9 * 16000)) * 0.1, 16000)

    main([
        "--stream=long.wav", "train.checkpoint_dir=ckpt",
        f"decode.stream_chunk_seconds={chunk_s}",
        f"decode.stream_context_seconds={ctx_s}",
        "model.audio.d_model=16", "model.audio.num_layers=2",
        "model.audio.num_heads=2", "model.audio.ffn_dim=32",
        "model.audio.output_dim=16", "model.audio.middle_layers=(0,1)",
        "model.frontend.n_mels=16", "model.frontend.use_pallas=false",
        "model.dtype=float32",
    ])
    out = capsys.readouterr().out
    assert "streaming long.wav" in out


def test_streaming_real_model_smoke():
    """The default forward (AudioOnlyCTC) compiles once and streams."""
    cfg = tiny_config()
    from multimodal_av_model_tpu.models import AudioOnlyCTC

    s = StreamingAudioTranscriber(
        cfg, IdTokenizer(), {}, chunk_seconds=0.2, context_seconds=0.2,
    )
    model = AudioOnlyCTC(cfg.model, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, s.window_samples), jnp.float32),
        jnp.ones((1, s.window_samples), bool),
    )
    s.variables = variables
    s.dtype = jnp.float32

    rng = np.random.default_rng(1)
    audio = rng.standard_normal(int(0.55 * 16000)).astype(np.float32) * 0.1
    out = s.feed(audio) + s.flush()
    assert isinstance(out, str)


# -- streaming prefix beam (round 3) ------------------------------------------

def test_prefix_beam_stream_step_matches_offline():
    """Op-level: feeding chunks through prefix_beam_stream_step equals one
    offline prefix_beam_search_decode over the concatenated frames."""
    from multimodal_av_model_tpu.ops.prefix_beam_search import (
        prefix_beam_search_decode,
        prefix_beam_state_init,
        prefix_beam_stream_step,
    )

    rng = np.random.default_rng(0)
    T, V, W, K, blank = 24, 8, 4, 6, 3
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((T, V)) * 2, jnp.float32), axis=-1)

    want_ids, want_len, want_score = prefix_beam_search_decode(
        lp[None], np.array([T]), beam_width=W, top_k=K, blank_id=blank)

    for chunks in ([8, 8, 8], [5, 11, 8], [1] * 24, [24]):
        state = prefix_beam_state_init(W, T)
        pos = 0
        for c in chunks:
            state = prefix_beam_stream_step(
                state, lp[pos : pos + c], c, top_k=K, blank_id=blank)
            pos += c
        prefixes, lens, pb, pnb = (np.asarray(a) for a in state)
        n = int(lens[0])
        assert n == int(want_len[0])
        np.testing.assert_array_equal(prefixes[0, :n],
                                      np.asarray(want_ids)[0, :n])


def test_prefix_beam_stream_step_respects_length_mask():
    """Frames past `length` are identity — a padded chunk changes nothing."""
    from multimodal_av_model_tpu.ops.prefix_beam_search import (
        prefix_beam_state_init,
        prefix_beam_stream_step,
    )

    rng = np.random.default_rng(1)
    V, W = 8, 4
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((10, V)) * 2, jnp.float32), axis=-1)
    state = prefix_beam_state_init(W, 32)
    full = prefix_beam_stream_step(state, lp[:6], 6, top_k=6, blank_id=3)
    padded = prefix_beam_stream_step(state, lp, 6, top_k=6, blank_id=3)
    for a, b in zip(full, padded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_streaming_prefix_beam_matches_offline_beam():
    """End-to-end: the streamed prefix-beam transcript equals the offline
    prefix beam over the full utterance's frame-local log-probs, for any
    feed blocking (committed emission + flush tail)."""
    from multimodal_av_model_tpu.ops.prefix_beam_search import (
        prefix_beam_search_decode,
    )

    cfg = tiny_config()
    rng = np.random.default_rng(7)
    signal = piecewise_signal(rng, n_frames=40)

    # Offline reference: the same frame-local forward over all frames.
    lp_full = np.asarray(local_forward(None, signal[None], None))[0]
    ids, out_len, _ = prefix_beam_search_decode(
        lp_full[None], np.array([lp_full.shape[0]]),
        beam_width=cfg.decode.beam_width, top_k=cfg.decode.prefix_top_k,
        blank_id=3)
    want = IdTokenizer().decode(
        [int(t) for t in np.asarray(ids)[0, : int(out_len[0])]])

    for block in (1000, 3200, 10_000):
        s = StreamingAudioTranscriber(
            cfg, IdTokenizer(), {}, chunk_seconds=0.2, context_seconds=0.4,
            forward_fn=local_forward, algorithm="prefix_beam",
        )
        got = ""
        for i in range(0, len(signal), block):
            got += s.feed(signal[i : i + block])
        got += s.flush()
        assert got == want, (block, got, want)


def test_streaming_prefix_beam_capacity_shift():
    """A long stream overflows the small prefix buffer: committed tokens
    shift out and the transcript stays correct."""
    cfg = tiny_config()
    rng = np.random.default_rng(3)
    signal = piecewise_signal(rng, n_frames=120)

    s_small = StreamingAudioTranscriber(
        cfg, IdTokenizer(), {}, chunk_seconds=0.2, context_seconds=0.4,
        forward_fn=local_forward, algorithm="prefix_beam", beam_capacity=24,
    )
    s_big = StreamingAudioTranscriber(
        cfg, IdTokenizer(), {}, chunk_seconds=0.2, context_seconds=0.4,
        forward_fn=local_forward, algorithm="prefix_beam", beam_capacity=512,
    )
    got_small = s_small.feed(signal) + s_small.flush()
    got_big = s_big.feed(signal) + s_big.flush()
    assert got_small == got_big
    assert len(got_big) > 10    # non-trivial transcript
