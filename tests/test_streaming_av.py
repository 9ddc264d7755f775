"""Streaming AV (two-speaker flagship) transcription: exact chunk-boundary
semantics per speaker + real-model smoke + the `--stream=...avi` CLI.

Same method as tests/test_streaming.py: a frame-local oracle forward (each
visual frame's log-probs are determined by that frame's lip pixel) isolates
the alignment/carry logic from encoder context truncation (the documented
streaming approximation).  The flagship anchors log-probs one-to-one to
visual frames (models/av_model.py fusion output), which is exactly what the
oracle models.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from multimodal_av_model_tpu.config import Config  # noqa: E402
from multimodal_av_model_tpu.streaming import StreamingAVTranscriber  # noqa: E402

V, BLANK = 16, 3
LIP = 8


class IdTokenizer:
    vocab_size = V

    def decode(self, ids):
        return "".join(chr(ord("a") + i) for i in ids)


def tiny_config():
    cfg = Config()
    cfg.model.decoder.vocab_size = V
    cfg.model.decoder.blank_id = BLANK
    cfg.model.audio.d_model = 16
    cfg.model.audio.num_layers = 1
    cfg.model.audio.num_heads = 2
    cfg.model.audio.ffn_dim = 32
    cfg.model.audio.output_dim = 16
    cfg.model.audio.middle_layers = (0,)
    cfg.model.audio.conv_kernel_size = 7
    cfg.model.visual.frontend_channels = 4
    cfg.model.visual.resnet_layers = (1, 1, 1, 1)
    cfg.model.visual.resnet_channels = (4, 4, 4, 4)
    cfg.model.visual.output_dim = 8
    cfg.model.visual.norm = "group"
    cfg.model.fusion.fused_dim = 8
    cfg.model.fusion.num_heads = 2
    cfg.model.fusion.temporal_model = "transformer"
    cfg.model.contrastive.projection_dim = 4
    cfg.model.frontend.n_mels = 16
    cfg.model.frontend.use_pallas = False
    return cfg


def local_forward(variables, lip1, lip2, audio, m1, m2, len1, len2):
    """Frame-local oracle: visual frame t's winning token for speaker s is
    determined by lips[s][0, t, 0, 0, 0]."""
    del variables, audio, m1, m2, len1, len2

    def lp(lips):
        tok = (lips[:, :, 0, 0, 0] * 100).astype(jnp.int32) % V
        return jax.nn.log_softmax(jax.nn.one_hot(tok, V) * 10.0, axis=-1)

    return lp(lip1), lp(lip2)


def frame_signal(rng, n_frames, run_min=1, run_max=5):
    """Per-frame token values as lip clips whose [0,0] pixel encodes them."""
    vals = []
    while sum(len(v) for v in vals) < n_frames:
        vals.append([int(rng.integers(0, V))] * int(rng.integers(run_min, run_max)))
    toks = np.concatenate(vals)[:n_frames].astype(np.float32)
    lips = np.zeros((n_frames, 1, LIP, LIP), np.float32)
    lips[:, 0, 0, 0] = toks / 100.0 + 0.001
    return lips, toks.astype(np.int64)


def offline_collapse(toks):
    out, prev = [], None
    for t in toks:
        t = int(t)
        if t != prev and t != BLANK:
            out.append(t)
        prev = t
    return out


@pytest.mark.parametrize("block_frames", [1, 3, 5, 11, 100])
def test_av_streaming_matches_offline_collapse(block_frames):
    rng = np.random.default_rng(block_frames)
    cfg = tiny_config()
    s = StreamingAVTranscriber(
        cfg, IdTokenizer(), {}, chunk_frames=5, context_frames=10,
        lip_size=LIP, forward_fn=local_forward, algorithm="greedy")
    n = 37
    lips1, toks1 = frame_signal(rng, n)
    lips2, toks2 = frame_signal(rng, n)
    spf = cfg.data.audio_samples_per_video_frame
    audio = rng.standard_normal(n * spf).astype(np.float32) * 0.1

    got1, got2 = "", ""
    for i in range(0, n, block_frames):
        j = min(i + block_frames, n)
        t1, t2 = s.feed(lips1[i:j], lips2[i:j], audio[i * spf : j * spf])
        got1 += t1
        got2 += t2
    t1, t2 = s.flush()
    got1 += t1
    got2 += t2

    tok = IdTokenizer()
    assert got1 == tok.decode(offline_collapse(toks1))
    assert got2 == tok.decode(offline_collapse(toks2))


def test_av_streaming_prefix_beam_matches_offline():
    """Per-speaker carried prefix beam across chunks == one offline prefix
    beam over the same per-frame log-probs."""
    from multimodal_av_model_tpu.ops.prefix_beam_search import (
        prefix_beam_search_decode,
    )

    rng = np.random.default_rng(7)
    n = 24
    # Soft per-frame distributions so the beam genuinely sums alignments.
    logits1 = rng.standard_normal((n, V)).astype(np.float32) * 2.0
    logits2 = rng.standard_normal((n, V)).astype(np.float32) * 2.0
    lp_full = [np.asarray(jax.nn.log_softmax(jnp.asarray(x), -1))
               for x in (logits1, logits2)]

    def soft_forward(variables, lip1, lip2, audio, m1, m2, len1, len2):
        # Frame t carries its row index in the [0,1] pixel; pad rows (pixel
        # 0) decode to a uniform distribution (they are masked by `end`).
        def lp(lips, table):
            idx = jnp.clip((lips[:, :, 0, 0, 0] * 1000).astype(jnp.int32) - 1,
                           0, n - 1)
            return jnp.asarray(table)[idx]

        return lp(lip1, lp_full[0]), lp(lip2, lp_full[1])

    cfg = tiny_config()
    cfg.decode.beam_width = 5
    cfg.decode.prefix_top_k = V
    s = StreamingAVTranscriber(
        cfg, IdTokenizer(), {}, chunk_frames=5, context_frames=10,
        lip_size=LIP, forward_fn=soft_forward, algorithm="prefix_beam")

    lips = np.zeros((2, n, 1, LIP, LIP), np.float32)
    lips[:, :, 0, 0, 0] = (np.arange(n, dtype=np.float32) + 1) / 1000.0
    spf = cfg.data.audio_samples_per_video_frame
    audio = np.zeros(n * spf, np.float32)

    got1, got2 = "", ""
    for i in range(0, n, 5):
        j = min(i + 5, n)
        t1, t2 = s.feed(lips[0, i:j], lips[1, i:j], audio[i * spf : j * spf])
        got1 += t1
        got2 += t2
    t1, t2 = s.flush()
    got1 += t1
    got2 += t2

    tok = IdTokenizer()
    for got, lp in ((got1, lp_full[0]), (got2, lp_full[1])):
        ids, lens, _ = prefix_beam_search_decode(
            jnp.asarray(lp)[None], jnp.asarray([n]),
            cfg.decode.beam_width, cfg.decode.prefix_top_k, BLANK)
        want = tok.decode(np.asarray(ids)[0, : int(np.asarray(lens)[0])].tolist())
        assert got == want


def test_av_streaming_real_model_smoke():
    """The default forward (MultiSpeakerAVModel) compiles once and streams;
    flush resets accumulated text."""
    cfg = tiny_config()
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel

    s = StreamingAVTranscriber(cfg, IdTokenizer(), {}, chunk_frames=4,
                               context_frames=4, lip_size=24,
                               dtype=jnp.float32, algorithm="greedy")
    model = MultiSpeakerAVModel(cfg.model, dtype=jnp.float32)
    F = s.context_frames + s.chunk_frames
    spf = cfg.data.audio_samples_per_video_frame
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, F, 1, 24, 24)), jnp.zeros((1, F, 1, 24, 24)),
        jnp.zeros((1, F * spf)),
        jnp.full((1, F * spf), 2, jnp.int32),
        jnp.full((1, F * spf), 2, jnp.int32),
        jnp.full((1,), F, jnp.int32), jnp.full((1,), F, jnp.int32))
    s.variables = variables

    rng = np.random.default_rng(0)
    n = 10
    lips = rng.uniform(size=(2, n, 1, 24, 24)).astype(np.float32)
    audio = rng.standard_normal(n * spf).astype(np.float32) * 0.1
    t1a, t2a = s.feed(lips[0], lips[1], audio)
    t1b, t2b = s.flush()
    assert isinstance(t1a + t1b, str) and isinstance(t2a + t2b, str)
    assert s.text(0) == "" and s.text(1) == ""   # flush reset


@pytest.mark.slow
def test_stream_av_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """`main.py --stream=lips1.avi,lips2.avi,mix.wav`: first-party AVI
    decode feeding the streaming flagship from a real checkpoint."""
    import os

    from multimodal_av_model_tpu.data.audio_io import write_wav
    from multimodal_av_model_tpu.data.avi import write_avi
    from multimodal_av_model_tpu.main import main
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.train.checkpoints import save_checkpoint

    monkeypatch.chdir(tmp_path)
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = 800   # the CLI loads the shipped vocab

    model = MultiSpeakerAVModel(cfg.model, dtype=jnp.float32)
    # chunk 0.1 s + context 0.1 s at ~30 fps -> 3 + 3 = 6 window frames.
    F, spf = 6, cfg.data.audio_samples_per_video_frame
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, F, 1, 96, 96)), jnp.zeros((1, F, 1, 96, 96)),
        jnp.zeros((1, F * spf)),
        jnp.full((1, F * spf), 2, jnp.int32),
        jnp.full((1, F * spf), 2, jnp.int32),
        jnp.full((1,), F, jnp.int32), jnp.full((1,), F, jnp.int32))
    os.makedirs("ckpt", exist_ok=True)
    save_checkpoint("ckpt/last.ckpt",
                    {"state": {"params": jax.device_get(variables["params"])},
                     "epoch": 1})

    rng = np.random.default_rng(0)
    n = 10
    for name in ("lips1.avi", "lips2.avi"):
        frames = rng.integers(0, 256, size=(n, 32, 32, 3), dtype=np.uint8)
        write_avi(name, frames, fps=30)
    write_wav("mix.wav", rng.standard_normal(n * spf) * 0.1, 16000)

    main([
        "--stream=lips1.avi,lips2.avi,mix.wav", "train.checkpoint_dir=ckpt",
        "decode.stream_chunk_seconds=0.1", "decode.stream_context_seconds=0.1",
        "model.audio.d_model=16", "model.audio.num_layers=1",
        "model.audio.num_heads=2", "model.audio.ffn_dim=32",
        "model.audio.output_dim=16", "model.audio.middle_layers=(0,)",
        "model.audio.conv_kernel_size=7",
        "model.visual.frontend_channels=4", "model.visual.resnet_layers=(1,1,1,1)",
        "model.visual.resnet_channels=(4,4,4,4)", "model.visual.output_dim=8",
        "model.visual.norm=group", "model.fusion.fused_dim=8",
        "model.fusion.num_heads=2", "model.fusion.temporal_model=transformer",
        "model.contrastive.projection_dim=4",
        "model.frontend.n_mels=16", "model.frontend.use_pallas=false",
        "model.dtype=float32",
        "decode.algorithm=greedy",
    ])
    out = capsys.readouterr().out
    assert "streaming AV" in out
