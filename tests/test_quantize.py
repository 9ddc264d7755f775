"""int8 weight-only serving quantization (ops/quantize.py).

The reference serves fp32 torch modules with no quantization surface at all;
this is an additional capability.  Quality on a trained model is measured on
TPU (benchmarks/quantized_serving.py); here we pin the math and the serving
integration.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_av_model_tpu.data import SyntheticPairSource, collate_pairs
from multimodal_av_model_tpu.data.collate import BucketSpec
from multimodal_av_model_tpu.infer import AudioTranscriber, Transcriber
from multimodal_av_model_tpu.ops.quantize import (
    dequantize_tree, quantization_report, quantize_tree,
)
from multimodal_av_model_tpu.text import CharTokenizer
from test_models import tiny_config

VOCAB = os.path.join(os.path.dirname(__file__), "..", "assets", "tokenizer800.vocab")


def test_quantize_round_trip_error_bound():
    """Per-channel symmetric int8: |w - dq(q(w))| <= scale/2 elementwise,
    where scale = amax_channel/127 — the quantization-theory bound."""
    rng = np.random.default_rng(0)
    params = {
        "dense": {"kernel": rng.normal(size=(64, 128)).astype(np.float32) * 0.1,
                  "bias": rng.normal(size=(128,)).astype(np.float32)},
        "conv": {"kernel": rng.normal(size=(3, 3, 16, 32)).astype(np.float32)},
        "attn": {"kernel": rng.normal(size=(64, 4, 32)).astype(np.float32)},
        "norm": {"scale": np.ones((128,), np.float32)},
    }
    q, scales = quantize_tree(params, min_size=1024)
    assert q["dense"]["kernel"].dtype == jnp.int8
    assert q["conv"]["kernel"].dtype == jnp.int8
    assert q["attn"]["kernel"].dtype == jnp.int8
    # bias / norm scale / small leaves stay fp
    assert q["dense"]["bias"].dtype == jnp.float32
    assert q["norm"]["scale"].dtype == jnp.float32
    assert set(scales) == {"dense/kernel", "conv/kernel", "attn/kernel"}

    dq = dequantize_tree(q, scales, dtype=jnp.float32)
    for key, red_axes in [("dense", (0,)), ("conv", (0, 1, 2))]:
        w = params[key]["kernel"]
        bound = np.abs(w).max(axis=red_axes, keepdims=True) / 127.0 / 2 + 1e-6
        err = np.abs(np.asarray(dq[key]["kernel"]) - w)
        assert (err <= bound).all(), f"{key}: {err.max()} > {bound.max()}"
    # attention kernel reduces axis 0 only (per-(head, head_dim) scales)
    w = params["attn"]["kernel"]
    assert scales["attn/kernel"].shape == (1, 4, 32)
    bound = np.abs(w).max(axis=0, keepdims=True) / 127.0 / 2 + 1e-6
    assert (np.abs(np.asarray(dq["attn"]["kernel"]) - w) <= bound).all()

    rep = quantization_report(params, q, scales)
    assert rep["n_quantized"] == 3
    assert rep["vs_fp32"] > 3.0  # ~4x minus scales + unquantized leaves


def test_quantize_min_size_gate():
    params = {"small": {"kernel": np.ones((8, 8), np.float32)}}
    q, scales = quantize_tree(params, min_size=4096)
    assert not scales and q["small"]["kernel"].dtype == jnp.float32


def test_quantized_forward_close_to_fp(tok=None):
    """int8 dequant forward stays close to the fp forward on the audio CTC
    path (same model, same weights, 8-bit kernels)."""
    tok = CharTokenizer(VOCAB)
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size

    rng = np.random.default_rng(1)
    audio = (rng.standard_normal((2, 4000)) * 0.1).astype(np.float32)

    fp = AudioTranscriber(cfg, tok, None, dtype=jnp.float32)
    variables = jax.jit(fp.model.init)(jax.random.PRNGKey(0),
                                       jnp.asarray(audio), None)
    fp = AudioTranscriber(cfg, tok, variables, dtype=jnp.float32)
    q8 = AudioTranscriber(cfg, tok, variables, dtype=jnp.float32,
                          quantize=True, quantize_min_size=256)
    assert q8.variables is None and q8.scales  # fp copy dropped, kernels quantized

    lp_fp, len_fp = fp._forward(*fp._fwd_args, jnp.asarray(audio), None)
    lp_q8, len_q8 = q8._forward(*q8._fwd_args, jnp.asarray(audio), None)
    assert np.array_equal(np.asarray(len_fp), np.asarray(len_q8))
    # log-probs of an untrained tiny model are diffuse; int8 weight error
    # perturbs them by far less than a decode-relevant margin.
    diff = np.abs(np.asarray(lp_fp) - np.asarray(lp_q8)).max()
    assert diff < 0.2, diff

    texts = q8.transcribe(audio, use_beam=False)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)


def test_streaming_quantized_serves():
    """The streaming path serves from the int8 form end to end (feed/flush),
    including the post-construction restore->quantize_weights flow."""
    from multimodal_av_model_tpu.streaming import StreamingAudioTranscriber

    tok = CharTokenizer(VOCAB)
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size

    s = StreamingAudioTranscriber(cfg, tok, None, dtype=jnp.float32,
                                  chunk_seconds=0.25, context_seconds=0.5,
                                  quantize=True, quantize_min_size=256)
    from multimodal_av_model_tpu.models import AudioOnlyCTC

    model = AudioOnlyCTC(cfg.model, dtype=jnp.float32)
    s.variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, s.window_samples), jnp.float32),
        jnp.ones((1, s.window_samples), bool))
    s.quantize_weights()
    qv, scales = s.variables
    assert scales, "expected quantized kernels at min_size=256"
    assert any(x.dtype == jnp.int8 for x in jax.tree.leaves(qv))

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = "".join(s.feed(audio[i : i + 1000]) for i in range(0, 8000, 1000))
    out += s.flush()
    assert isinstance(out, str)


def test_export_quantized_round_trip(tmp_path):
    """Quantized serving artifact: int8 params in the blob's signature,
    halved params.ckpt, identical transcripts after reload."""
    from multimodal_av_model_tpu.infer import (
        ExportedTranscriber, export_transcriber,
    )
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer, save_checkpoint

    tok = CharTokenizer(VOCAB)
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"

    src = SyntheticPairSource(tok, seed=0, video_frames=(4, 7), lip_size=24,
                              label_len=(2, 5))
    batch = collate_pairs([src.load_pair() for _ in range(2)],
                          BucketSpec(8, 4272, 8))
    model = MultiSpeakerAVModel(cfg.model)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    state = trainer.init_state(0, batch)
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, {"state": jax.device_get(state), "epoch": 1})

    t = Transcriber.from_checkpoint(cfg, tok, path, batch,
                                    dtype=jax.numpy.float32, quantize=True,
                                    quantize_min_size=256)
    assert t.scales, "tiny model must quantize at min_size=256"

    out_dir = str(tmp_path / "artifact")
    export_transcriber(t, out_dir, batch, use_beam=False)
    import json

    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    assert meta["quantized"] is True

    served = ExportedTranscriber.load(out_dir, tokenizer=tok)
    assert served.transcribe(batch) == t.transcribe(batch, use_beam=False)
