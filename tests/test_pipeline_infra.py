"""Host-pipeline infrastructure: prefetch error propagation, WavCache,
audio IO round trips, config serialization."""

import numpy as np
import pytest

from multimodal_av_model_tpu.config import Config, from_flat_overrides, to_dict
from multimodal_av_model_tpu.data.audio_io import (
    WavCache,
    load_audio,
    read_wav,
    resample,
    write_wav,
)
from multimodal_av_model_tpu.data.pipeline import PrefetchingLoader


def test_prefetch_yields_in_order():
    loader = PrefetchingLoader(lambda: iter([{"i": np.int32(k)} for k in range(20)]),
                               depth=3)
    out = [int(b["i"]) for b in loader]
    assert out == list(range(20))


def test_prefetch_propagates_worker_errors():
    def bad_factory():
        yield {"i": np.int32(0)}
        raise RuntimeError("boom in worker")

    loader = PrefetchingLoader(lambda: bad_factory(), depth=2)
    with pytest.raises(RuntimeError, match="boom in worker"):
        list(loader)


def test_prefetch_is_reiterable():
    loader = PrefetchingLoader(lambda: iter([{"i": np.int32(k)} for k in range(3)]))
    assert len(list(loader)) == 3
    assert len(list(loader)) == 3  # factory re-invoked per epoch


def test_wav_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(8000) * 0.2).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, x, 16000)
    y, sr = read_wav(path)
    assert sr == 16000
    # 16-bit quantization + the standard write(*32767)/read(/32768) scale
    # asymmetry bound the error at ~2/32768.
    np.testing.assert_allclose(y, x, atol=2.0 / 32768 + 1e-6)


def test_resample_preserves_tone(tmp_path):
    # A 440 Hz tone resampled 48k → 16k keeps its frequency.
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 1
    spec = np.abs(np.fft.rfft(y[:sr_out]))
    peak_hz = np.argmax(spec[10:]) + 10  # skip DC region
    assert abs(peak_hz - 440) < 3


def test_wavcache_slicing_and_lru(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"w{i}.wav")
        write_wav(p, rng.standard_normal(16000) * 0.1, 16000)
        paths.append(p)
    cache = WavCache(target_sr=16000, max_items=2)
    seg = cache.load_segment(paths[0], 0.25, 0.75)
    assert len(seg) == 8000
    for p in paths:  # exceed capacity
        cache.load(p)
    assert len(cache._cache) == 2


def test_config_round_trip_and_dict():
    cfg = from_flat_overrides([
        "train.batch_size=16",
        "model.fusion.temporal_model=transformer",
        "model.audio.middle_layers=(2,3)",
        "train.grad_clip_norm=1.0",
    ])
    assert cfg.train.batch_size == 16
    assert cfg.model.fusion.temporal_model == "transformer"
    assert cfg.model.audio.middle_layers == (2, 3)
    assert cfg.train.grad_clip_norm == 1.0
    d = to_dict(cfg)
    assert d["train"]["batch_size"] == 16
    # Defaults match the reference constants (SURVEY.md §5 config row).
    base = Config()
    assert base.train.learning_rate == 1e-4
    assert base.train.audio_learning_rate == 2e-5
    assert base.train.lambda_contrastive == 0.1
    assert base.model.contrastive.temperature == 0.07
    assert base.decode.beam_width == 5
    assert base.model.decoder.blank_id == 3
