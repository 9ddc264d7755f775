"""Log-mel frontend vs independent oracles (torch.stft for the STFT stage,
analytic properties for the mel stage)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_av_model_tpu.ops.logmel import (
    log_mel_spectrogram,
    mel_filterbank,
    num_frames,
    stft_magsq,
)

torch = pytest.importorskip("torch")


def _sig(n=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1500 * t)
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)


@pytest.mark.parametrize("hop,n_fft", [(160, 400), (200, 400), (128, 512)])
def test_stft_matches_torch(hop, n_fft):
    x = _sig()
    ours = np.asarray(stft_magsq(x, n_fft=n_fft, hop_length=hop))
    ref = torch.stft(
        torch.tensor(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft, periodic=True),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    ref_magsq = (ref.real**2 + ref.imag**2).numpy().T  # torch is [F, T]
    assert ours.shape == ref_magsq.shape
    np.testing.assert_allclose(ours, ref_magsq, rtol=1e-3, atol=1e-4)


def test_num_frames_matches_output():
    x = _sig(12345)
    out = stft_magsq(x, n_fft=400, hop_length=160)
    assert out.shape[0] == num_frames(12345, 400, 160)


def test_mel_filterbank_properties():
    fb = mel_filterbank(201, 80, 16000)
    assert fb.shape == (201, 80)
    assert fb.min() >= 0
    # Every filter has support; peaks near 1 for unnormalized HTK triangles.
    assert (fb.max(axis=0) > 0).all()
    # Filter centers increase monotonically in frequency.
    centers = fb.argmax(axis=0)
    assert (np.diff(centers.astype(int)) >= 0).all()


def test_tone_lands_in_expected_mel_bin():
    # A pure 440 Hz tone must put its energy in the mel bin whose center
    # frequency brackets 440 Hz — an analytic end-to-end check.
    sr, n_fft, n_mels = 16000, 400, 80
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(x, sr, n_fft, 160, None, n_mels, apply_log=False))
    hot = mel.mean(axis=0).argmax()
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sr)
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    center = freqs[fb[:, hot].argmax()]
    assert abs(center - 440) < 150  # within one filter width at low freq


def test_batched_and_jittable():
    import jax

    x = np.stack([_sig(seed=i) for i in range(3)])
    f = jax.jit(lambda s: log_mel_spectrogram(s, 16000, 400, 160, None, 80))
    out = f(jnp.asarray(x))
    assert out.shape == (3, num_frames(16000, 400, 160), 80)
    assert np.isfinite(np.asarray(out)).all()


def test_legacy_frontend_config():
    # Legacy parity config: torchaudio MelSpectrogram defaults (hop = win//2
    # = 200, power 2, no log) — reference 이전 버전/train_ctc_korea.py:38-40.
    x = _sig()
    mel = np.asarray(
        log_mel_spectrogram(x, 16000, 400, 200, 400, 80, apply_log=False)
    )
    assert mel.shape == (num_frames(16000, 400, 200), 80)
    assert (mel >= 0).all()
