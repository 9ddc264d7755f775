"""STFT → log-mel audio frontend as pure jnp (XLA-fused on TPU).

Revives the reference's legacy log-mel path
(reference 이전 버전/train_ctc_korea.py:38-40: ``torchaudio.transforms.
MelSpectrogram(sample_rate=sr, n_mels=80)``) as the framework's first-party
audio frontend, replacing the pretrained wav2vec2 conv stack
(reference model/encoder.py:83).  Semantics are torchaudio-compatible:

* centered frames, reflect padding, periodic Hann window;
* power-2 magnitude spectrogram via rFFT;
* HTK mel scale (``2595 · log10(1 + f/700)``), no filterbank norm —
  torchaudio's defaults.

The ``log`` is ours (torchaudio's transform returns raw mel power; the
reference feeds that straight to a GRU; we log-compress, which is standard and
strictly more trainable — divergence documented in SURVEY.md §7 step 2).

A fused Pallas version of this frontend lives in
``ops/pallas/logmel_kernel.py``; this module is the semantic reference and
autodiff path.  The frame/window/FFT/mel pipeline here compiles to a single
XLA fusion + one MXU matmul for the mel projection, so it is already fast;
the Pallas kernel exists to fuse framing with the mel matmul for long inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f, htk: bool = True):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney scale (librosa default), kept for librosa-parity configs.
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel)


def mel_to_hz(m, htk: bool = True):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), m * f_sp)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
    htk: bool = True,
    norm: str | None = None,
) -> np.ndarray:
    """Triangular mel filterbank ``[n_freqs, n_mels]`` (torchaudio layout)."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min, htk), hz_to_mel(f_max, htk), n_mels + 2)
    f_pts = mel_to_hz(m_pts, htk)
    f_diff = f_pts[1:] - f_pts[:-1]                       # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]          # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


def _frame(signal, n_fft: int, hop_length: int, center: bool):
    """Frame the last axis into overlapping windows ``[..., n_frames, n_fft]``."""
    if center:
        pad = [(0, 0)] * (signal.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        signal = jnp.pad(signal, pad, mode="reflect")
    n = signal.shape[-1]
    n_frames = 1 + (n - n_fft) // hop_length
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    return jnp.take(signal, idx, axis=-1)


def stft_magsq(
    signal,
    n_fft: int = 400,
    hop_length: int = 160,
    win_length: int | None = None,
    center: bool = True,
):
    """Power spectrogram ``[..., n_frames, n_fft // 2 + 1]`` (float32)."""
    win_length = win_length or n_fft
    frames = _frame(jnp.asarray(signal, jnp.float32), n_fft, hop_length, center)
    # Periodic Hann (torch.hann_window default).
    window = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(win_length) / win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * window.astype(jnp.float32), n=n_fft, axis=-1)
    return (spec.real**2 + spec.imag**2).astype(jnp.float32)


def log_mel_spectrogram(
    signal,
    sample_rate: int = 16000,
    n_fft: int = 400,
    hop_length: int = 160,
    win_length: int | None = None,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: float | None = None,
    log_eps: float = 1e-6,
    center: bool = True,
    apply_log: bool = True,
):
    """Log-mel features ``[..., n_frames, n_mels]`` from raw waveform.

    ``apply_log=False`` reproduces torchaudio's raw mel power output for
    bit-equivalence tests against the legacy frontend.
    """
    magsq = stft_magsq(signal, n_fft, hop_length, win_length, center)
    fb = jnp.asarray(
        mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max)
    )
    # Feature fidelity: the mel projection stays full f32 (frontend features
    # feed golden-equivalence tests; bf16 here would drift them).
    mel = jnp.matmul(magsq, fb, precision=jax.lax.Precision.HIGHEST)
    if apply_log:
        mel = jnp.log(mel + log_eps)
    return mel


def num_frames(n_samples: int, n_fft: int = 400, hop_length: int = 160, center: bool = True) -> int:
    """Static frame count for a given sample count (host-side shape math)."""
    n = n_samples + (n_fft if center else 0)
    return 1 + (n - n_fft) // hop_length
