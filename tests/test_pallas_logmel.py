"""Fused Pallas log-mel kernel vs the jnp reference path (interpret mode on
CPU; the same kernel compiles for TPU via Mosaic)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_av_model_tpu.ops.logmel import log_mel_spectrogram, num_frames
from multimodal_av_model_tpu.ops.pallas.logmel_kernel import log_mel_spectrogram_pallas


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (
        0.4 * np.sin(2 * np.pi * 523 * t) + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)


@pytest.mark.parametrize("n", [16000, 12345])
def test_matches_jnp_path(n):
    x = _sig(n)
    ref = np.asarray(log_mel_spectrogram(x, 16000, 400, 160, None, 80))
    got = np.asarray(
        log_mel_spectrogram_pallas(x, 16000, 400, 160, None, 80, interpret=True)
    )
    assert got.shape == ref.shape == (num_frames(n, 400, 160), 80)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_batched():
    x = np.stack([_sig(8000, seed=i) for i in range(3)])
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(x), 16000, 400, 160, None, 80))
    got = np.asarray(
        log_mel_spectrogram_pallas(jnp.asarray(x), 16000, 400, 160, None, 80, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_no_log_mode():
    x = _sig(4000)
    ref = np.asarray(log_mel_spectrogram(x, apply_log=False))
    got = np.asarray(log_mel_spectrogram_pallas(x, apply_log=False, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-2)
