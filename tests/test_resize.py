"""Bilinear resize vs the cv2 INTER_LINEAR oracle (the reference's resize path,
reference dataset/multi_speaker_dataset.py:51-57)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_av_model_tpu.ops.resize import lip_frames_preprocess, resize_bilinear

cv2 = pytest.importorskip("cv2")


@pytest.mark.parametrize("in_size,out_size", [(128, 96), (64, 96), (100, 50)])
def test_matches_cv2(in_size, out_size):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(in_size, in_size)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), out_size, out_size))
    ref = cv2.resize(img, (out_size, out_size), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_batched_matches_per_frame_cv2():
    rng = np.random.default_rng(1)
    clip = rng.uniform(0, 255, size=(5, 128, 128)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(clip), 96, 96))
    for t in range(5):
        ref = cv2.resize(clip[t], (96, 96), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours[t], ref, rtol=1e-4, atol=1e-3)


def test_lip_frames_preprocess_matches_reference_pipeline():
    # Reference: gray = rgb.mean(-1); per-frame cv2.resize to 96; /255;
    # output (T, 1, 96, 96)  — dataset/multi_speaker_dataset.py:49-59.
    rng = np.random.default_rng(2)
    frames = rng.uniform(0, 255, size=(4, 128, 128, 3)).astype(np.float32)
    ours = np.asarray(lip_frames_preprocess(jnp.asarray(frames), 96))
    assert ours.shape == (4, 1, 96, 96)
    gray = frames.mean(axis=-1)
    for t in range(4):
        ref = cv2.resize(gray[t], (96, 96), interpolation=cv2.INTER_LINEAR) / 255.0
        np.testing.assert_allclose(ours[t, 0], ref, rtol=1e-4, atol=1e-5)
