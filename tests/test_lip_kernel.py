"""Matmul-separable resize and the fused Pallas lip-preprocess kernel vs the
gather-based / cv2-verified paths."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_av_model_tpu.ops.pallas.lip_kernel import lip_preprocess_pallas
from multimodal_av_model_tpu.ops.resize import (
    lip_frames_preprocess,
    resize_bilinear,
    resize_bilinear_matmul,
)


def test_matmul_resize_equals_gather_resize():
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, size=(3, 128, 128)).astype(np.float32)
    a = np.asarray(resize_bilinear(jnp.asarray(imgs), 96, 96))
    b = np.asarray(resize_bilinear_matmul(jnp.asarray(imgs), 96, 96))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_matmul_resize_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, size=(100, 50)).astype(np.float32)
    got = np.asarray(resize_bilinear_matmul(jnp.asarray(img), 64, 40))
    ref = cv2.resize(img, (40, 64), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("T", [5, 8, 11])
def test_pallas_lip_kernel_matches_reference_path(T):
    rng = np.random.default_rng(2)
    frames = rng.uniform(0, 255, size=(T, 128, 128, 3)).astype(np.float32)
    got = np.asarray(lip_preprocess_pallas(frames, 96, interpret=True))
    ref = np.asarray(lip_frames_preprocess(jnp.asarray(frames), 96))
    assert got.shape == ref.shape == (T, 1, 96, 96)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_lip_kernel_grayscale_input():
    rng = np.random.default_rng(3)
    frames = rng.uniform(0, 255, size=(4, 128, 128, 1)).astype(np.float32)
    got = np.asarray(lip_preprocess_pallas(frames, 96, interpret=True))
    ref = np.asarray(lip_frames_preprocess(jnp.asarray(frames), 96))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
