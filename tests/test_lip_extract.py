"""Lip-ROI extraction: box math, box-based crop/resize, and the sentence-wise
driver with injected (MediaPipe-free) detectors."""

import json
import os

import numpy as np
import pytest

from multimodal_av_model_tpu.data.lip_extract import (
    LIP_LANDMARK_INDICES,
    crop_clip_from_boxes,
    extract_clips,
    have_mediapipe,
    lip_box_from_landmarks,
)


def test_landmark_index_set():
    # 40 distinct MediaPipe lip indices (reference preprocessing.py:35-40).
    assert len(LIP_LANDMARK_INDICES) == 40
    assert len(set(LIP_LANDMARK_INDICES)) == 40


def test_lip_box_margin_and_clamp():
    xs = np.array([100.0, 150.0])
    ys = np.array([200.0, 230.0])
    assert lip_box_from_landmarks(xs, ys, 1920, 1080, margin=10) == (90, 190, 160, 240)
    # Clamped at image edges.
    assert lip_box_from_landmarks(np.array([2.0]), np.array([3.0]), 640, 480,
                                  margin=10) == (0, 0, 12, 13)


def test_lip_box_degenerate_returns_none():
    assert lip_box_from_landmarks(np.array([5.0]), np.array([5.0]), 640, 480,
                                  margin=0) is None


def test_crop_clip_from_boxes():
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, size=(3, 64, 64, 3)).astype(np.float32)
    boxes = np.array([[10, 10, 42, 42]] * 3, np.int32)
    out = crop_clip_from_boxes(frames, boxes, out_size=16)
    assert out.shape == (3, 16, 16, 3)
    # Identity-size box: crop == resize of crop at same size.
    boxes2 = np.array([[0, 0, 16, 16]] * 3, np.int32)
    out2 = crop_clip_from_boxes(frames[:, :16, :16], boxes2, out_size=16)
    np.testing.assert_allclose(out2, frames[:, :16, :16], rtol=1e-5)


def test_extract_clips_with_injected_detector(tmp_path):
    rng = np.random.default_rng(1)
    meta = [{
        "Sentence_info": [
            {"ID": 1, "sentence_text": "가", "start_time": 0.0, "end_time": 0.1},
            {"ID": 2, "sentence_text": "나", "start_time": 0.1, "end_time": 0.2},
            {"ID": 3, "sentence_text": "다", "start_time": 0.2, "end_time": 0.3},
        ]
    }]
    json_path = str(tmp_path / "v.json")
    with open(json_path, "w", encoding="utf-8") as f:
        json.dump(meta, f)

    frames_all = rng.uniform(0, 255, size=(9, 48, 48, 3)).astype(np.float32)

    def frames_for_range(start, end):
        if start >= 6:     # third sentence: simulate read failure
            return None
        return frames_all[start:end]

    calls = []

    def boxes_for_frames(frames):
        calls.append(len(frames))
        if len(calls) == 2:  # second sentence: simulate face-detection failure
            return None
        return np.array([[4, 4, 36, 36]] * len(frames), np.int32)

    result = extract_clips(
        frames_for_range, json_path, str(tmp_path / "out"), "vid",
        fps=30, out_size=32, boxes_for_frames=boxes_for_frames,
    )
    assert len(result.saved) == 1
    assert result.saved[0].endswith("vid_sentence_1.npy")
    assert ("face_not_detected" in [r for _, r in result.skipped])
    assert ("frame_read_failed" in [r for _, r in result.skipped])
    clip = np.load(result.saved[0])
    assert clip.shape == (3, 32, 32, 3)  # 0.1 s at 30 fps


def test_mediapipe_gate():
    # MediaPipe is absent in this image; the gate must say so without raising.
    assert have_mediapipe() in (True, False)
