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


# -- first-party heuristic localizer (no MediaPipe) ---------------------------

def synthetic_face_frames(T=6, H=90, W=120, cx0=58.0, cy0=55.0, seed=0):
    """Synthetic talking head with a KNOWN lip ellipse: skin-toned face
    ellipse, darker red lip ellipse that drifts a little per frame, gray
    background + noise.  Returns (frames_uint8, gt_boxes [T,4] tight)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    frames = np.zeros((T, H, W, 3), np.uint8)
    gt = np.zeros((T, 4), np.int32)
    for t in range(T):
        cx = cx0 + 2.0 * np.sin(t)
        cy = cy0 + 1.5 * np.cos(t)
        ax, ay = 14.0, 6.0 + 1.5 * (t % 2)          # mouth opens/closes
        img = np.zeros((H, W, 3), np.float32)
        img[...] = (95, 100, 110)                    # background
        face = ((xx - W / 2) / 38) ** 2 + ((yy - 40) / 42) ** 2 <= 1.0
        img[face] = (205, 165, 145)                  # skin
        lips = ((xx - cx) / ax) ** 2 + ((yy - cy) / ay) ** 2 <= 1.0
        img[lips] = (185, 70, 80)                    # lips: red-dominant
        img += rng.normal(0, 3.0, img.shape).astype(np.float32)
        frames[t] = np.clip(img, 0, 255).astype(np.uint8)
        ys, xs = np.nonzero(lips)
        gt[t] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
    return frames, gt


def iou(a, b):
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    area = lambda r: (r[2] - r[0]) * (r[3] - r[1])
    return inter / (area(a) + area(b) - inter)


def test_heuristic_localizer_on_synthetic_avi_fixture(tmp_path):
    """End-to-end through the first-party media stack: synthetic face
    frames -> write_avi -> AviReader -> heuristic localizer; every frame's
    box must cover the ground-truth lips (IoU vs GT+margin >= 0.5, GT fully
    inside the detected box)."""
    from multimodal_av_model_tpu.data.avi import AviReader, write_avi
    from multimodal_av_model_tpu.data.lip_extract import (
        detect_lip_boxes_heuristic,
    )

    frames, gt = synthetic_face_frames()
    path = str(tmp_path / "face.avi")
    write_avi(path, frames)
    with AviReader(path) as r:
        decoded = np.stack([r.read_frame(t) for t in range(r.num_frames)])
    np.testing.assert_array_equal(decoded, frames)   # uncompressed: exact

    margin = 10
    boxes = detect_lip_boxes_heuristic(decoded, margin=margin)
    assert boxes is not None and boxes.shape == gt.shape
    H, W = frames.shape[1:3]
    for t in range(len(gt)):
        gx = (max(0, gt[t, 0] - margin), max(0, gt[t, 1] - margin),
              min(W, gt[t, 2] + margin), min(H, gt[t, 3] + margin))
        # GT lips fully inside the detected crop...
        assert boxes[t, 0] <= gt[t, 0] and boxes[t, 1] <= gt[t, 1]
        assert boxes[t, 2] >= gt[t, 2] and boxes[t, 3] >= gt[t, 3]
        # ...and the crop is a lip ROI, not the whole face.
        assert iou(boxes[t], gx) >= 0.5, (t, boxes[t], gx)


def test_heuristic_localizer_no_signal_returns_none():
    from multimodal_av_model_tpu.data.lip_extract import (
        detect_lip_boxes_heuristic,
    )

    gray = np.full((3, 40, 40, 3), 128, np.uint8)    # zero chroma everywhere
    assert detect_lip_boxes_heuristic(gray) is None


def test_extract_clips_uses_heuristic_without_mediapipe(tmp_path):
    """extract_clips' default detector must execute end-to-end in this
    image (no MediaPipe installed): AVI fixture -> heuristic boxes -> crops."""
    from multimodal_av_model_tpu.data.avi import avi_frame_reader, write_avi
    from multimodal_av_model_tpu.data.lip_extract import (
        extract_clips, have_mediapipe,
    )

    if have_mediapipe():
        pytest.skip("image unexpectedly has mediapipe; heuristic not default")
    frames, _ = synthetic_face_frames(T=8)
    path = str(tmp_path / "clip.avi")
    write_avi(path, frames)
    meta = {"Sentence_info": [
        {"ID": 1, "start_time": 0.0, "end_time": 8 / 30.0}]}
    jpath = str(tmp_path / "clip.json")
    with open(jpath, "w", encoding="utf-8") as f:
        json.dump([meta], f)
    res = extract_clips(avi_frame_reader(path), jpath, str(tmp_path / "out"),
                        "clip", out_size=64)
    assert res.skipped == []
    assert len(res.saved) == 1
    clip = np.load(res.saved[0])
    assert clip.shape[1:3] == (64, 64)
