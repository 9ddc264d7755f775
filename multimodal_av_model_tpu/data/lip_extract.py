"""Offline lip-ROI extraction (capability of reference preprocessing.py:9-103).

Pipeline: decode video → face landmarks → lip bounding box (+margin) → crop →
resize → per-sentence ``.npy`` stacks.  Split into two stages so the
MediaPipe dependency stays optional (SURVEY.md §2b: landmark detection has no
TPU analog and stays host/offline):

* ``detect_lip_boxes`` — runs MediaPipe FaceMesh per frame and emits
  ``[T, 4]`` pixel boxes (the same 40 lip landmark indices + 10 px margin as
  reference preprocessing.py:35-40,69-80).  Requires ``mediapipe``; gated.
* ``crop_clip_from_boxes`` — pure NumPy: crops + resizes given *precomputed*
  boxes.  This is what the data pipeline consumes, so corpora can ship
  landmark boxes in the manifest and never need MediaPipe at train time.
* ``extract_clips`` — the ``crop_lip``-equivalent driver over the AI-Hub
  sentence schema, with the reference's skip-on-bad-frame behaviour recorded
  in a skip list instead of printed (reference preprocessing.py:91-94).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

# MediaPipe FaceMesh lip landmark indices (upper+lower lips) — the same set
# the reference selects (reference preprocessing.py:35-40).
LIP_LANDMARK_INDICES = sorted(
    set(
        [61, 146, 91, 181, 84, 17, 314, 405, 321, 375, 291,
         308, 324, 318, 402, 317, 14, 87, 178, 88, 95,
         185, 40, 39, 37, 0, 267, 269, 270, 409, 415,
         310, 311, 312, 13, 82, 81, 42, 183, 78]
    )
)


def have_mediapipe() -> bool:
    try:
        import mediapipe  # noqa: F401

        return True
    except ImportError:
        return False


def lip_box_from_landmarks(
    xs: np.ndarray, ys: np.ndarray, width: int, height: int, margin: int = 10
) -> tuple[int, int, int, int] | None:
    """Pixel bbox over lip landmarks + margin, clamped (reference :69-80).
    Returns ``(x1, y1, x2, y2)`` or None if degenerate."""
    x1 = max(0, int(xs.min()) - margin)
    x2 = min(width, int(xs.max()) + margin)
    y1 = max(0, int(ys.min()) - margin)
    y2 = min(height, int(ys.max()) + margin)
    if x2 <= x1 or y2 <= y1:
        return None
    return x1, y1, x2, y2


def detect_lip_boxes(frames_rgb, margin: int = 10) -> np.ndarray | None:
    """Per-frame lip boxes via MediaPipe FaceMesh; ``[T, 4]`` int32 or None on
    any detection failure (the reference skips the sentence in that case)."""
    import mediapipe as mp

    T, H, W = frames_rgb.shape[0], frames_rgb.shape[1], frames_rgb.shape[2]
    boxes = np.zeros((T, 4), np.int32)
    with mp.solutions.face_mesh.FaceMesh(
        static_image_mode=False, max_num_faces=1, refine_landmarks=True
    ) as mesh:
        for t in range(T):
            result = mesh.process(np.ascontiguousarray(frames_rgb[t]))
            if not result.multi_face_landmarks:
                return None
            lm = result.multi_face_landmarks[0].landmark
            xs = np.array([lm[i].x * W for i in LIP_LANDMARK_INDICES])
            ys = np.array([lm[i].y * H for i in LIP_LANDMARK_INDICES])
            box = lip_box_from_landmarks(xs, ys, W, H, margin)
            if box is None:
                return None
            boxes[t] = box
    return boxes


def crop_clip_from_boxes(
    frames: np.ndarray, boxes: np.ndarray, out_size: int = 128
) -> np.ndarray:
    """Crop per-frame boxes and resize to ``out_size`` (reference :85-88 uses
    cv2.resize; we use the same-math native/NumPy bilinear).  ``frames`` is
    ``[T, H, W, C]``; returns ``[T, out, out, C]`` float32."""
    from .pipeline import _resize_bilinear_np

    T = frames.shape[0]
    out = np.empty((T, out_size, out_size, frames.shape[-1]), np.float32)
    for t in range(T):
        x1, y1, x2, y2 = boxes[t]
        crop = np.asarray(frames[t, y1:y2, x1:x2], np.float32)
        # channels-last → resize each channel over (H, W)
        chw = np.moveaxis(crop, -1, 0)
        out[t] = np.moveaxis(_resize_bilinear_np(chw, out_size, out_size), 0, -1)
    return out


@dataclass
class ExtractionResult:
    saved: list
    skipped: list                      # (sentence_id, reason)


def extract_clips(
    frames_for_range,                  # callable (start_frame, end_frame) -> [T,H,W,3] | None
    json_path: str,
    save_dir: str,
    video_name: str,
    fps: int = 30,
    out_size: int = 128,
    margin: int = 10,
    boxes_for_frames=None,             # callable frames -> [T,4] | None; defaults to MediaPipe
    boxes_for_range=None,              # callable (start,end) -> [T,4] | None:
                                       # PRECOMPUTED per-source-frame boxes
                                       # (corpora shipping landmark boxes need
                                       # no MediaPipe at extraction time)
) -> ExtractionResult:
    """Sentence-wise extraction over the AI-Hub schema (reference :9-103)."""
    os.makedirs(save_dir, exist_ok=True)
    with open(json_path, "r", encoding="utf-8") as f:
        payload = json.load(f)
    metadata = payload[0] if isinstance(payload, list) else payload
    detect = boxes_for_frames or (lambda fr: detect_lip_boxes(fr, margin))

    result = ExtractionResult(saved=[], skipped=[])
    for sent in metadata.get("Sentence_info", []):
        sent_id = sent["ID"]
        start = int(sent["start_time"] * fps)
        end = int(sent["end_time"] * fps)
        frames = frames_for_range(start, end)
        if frames is None or len(frames) == 0:
            result.skipped.append((sent_id, "frame_read_failed"))
            continue
        boxes = (boxes_for_range(start, end) if boxes_for_range is not None
                 else detect(frames))
        if boxes is None:
            result.skipped.append((sent_id, "face_not_detected"))
            continue
        clip = crop_clip_from_boxes(frames, boxes, out_size)
        path = os.path.join(save_dir, f"{video_name}_sentence_{sent_id}.npy")
        np.save(path, clip.astype(np.uint8) if clip.max() > 1.5 else clip)
        result.saved.append(path)
    return result


def video_frame_reader(video_path: str):
    """cv2-backed frame-range reader (gated on cv2; the only video decoder in
    this image).  Returns a callable for ``extract_clips``."""
    import cv2

    def read(start: int, end: int):
        cap = cv2.VideoCapture(video_path)
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        frames = []
        for _ in range(start, end):
            ok, frame = cap.read()
            if not ok or frame is None:
                cap.release()
                return None
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
        return np.stack(frames) if frames else None

    return read
