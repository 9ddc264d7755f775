"""Batch collation with length bucketing.

Key/padding semantics match the reference collator exactly
(reference dataset/collate_fn.py:4-63): the batch dict has the 12 keys
``lip1/lip2 [B,T,1,96,96]``, ``text1/text2 [B,L]``, ``audio [B,S]``,
``mask1/mask2 [B,S]`` plus the four ``*_lengths`` vectors; lips/labels/audio
zero-pad, masks pad with 3 (``MASK_PAD``).

The TPU-critical difference: instead of padding to the *batch max* (a new
XLA compile per distinct max length), every batch pads up to a **length
bucket** edge — a small static set of shapes chosen up front
(SURVEY.md §5 long-context row).  Audio/mask/label pad sizes derive from the
video bucket so the whole batch has one bucket id.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np

from .mixing import MASK_PAD


@dataclass(frozen=True)
class BucketSpec:
    video_frames: int
    audio_samples: int
    label_len: int


def make_bucket_specs(
    video_buckets: Sequence[int],
    audio_samples_per_video_frame: int = 534,
    max_label_len: int = 128,
) -> list[BucketSpec]:
    """One spec per video bucket; audio budget scales with video length.

    534 samples/frame ≈ 16 kHz / 30 fps rounded up to an even number, so the
    audio bucket always covers the mixture for a clip of that many frames.
    """
    return [
        BucketSpec(v, v * audio_samples_per_video_frame, max_label_len)
        for v in video_buckets
    ]


def pick_bucket(specs: Sequence[BucketSpec], video_len: int, audio_len: int) -> BucketSpec:
    for spec in specs:
        if video_len <= spec.video_frames and audio_len <= spec.audio_samples:
            return spec
    return specs[-1]


def _pad_to(arr: np.ndarray, length: int, value=0) -> np.ndarray:
    """Pad (or truncate) the leading axis to ``length``."""
    arr = np.asarray(arr)
    if arr.shape[0] >= length:
        return arr[:length]
    pad = [(0, length - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=value)


def collate_pairs_raw(samples: list[dict], spec: BucketSpec) -> dict[str, np.ndarray]:
    """Collate RAW pair samples (``load_pair_raw``) for the on-device
    preprocessing path (data/device_pipeline.py): unprocessed lip frames and
    per-speaker waveforms; mixing/masking/resize happen on device."""
    B = len(samples)
    Tv, S, L = spec.video_frames, spec.audio_samples, spec.label_len

    def stack(key, length, dtype=None):
        out = np.stack([_pad_to(np.asarray(s[key]), length) for s in samples])
        return out.astype(dtype) if dtype is not None else out

    batch = {
        # Source dtype preserved (uint8 crops): 4x smaller host->device
        # transfer than float32; the device pipeline casts on chip.
        "lip1_raw": stack("lip1_raw", Tv),
        "lip2_raw": stack("lip2_raw", Tv),
        "lip1_lengths": np.array([min(s["lip1_raw"].shape[0], Tv) for s in samples], np.int32),
        "lip2_lengths": np.array([min(s["lip2_raw"].shape[0], Tv) for s in samples], np.int32),
        "audio1": stack("audio1", S, dtype=np.float32),
        "audio2": stack("audio2", S, dtype=np.float32),
        "audio1_len": np.array([min(len(s["audio1"]), S) for s in samples], np.int32),
        "audio2_len": np.array([min(len(s["audio2"]), S) for s in samples], np.int32),
        "text1": stack("label1", L, dtype=np.int32),
        "text1_lengths": np.array([min(len(s["label1"]), L) for s in samples], np.int32),
        "text2": stack("label2", L, dtype=np.int32),
        "text2_lengths": np.array([min(len(s["label2"]), L) for s in samples], np.int32),
        "valid": np.ones((B,), np.float32),
    }
    return batch


def collate_pairs(samples: list[dict], spec: BucketSpec) -> dict[str, np.ndarray]:
    """Collate per-pair sample dicts (the output of ``load_pair``-style loaders)
    into one fixed-shape batch dict."""
    B = len(samples)
    Tv, S, L = spec.video_frames, spec.audio_samples, spec.label_len

    def stack(key, length, value=0, dtype=None):
        out = np.stack([_pad_to(np.asarray(s[key]), length, value) for s in samples])
        return out.astype(dtype) if dtype is not None else out

    batch = {
        "lip1": stack("lip1", Tv, dtype=np.float32),
        "lip1_lengths": np.array([min(s["lip1"].shape[0], Tv) for s in samples], np.int32),
        "text1": stack("label1", L, dtype=np.int32),
        "text1_lengths": np.array([min(len(s["label1"]), L) for s in samples], np.int32),
        "lip2": stack("lip2", Tv, dtype=np.float32),
        "lip2_lengths": np.array([min(s["lip2"].shape[0], Tv) for s in samples], np.int32),
        "text2": stack("label2", L, dtype=np.int32),
        "text2_lengths": np.array([min(len(s["label2"]), L) for s in samples], np.int32),
        "audio": stack("audio", S, dtype=np.float32),
        "audio_lengths": np.array([min(len(s["audio"]), S) for s in samples], np.int32),
        "mask1": stack("mask1", S, value=MASK_PAD, dtype=np.int32),
        "mask2": stack("mask2", S, value=MASK_PAD, dtype=np.int32),
        # Per-row validity weight: 1 for real samples, 0 for flush-batch
        # padding rows (set by bucketed_batches).  The jitted loss weights
        # rows by this so duplicated flush rows contribute nothing.
        "valid": np.ones((B,), np.float32),
    }
    assert batch["lip1"].shape == (B, Tv) + tuple(np.asarray(samples[0]["lip1"]).shape[1:])
    return batch
