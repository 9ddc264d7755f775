"""Manifest validation + fault-injection tests (corrupted npy, bad times,
missing files) — SURVEY.md §5 failure-detection row."""

import numpy as np

from multimodal_av_model_tpu.data.manifest import SentenceEntry
from multimodal_av_model_tpu.data.validate import validate_entry, validate_manifest
from multimodal_av_model_tpu.train.profiling import NonFiniteLossError, check_finite

import pytest


def _entry(tmp_path, name="a", lip=None, text="안녕", start=0.0, end=1.0,
           make_audio=True):
    lip_path = str(tmp_path / f"{name}.npy")
    if lip is not None:
        np.save(lip_path, lip)
    text_path = str(tmp_path / f"{name}.txt")
    with open(text_path, "w") as f:
        f.write(text)
    audio_path = str(tmp_path / f"{name}.wav")
    if make_audio:
        from multimodal_av_model_tpu.data.audio_io import write_wav

        write_wav(audio_path, np.zeros(1600, np.float32), 16000)
    return SentenceEntry(lip_path, text_path, audio_path, start, end, text, 1, name)


def test_valid_entry_passes(tmp_path):
    e = _entry(tmp_path, lip=np.zeros((4, 128, 128, 3), np.uint8))
    assert validate_entry(e, check_lip_contents=True) is None


def test_missing_lip_detected(tmp_path):
    e = _entry(tmp_path, lip=None)
    assert "missing_lip" in validate_entry(e)


def test_bad_times_detected(tmp_path):
    e = _entry(tmp_path, lip=np.zeros((4, 8, 8, 3)), start=2.0, end=1.0)
    assert "bad_times" in validate_entry(e)


def test_empty_lip_detected(tmp_path):
    e = _entry(tmp_path, lip=np.zeros((0, 8, 8, 3)))
    assert "bad_lip_shape" in validate_entry(e, check_lip_contents=True)


def test_corrupt_npy_detected(tmp_path):
    e = _entry(tmp_path, lip=np.zeros((2, 4, 4, 3)))
    with open(e.lip_path, "wb") as f:
        f.write(b"not an npy file")
    assert "unreadable_lip" in validate_entry(e, check_lip_contents=True)


def test_manifest_report(tmp_path):
    good = _entry(tmp_path, "g", lip=np.zeros((2, 8, 8, 3)))
    bad = _entry(tmp_path, "b", lip=None)
    report = validate_manifest([good, bad])
    assert report.num_ok == 1
    assert len(report.skipped) == 1
    assert "usable" in report.summary()


def test_check_finite_guard():
    check_finite({"loss": 1.0, "ctc": 2.0})
    with pytest.raises(NonFiniteLossError, match="loss"):
        check_finite({"loss": float("nan"), "ctc": 2.0}, step=7)
