"""Up-front manifest validation with structured skip-lists.

The reference validates lazily and destructively: broken samples throw inside
DataLoader workers and get retried up to 10× per draw
(reference dataset/multi_speaker_dataset.py:101-114), and preprocessing
skips whole sentences on any bad frame (preprocessing.py:91-94).  Here the
manifest is validated ONCE before training (SURVEY.md §5 failure-detection
row): every entry gets a verdict and a reason, so bad data is visible and the
steady-state sampler never throws.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class ValidationReport:
    ok: list = field(default_factory=list)
    skipped: list = field(default_factory=list)        # (entry, reason)

    @property
    def num_ok(self) -> int:
        return len(self.ok)

    def summary(self) -> str:
        reasons: dict[str, int] = {}
        for _, reason in self.skipped:
            reasons[reason.split(":")[0]] = reasons.get(reason.split(":")[0], 0) + 1
        return (
            f"{self.num_ok} usable / {len(self.skipped)} skipped"
            + (f" ({reasons})" if reasons else "")
        )


def validate_entry(entry, check_lip_contents: bool = False,
                   max_duration_s: float = 30.0) -> str | None:
    """Returns a reason string if the entry should be skipped, else None."""
    if entry.duration <= 0:
        return f"bad_times: start={entry.start_time} end={entry.end_time}"
    if entry.duration > max_duration_s:
        return f"too_long: {entry.duration:.1f}s"
    if not os.path.exists(entry.text_path):
        return f"missing_text: {entry.text_path}"
    if not os.path.exists(entry.lip_path):
        return f"missing_lip: {entry.lip_path}"
    if not os.path.exists(entry.audio_path):
        return f"missing_audio: {entry.audio_path}"
    if check_lip_contents:
        try:
            lip = np.load(entry.lip_path, mmap_mode="r")
        except Exception as e:
            return f"unreadable_lip: {type(e).__name__}"
        if lip.ndim not in (3, 4) or lip.shape[0] == 0:
            return f"bad_lip_shape: {lip.shape}"
    return None


def validate_manifest(entries, check_lip_contents: bool = False) -> ValidationReport:
    report = ValidationReport()
    for entry in entries:
        reason = validate_entry(entry, check_lip_contents)
        if reason is None:
            report.ok.append(entry)
        else:
            report.skipped.append((entry, reason))
    return report
