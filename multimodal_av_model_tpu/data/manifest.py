"""Manifest construction over the AI-Hub "Lip voice" JSON schema.

Capability-equivalent of the reference manifest builder
(reference preprocessing.py:124-155) and label extractor
(reference preprocessing.py:105-122).  The schema (see
reference input_texts/lip_K_*.json): a one-element JSON list whose first
element has ``Sentence_info: [{ID, topic, sentence_text, start_time,
end_time}]`` plus ``Video_info`` (30 fps 1920×1080) and ``Audio_info``
(48 kHz stereo).

Differences from the reference (by design):
* entries are typed (``SentenceEntry``) instead of raw dicts;
* missing-file checks happen once, up front, and are *reported* as a skip
  list instead of printed per file (SURVEY.md §5 failure-detection row);
* the sentence text itself rides along so labels need not be re-read from
  disk per sample.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterable


@dataclass(frozen=True)
class SentenceEntry:
    lip_path: str
    text_path: str
    audio_path: str
    start_time: float
    end_time: float
    sentence_text: str = ""
    sentence_id: int = -1
    base_name: str = ""

    @property
    def duration(self) -> float:
        return self.end_time - self.start_time

    # Mapping-style access so code written against the reference's dict
    # entries (keys at reference preprocessing.py:146-152) keeps working.
    def __getitem__(self, key: str):
        return getattr(self, key)


def speaker_id_of(path: str) -> str:
    """First 7 '_'-separated fields of the basename identify the speaker
    (reference dataset/multi_speaker_dataset.py:93-95):
    ``lip_J_1_M_03_C486_A_012_sentence_41`` → ``lip_J_1_M_03_C486_A``."""
    filename = os.path.splitext(os.path.basename(path))[0]
    return "_".join(filename.split("_")[:7])


def _load_metadata(json_path: str) -> dict:
    with open(json_path, "r", encoding="utf-8") as f:
        payload = json.load(f)
    return payload[0] if isinstance(payload, list) else payload


def build_data_list(
    json_folder: str,
    npy_dir: str,
    text_dir: str,
    wav_dir: str,
    require_files: bool = True,
) -> tuple[list[SentenceEntry], list[str]]:
    """Scan the JSON folder and join each sentence to its artifacts.

    Returns ``(entries, skipped)`` where ``skipped`` lists the paths whose
    lip/.txt artifacts were missing (the reference prints-and-drops these,
    reference preprocessing.py:143-145).
    """
    entries: list[SentenceEntry] = []
    skipped: list[str] = []
    for filename in sorted(os.listdir(json_folder)):
        if not filename.endswith(".json"):
            continue
        metadata = _load_metadata(os.path.join(json_folder, filename))
        base_name = os.path.splitext(filename)[0]
        wav_path = os.path.join(wav_dir, base_name + ".wav")
        for sent in metadata.get("Sentence_info", []):
            sent_id = sent["ID"]
            lip_path = os.path.join(npy_dir, f"{base_name}_sentence_{sent_id}.npy")
            text_path = os.path.join(text_dir, f"{base_name}_sentence_{sent_id}.txt")
            if require_files and not (os.path.exists(lip_path) and os.path.exists(text_path)):
                skipped.append(lip_path)
                continue
            entries.append(
                SentenceEntry(
                    lip_path=lip_path,
                    text_path=text_path,
                    audio_path=wav_path,
                    start_time=float(sent["start_time"]),
                    end_time=float(sent["end_time"]),
                    sentence_text=str(sent.get("sentence_text", "")).strip(),
                    sentence_id=int(sent_id),
                    base_name=base_name,
                )
            )
    return entries, skipped


def save_sentence_labels(json_path: str, save_dir: str) -> int:
    """Write one ``.txt`` per sentence (reference preprocessing.py:105-122)."""
    os.makedirs(save_dir, exist_ok=True)
    metadata = _load_metadata(json_path)
    base_name = os.path.splitext(os.path.basename(json_path))[0]
    sentences = metadata["Sentence_info"]
    for sent in sentences:
        out = os.path.join(save_dir, f"{base_name}_sentence_{sent['ID']}.txt")
        with open(out, "w", encoding="utf-8") as f:
            f.write(sent["sentence_text"].strip() + "\n")
    return len(sentences)


def save_all_sentence_labels(json_folder: str, save_dir: str) -> int:
    total = 0
    for name in sorted(os.listdir(json_folder)):
        if name.endswith(".json"):
            total += save_sentence_labels(os.path.join(json_folder, name), save_dir)
    return total


def train_val_test_split(
    entries: list, val_frac: float = 0.05, test_frac: float = 0.05, seed: int = 42
) -> tuple[list, list, list]:
    """Deterministic 90/5/5 split (reference main.py:77-78 semantics; we use a
    seeded shuffle instead of sklearn)."""
    import random

    rng = random.Random(seed)
    shuffled = list(entries)
    rng.shuffle(shuffled)
    n = len(shuffled)
    n_test = max(1, int(round(n * test_frac))) if n else 0
    n_val = max(1, int(round(n * val_frac))) if n else 0
    test = shuffled[:n_test]
    val = shuffled[n_test : n_test + n_val]
    train = shuffled[n_test + n_val :]
    return train, val, test
