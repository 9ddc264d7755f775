"""Manifest builder over the real bundled AI-Hub metadata JSONs
(read from the reference mount) + split/sampler semantics."""

import os

import numpy as np
import pytest

from multimodal_av_model_tpu.data.manifest import (
    build_data_list,
    save_all_sentence_labels,
    speaker_id_of,
    train_val_test_split,
)
from multimodal_av_model_tpu.data.pairs import RandomPairSampler, generate_fixed_pairs


@pytest.fixture(scope="module")
def aihub_json_dir(reference_path):
    return os.path.join(reference_path, "input_texts")


def test_speaker_id_extraction():
    sid = speaker_id_of("/x/lip_J_1_M_03_C486_A_012_sentence_41.txt")
    assert sid == "lip_J_1_M_03_C486_A"


def test_build_data_list_reads_aihub_schema(aihub_json_dir, tmp_path):
    entries, skipped = build_data_list(
        aihub_json_dir, str(tmp_path), str(tmp_path), str(tmp_path),
        require_files=False,
    )
    # SURVEY.md §2 row 22: 12 JSONs × 37–49 sentences ≈ 517 utterances.
    assert len(entries) > 400
    assert not skipped
    e = entries[0]
    assert e.end_time > e.start_time
    assert e.sentence_text  # sentence text rides along
    assert e.audio_path.endswith(".wav")


def test_missing_files_are_skipped(aihub_json_dir, tmp_path):
    entries, skipped = build_data_list(
        aihub_json_dir, str(tmp_path), str(tmp_path), str(tmp_path),
        require_files=True,
    )
    assert entries == []
    assert len(skipped) > 400


def test_label_extraction_round_trip(aihub_json_dir, tmp_path):
    n = save_all_sentence_labels(aihub_json_dir, str(tmp_path))
    files = [f for f in os.listdir(tmp_path) if f.endswith(".txt")]
    assert len(files) == n > 400
    with open(os.path.join(tmp_path, sorted(files)[0]), encoding="utf-8") as f:
        assert f.read().strip()


def test_split_is_deterministic(aihub_json_dir, tmp_path):
    entries, _ = build_data_list(
        aihub_json_dir, str(tmp_path), str(tmp_path), str(tmp_path),
        require_files=False,
    )
    t1, v1, s1 = train_val_test_split(entries, seed=42)
    t2, v2, s2 = train_val_test_split(entries, seed=42)
    assert [e.text_path for e in t1] == [e.text_path for e in t2]
    assert len(t1) + len(v1) + len(s1) == len(entries)
    assert len(v1) > 0 and len(s1) > 0


def test_random_pair_sampler_rejects_same_speaker():
    # NOTE: the bundled corpus is a single speaker (all 12 JSONs share the id
    # lip_K_5_M_06_C920_A), so speaker-distinct pairing is impossible on it —
    # for the reference too.  Use synthetic multi-speaker entries here.
    from multimodal_av_model_tpu.data.manifest import SentenceEntry

    entries = [
        SentenceEntry(f"l_{s}_{i}.npy", f"lip_K_{s}_M_06_C920_A_00{i}_sentence_1.txt",
                      "a.wav", 0.0, 1.0)
        for s in range(4) for i in range(3)
    ]
    seen = []

    def record(s1, s2):
        seen.append((speaker_id_of(s1.text_path), speaker_id_of(s2.text_path)))
        return {}

    sampler = RandomPairSampler(entries, record, num_pairs_per_epoch=50)
    for _ in range(50):
        sampler.sample()
    assert len(seen) == 50
    assert all(a != b for a, b in seen)


def test_generate_fixed_pairs_seeded(aihub_json_dir, tmp_path):
    entries, _ = build_data_list(
        aihub_json_dir, str(tmp_path), str(tmp_path), str(tmp_path),
        require_files=False,
    )
    p1 = generate_fixed_pairs(entries, 20, seed=7)
    p2 = generate_fixed_pairs(entries, 20, seed=7)
    assert [(a.text_path, b.text_path) for a, b in p1] == \
           [(a.text_path, b.text_path) for a, b in p2]
