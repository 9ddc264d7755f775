"""Legacy-v0 sample-directory builder.

Capability of reference 이전 버전/data_preprocessing.py:30-96: pair up
utterances, overlay their audio into one mixture, and emit per-pair sample
directories in the layout the legacy trainer reads
(``sample_NNN/{frames_A,frames_B,mixed.wav,gt_A.txt,gt_B.txt}``,
reference 이전 버전/train_ctc_korea.py:22-54).

Differences: the reference round-trips through moviepy side-by-side video +
pydub overlay (cosmetic); here frames come straight from the lip-ROI ``.npy``
clips and the mixture is the framework's own peak-normalized sum
(data/mixing.py), so no media toolchain is needed.
"""

from __future__ import annotations

import itertools
import os

import numpy as np

from .audio_io import WavCache, write_wav
from .mixing import mix_pair


def build_pair_sample(
    s1, s2, out_dir: str, sample_rate: int = 16000, wavs: WavCache | None = None
) -> str:
    """Write one legacy sample dir for the utterance pair (s1, s2)."""
    wavs = wavs or WavCache(target_sr=sample_rate)
    os.makedirs(out_dir, exist_ok=True)
    a1 = wavs.load_segment(s1["audio_path"], s1["start_time"], s1["end_time"])
    a2 = wavs.load_segment(s2["audio_path"], s2["start_time"], s2["end_time"])
    mixed, _, _ = mix_pair(a1, a2)
    write_wav(os.path.join(out_dir, "mixed.wav"), mixed, sample_rate)

    for side, s in (("A", s1), ("B", s2)):
        frames_dir = os.path.join(out_dir, f"frames_{side}")
        os.makedirs(frames_dir, exist_ok=True)
        clip = np.load(s["lip_path"])
        for t in range(clip.shape[0]):
            np.save(os.path.join(frames_dir, f"{t:05d}.npy"), clip[t])
        text = getattr(s, "sentence_text", "") or ""
        if not text:
            with open(s["text_path"], encoding="utf-8") as f:
                text = f.read().strip()
        with open(os.path.join(out_dir, f"gt_{side}.txt"), "w", encoding="utf-8") as f:
            f.write(text + "\n")
    return out_dir


def build_all_pair_samples(
    entries, out_root: str, max_pairs: int | None = None, sample_rate: int = 16000
) -> list[str]:
    """All nC2 pairs (reference pairs every video with every other), capped at
    ``max_pairs``."""
    os.makedirs(out_root, exist_ok=True)
    wavs = WavCache(target_sr=sample_rate)
    dirs = []
    for idx, (s1, s2) in enumerate(itertools.combinations(entries, 2)):
        if max_pairs is not None and idx >= max_pairs:
            break
        out = os.path.join(out_root, f"sample_{idx:04d}")
        dirs.append(build_pair_sample(s1, s2, out, sample_rate, wavs))
    return dirs
