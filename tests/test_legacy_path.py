"""Legacy-v0 path: dataset reader, twin-CTC trainer, syllable vocab
(capability parity with reference 이전 버전/)."""

import os

import numpy as np
import pytest

from multimodal_av_model_tpu.config import AudioFrontendConfig
from multimodal_av_model_tpu.text.korean import KoreanSyllableVocab
from multimodal_av_model_tpu.train.legacy import (
    LegacyTrainer,
    load_legacy_sample,
    scan_legacy_root,
)


@pytest.fixture(scope="module")
def legacy_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("legacy")
    from multimodal_av_model_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(0)
    for i in range(2):
        d = root / f"sample_{i:03d}"
        for side in ("A", "B"):
            fdir = d / f"frames_{side}"
            os.makedirs(fdir)
            for t in range(4):
                np.save(str(fdir / f"{t:04d}.npy"),
                        rng.uniform(0, 255, size=(32, 32, 3)).astype(np.uint8))
            with open(d / f"gt_{side}.txt", "w", encoding="utf-8") as f:
                f.write("바나나" if side == "A" else "사과")
        write_wav(str(d / "mixed.wav"), rng.standard_normal(3200) * 0.1, 16000)
    return str(root)


def test_scan_and_load(legacy_root):
    dirs = scan_legacy_root(legacy_root)
    assert len(dirs) == 2
    vocab = KoreanSyllableVocab()
    sample = load_legacy_sample(dirs[0], vocab, image_size=24)
    assert sample["frames_A"].shape == (4, 24, 24, 3)
    assert sample["mel"].shape[-1] == 80
    assert vocab.indices_to_text(sample["label_A"].tolist()) == "바나나"


def test_legacy_trainer_overfits(legacy_root):
    import jax.numpy as jnp

    vocab = KoreanSyllableVocab()
    dirs = scan_legacy_root(legacy_root)
    samples = [load_legacy_sample(d, vocab, image_size=24) for d in dirs]
    Tm = min(s["mel"].shape[0] for s in samples)
    L = 4
    batch = {
        "frames_A": np.stack([s["frames_A"] for s in samples]),
        "frames_B": np.stack([s["frames_B"] for s in samples]),
        "mel": np.stack([s["mel"][:Tm] for s in samples]),
        "mel_lengths": np.full(2, Tm, np.int32),
        "label_A": np.stack([np.pad(s["label_A"], (0, L - len(s["label_A"])))
                             for s in samples]).astype(np.int32),
        "len_A": np.array([len(s["label_A"]) for s in samples], np.int32),
        "label_B": np.stack([np.pad(s["label_B"], (0, L - len(s["label_B"])))
                             for s in samples]).astype(np.int32),
        "len_B": np.array([len(s["label_B"]) for s in samples], np.int32),
    }
    # Tiny vocab projection for speed: remap labels into a small id space.
    used = sorted(set(batch["label_A"].ravel()) | set(batch["label_B"].ravel()))
    remap = {v: i + 1 for i, v in enumerate(used)}  # keep id 0 = blank
    for k in ("label_A", "label_B"):
        batch[k] = np.vectorize(lambda x: remap[x])(batch[k]).astype(np.int32)

    trainer = LegacyTrainer(vocab_size=len(used) + 2, hidden_dim=16)
    params, opt_state = trainer.init(0, batch)
    losses = []
    for _ in range(25):
        params, opt_state, loss = trainer.step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
