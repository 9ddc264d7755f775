"""Single-modality trainers (BASELINE configs 1-2): steps run, loss falls,
eval produces metrics."""

import os

import jax
import numpy as np
import pytest

from multimodal_av_model_tpu.text import CharTokenizer
from multimodal_av_model_tpu.train.single_modality import (
    make_audio_trainer,
    make_visual_trainer,
    synthetic_audio_batches,
    synthetic_visual_batches,
)
from test_models import tiny_config

VOCAB = os.path.join(os.path.dirname(__file__), "..", "assets", "tokenizer800.vocab")


@pytest.fixture(scope="module")
def tok():
    return CharTokenizer(VOCAB)


def test_audio_only_trainer(tok):
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.train.learning_rate = 3e-3
    trainer = make_audio_trainer(cfg, tok)
    batches = list(synthetic_audio_batches(tok, 2, 1, samples=3200, label_len=3))
    state = trainer.init_state(0, batches[0])
    losses = []
    for _ in range(12):
        state, loss = trainer.train_step(state, batches[0])
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    eval_loss, eval_wer, eval_cer = trainer.evaluate(batches, state, use_beam=False)
    assert np.isfinite(eval_loss) and eval_cer >= 0


def test_visual_only_trainer(tok):
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.train.learning_rate = 3e-3
    trainer = make_visual_trainer(cfg, tok)
    batches = list(synthetic_visual_batches(tok, 2, 1, frames=6, size=24, label_len=2))
    state = trainer.init_state(0, batches[0])
    losses = []
    for _ in range(12):
        state, loss = trainer.train_step(state, batches[0])
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    eval_loss, eval_wer, eval_cer = trainer.evaluate(batches, state, use_beam=True)
    assert np.isfinite(eval_loss)


def test_real_data_utterance_batches(tok, tmp_path):
    import numpy as np

    from multimodal_av_model_tpu.data.audio_io import write_wav
    from multimodal_av_model_tpu.data.manifest import SentenceEntry
    from multimodal_av_model_tpu.train.single_modality import utterance_batches

    rng = np.random.default_rng(0)
    entries = []
    for i in range(4):
        lip = str(tmp_path / f"l{i}.npy")
        np.save(lip, rng.uniform(0, 255, size=(6, 128, 128, 3)).astype(np.uint8))
        wav = str(tmp_path / f"a{i}.wav")
        write_wav(wav, rng.standard_normal(8000) * 0.1, 16000)
        txt = str(tmp_path / f"t{i}.txt")
        with open(txt, "w", encoding="utf-8") as f:
            f.write("가나")
        entries.append(SentenceEntry(lip, txt, wav, 0.1, 0.4, "가나", i, f"v{i}"))

    audio_batches = list(utterance_batches(entries, tok, "audio", 2,
                                           max_samples=8000, max_label_len=8))
    assert len(audio_batches) == 2
    b = audio_batches[0]
    assert b["inputs"].shape == (2, 8000)
    assert b["meta"][:, :4800].all() and not b["meta"][:, 4801:].any()  # 0.3 s
    assert b["label_lengths"].tolist() == [2, 2]

    vis_batches = list(utterance_batches(entries, tok, "visual", 2,
                                         max_frames=8, lip_size=32, max_label_len=8))
    b = vis_batches[0]
    assert b["inputs"].shape == (2, 8, 1, 32, 32)
    assert b["meta"].tolist() == [6, 6]


def test_lr_schedule_and_clip_apply_to_single_modality(tok):
    """train.lr_schedule / grad_clip_norm are TrainConfig knobs on every
    family: the single-modality optimizer must honor them (measured to
    matter: d192x6 audio CTC collapses to all-blank at constant 1e-3 but
    reaches CER 0.05 with warmup_cosine — benchmarks/quality_ceiling.py)."""
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.train.learning_rate = 3e-3
    cfg.train.lr_schedule = "warmup_cosine"
    cfg.train.warmup_steps = 4
    cfg.train.decay_steps = 16
    cfg.train.grad_clip_norm = 1.0
    trainer = make_audio_trainer(cfg, tok)
    batches = list(synthetic_audio_batches(tok, 2, 1, samples=3200, label_len=3))
    state = trainer.init_state(0, batches[0])
    p0 = np.asarray(
        next(iter(jax.tree.leaves(state["params"]))), np.float64).copy()
    state, loss0 = trainer.train_step(state, batches[0])
    p1 = np.asarray(next(iter(jax.tree.leaves(state["params"]))), np.float64)
    # warmup step 0 => lr 0: params must NOT move on the first step...
    assert float(loss0) > 0 and np.allclose(p0, p1)
    for _ in range(6):
        state, loss = trainer.train_step(state, batches[0])
    p2 = np.asarray(next(iter(jax.tree.leaves(state["params"]))), np.float64)
    # ...and must move once the schedule ramps.
    assert np.isfinite(float(loss)) and not np.allclose(p1, p2)
