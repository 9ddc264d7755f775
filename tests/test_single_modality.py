"""Single-modality trainers (BASELINE configs 1-2): steps run, loss falls,
eval produces metrics."""

import os

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
