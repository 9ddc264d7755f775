"""Structured synthetic pairs + contrastive-only pretraining machinery
(the wav2vec2-substitute demonstration, BASELINE config 4).  The full A/B
experiment lives in benchmarks/pretrain_ablation.py; these tests cover the
components fast."""

import os

import numpy as np
import pytest

import jax

from multimodal_av_model_tpu.data.collate import BucketSpec
from multimodal_av_model_tpu.data.pipeline import bucketed_batches
from multimodal_av_model_tpu.data.structured import StructuredPairSource
from multimodal_av_model_tpu.models import MultiSpeakerAVModel
from multimodal_av_model_tpu.text import CharTokenizer
from multimodal_av_model_tpu.train import MultiSpeakerTrainer
from multimodal_av_model_tpu.train.probe import (
    collect_frame_features,
    nearest_centroid_probe,
    overlap_vs_solo_labels,
)
from test_models import tiny_config

VOCAB = os.path.join(os.path.dirname(__file__), "..", "assets", "tokenizer800.vocab")


@pytest.fixture(scope="module")
def tok():
    return CharTokenizer(VOCAB)


def test_structured_pair_shapes(tok):
    src = StructuredPairSource(tok, seed=0, lip_size=24)
    pair = src.load_pair()
    T1 = pair["lip1_len"]
    assert pair["lip1"].shape == (T1, 1, 24, 24)
    assert T1 % src.frames_per_token == 0
    L1 = len(pair["label1"])
    assert T1 == L1 * src.frames_per_token
    # Mixture and masks share the joint length; mask codes within {0,1,2,3}.
    assert pair["audio"].shape == pair["mask1"].shape == pair["mask2"].shape
    assert set(np.unique(pair["mask1"])) <= {0, 1, 2, 3}
    # Audio is tones, not silence.
    assert np.abs(pair["audio"]).max() > 0.1


def test_contrastive_only_pretraining_updates_audio_only(tok):
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"
    cfg.train.contrastive_only = True
    src = StructuredPairSource(tok, seed=0, lip_size=24, label_len=(2, 4))
    spec = BucketSpec(16, 16 * 534, 8)
    batch = next(iter(bucketed_batches(
        (src.load_pair() for _ in range(2)), [spec], 2, drop_last=True)))

    model = MultiSpeakerAVModel(cfg.model)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    state = trainer.init_state(0, batch)
    before = jax.device_get(state.params)
    for _ in range(2):
        state, metrics = trainer.train_step(state, trainer._place(batch))
    assert np.isfinite(float(metrics["loss"]))
    after = jax.device_get(state.params)

    def delta(tree_a, tree_b):
        return sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                   for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)))

    assert delta(after["audio_encoder"], before["audio_encoder"]) > 0
    assert delta(after["contrastive_proj"], before["contrastive_proj"]) > 0
    # No CTC term → no gradient reaches decoder or fusion.
    assert delta(after["decoder"], before["decoder"]) == 0
    assert delta(after["fusion"], before["fusion"]) == 0


def test_probe_separates_separable_features():
    rng = np.random.default_rng(0)
    f1 = rng.standard_normal((200, 8)) + np.array([3.0] + [0.0] * 7)
    f0 = rng.standard_normal((200, 8)) - np.array([3.0] + [0.0] * 7)
    feats = np.concatenate([f1, f0])
    labels = np.concatenate([np.ones(200, np.int32), np.zeros(200, np.int32)])
    acc = nearest_centroid_probe(feats, labels)
    assert acc > 0.9
    # And chance-level on shuffled labels.
    acc_sh = nearest_centroid_probe(feats, rng.permutation(labels))
    assert 0.3 < acc_sh < 0.7


def test_collect_frame_features_drops_pad(tok):
    out = {
        "contrast1": np.ones((1, 4, 3), np.float32),
        "mask_ds1": np.array([[1, 2, 0, 3]]),
    }
    feats, masks = collect_frame_features([out], speaker=1)
    assert feats.shape == (3, 3)
    np.testing.assert_array_equal(masks, [1, 2, 0])
    np.testing.assert_array_equal(overlap_vs_solo_labels(masks), [1, 0, 0])
