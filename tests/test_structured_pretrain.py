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


def test_make_span_mask_properties():
    from multimodal_av_model_tpu.ops.ssl import make_span_mask

    rng = np.random.default_rng(0)
    m = make_span_mask(4, 50, mask_prob=0.1, span=5, rng=rng)
    assert m.shape == (4, 50) and m.dtype == bool
    assert (m.sum(axis=1) >= 2).all()          # min_masked guarantee
    # Masked positions come in runs (span expansion): at least one run >= 2.
    assert any((m[b, 1:] & m[b, :-1]).any() for b in range(4))


def test_masked_infonce_identity_beats_shuffled():
    from multimodal_av_model_tpu.ops.ssl import masked_infonce_loss

    rng = np.random.default_rng(0)
    B, T, D = 2, 20, 8
    targets = rng.standard_normal((B, T, D)).astype(np.float32)
    spans = np.zeros((B, T), bool)
    spans[:, 3:9] = True
    valid = np.ones((B, T), bool)
    good = float(masked_infonce_loss(targets * 5.0, targets, spans, valid))
    bad = float(masked_infonce_loss(
        rng.standard_normal((B, T, D)).astype(np.float32), targets, spans, valid))
    assert good < bad
    assert good < 0.1   # scaled-identity predictions ≈ one-hot softmax


def test_ssl_pretrainer_step_and_graftable_params(tok):
    from multimodal_av_model_tpu.train.ssl_pretrain import MaskedAudioPretrainer

    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.train.learning_rate = 1e-3
    src = StructuredPairSource(tok, seed=0, lip_size=24, label_len=(2, 4))
    spec = BucketSpec(16, 16 * 534, 8)
    batch = next(iter(bucketed_batches(
        (src.load_pair() for _ in range(2)), [spec], 2, drop_last=True)))

    ssl = MaskedAudioPretrainer(cfg)
    state = ssl.init_state(0, batch)
    # The SSL model's encoder subtree must be graft-compatible with the
    # flagship's audio_encoder (same flax naming), modulo the SSL-only
    # mask_embedding param (stripped by flagship_audio_params).
    from multimodal_av_model_tpu.train.ssl_pretrain import flagship_audio_params

    model = MultiSpeakerAVModel(cfg.model)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    av_state = trainer.init_state(0, batch)
    av_tree = jax.tree_util.tree_structure(
        jax.device_get(av_state.params)["audio_encoder"])
    ssl_tree = jax.tree_util.tree_structure(
        flagship_audio_params(jax.device_get(state["params"])))
    assert str(av_tree) == str(ssl_tree)

    before = jax.device_get(state["params"])
    out = ssl.fit(state, [batch, batch, batch], log_every=1000,
                  log_fn=lambda s: None)
    assert np.isfinite(out["last_loss"])
    after = jax.device_get(out["params"])
    moved = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                for a, b in zip(jax.tree.leaves(after["audio_encoder"]),
                                jax.tree.leaves(before["audio_encoder"])))
    assert moved > 0


def test_collect_frame_features_drops_pad(tok):
    out = {
        "contrast1": np.ones((1, 4, 3), np.float32),
        "mask_ds1": np.array([[1, 2, 0, 3]]),
    }
    feats, masks = collect_frame_features([out], speaker=1)
    assert feats.shape == (3, 3)
    np.testing.assert_array_equal(masks, [1, 2, 0])
    np.testing.assert_array_equal(overlap_vs_solo_labels(masks), [1, 0, 0])
