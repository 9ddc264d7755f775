"""End-to-end trainer tests: jitted step, eval path, checkpointing, freezing,
and an overfit-one-batch integration check (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_av_model_tpu.data import SyntheticPairSource, collate_pairs
from multimodal_av_model_tpu.data.collate import BucketSpec
from multimodal_av_model_tpu.models import AudioOnlyCTC, MultiSpeakerAVModel
from multimodal_av_model_tpu.ops.ctc import ctc_loss
from multimodal_av_model_tpu.text import CharTokenizer
from multimodal_av_model_tpu.train import (
    MultiSpeakerTrainer,
    graft_subtree,
    restore_checkpoint,
    save_checkpoint,
)
from test_models import tiny_config

import os

VOCAB = os.path.join(os.path.dirname(__file__), "..", "assets", "tokenizer800.vocab")


def tiny_batch(tok, B=2):
    src = SyntheticPairSource(
        tok, seed=0, video_frames=(4, 7), lip_size=24, label_len=(2, 5)
    )
    samples = [src.load_pair() for _ in range(B)]
    spec = BucketSpec(video_frames=8, audio_samples=4272, label_len=8)
    return collate_pairs(samples, spec)


@pytest.fixture(scope="module")
def tok():
    return CharTokenizer(VOCAB)


@pytest.fixture(scope="module")
def setup(tok):
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"  # faster CPU compile
    cfg.train.log_every = 1000
    model = MultiSpeakerAVModel(cfg.model)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    batch = tiny_batch(tok)
    # NOTE: train_step donates its input state — callers must rebind and each
    # test makes a fresh state (init is cheap; the step compile is cached).
    return cfg, trainer, batch, lambda: trainer.init_state(0, batch)


def test_train_step_runs_and_updates(setup):
    _, trainer, batch, make_state = setup
    state = make_state()
    before = jax.device_get(state.params)
    placed = trainer._place(batch)
    new_state, metrics = trainer.train_step(state, placed)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    # Params actually moved.
    diff = jax.tree.reduce(
        lambda acc, x: acc + float(np.abs(x).sum()),
        jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                     jax.device_get(new_state.params), before),
        0.0,
    )
    assert diff > 0


def test_loss_decreases_over_steps(setup):
    _, trainer, batch, make_state = setup
    state = make_state()
    losses = []
    for _ in range(8):
        state, metrics = trainer.train_step(state, trainer._place(batch))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_evaluate_produces_metrics(setup):
    _, trainer, batch, make_state = setup
    state = make_state()
    loss, avg_wer, avg_cer, per = trainer.evaluate([batch], state, use_beam=True)
    assert np.isfinite(loss)
    assert 0 <= avg_wer
    assert 0 <= avg_cer
    assert set(per) == {"wer1", "wer2", "jer"}
    assert 0 <= per["jer"]


def test_frozen_prefixes_keep_params(tok):
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"
    model = MultiSpeakerAVModel(cfg.model)
    trainer = MultiSpeakerTrainer(cfg, model, tok,
                                  frozen_prefixes=("visual_encoder",))
    batch = tiny_batch(tok)
    state = trainer.init_state(0, batch)
    before_frozen = jax.device_get(state.params["visual_encoder"])
    before_live = jax.device_get(state.params["decoder"])
    state, _ = trainer.train_step(state, trainer._place(batch))
    after_frozen = jax.device_get(state.params["visual_encoder"])
    after_live = jax.device_get(state.params["decoder"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), before_frozen, after_frozen
    )
    moved = jax.tree.reduce(
        lambda acc, x: acc + float(np.abs(x).sum()),
        jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), before_live, after_live),
        0.0,
    )
    assert moved > 0


def test_checkpoint_roundtrip_and_graft(tmp_path, setup):
    _, trainer, batch, make_state = setup
    state = make_state()
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"params": jax.device_get(state.params), "epoch": 3})
    restored = restore_checkpoint(path)
    assert restored["epoch"] == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored["params"], jax.device_get(state.params),
    )
    # Partial restore: graft only the visual encoder into fresh params
    # (reference main.py:94-103 behaviour).
    fresh = jax.device_get(state.params)
    fresh2 = graft_subtree(fresh, restored["params"], ["visual_encoder"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        fresh2["visual_encoder"], restored["params"]["visual_encoder"],
    )


def test_contrastive_only_pretrain_mode(tok):
    """BASELINE config 4: contrastive-only AV-alignment pretraining — the CTC
    term must vanish and the step must still train."""
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"
    cfg.train.contrastive_only = True
    model = MultiSpeakerAVModel(cfg.model)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    batch = tiny_batch(tok)
    state = trainer.init_state(0, batch)
    state, metrics = trainer.train_step(state, trainer._place(batch))
    assert float(metrics["ctc1"]) == 0.0 and float(metrics["ctc2"]) == 0.0
    assert np.isfinite(float(metrics["contrast1"]))
    assert float(metrics["loss"]) == pytest.approx(
        (float(metrics["contrast1"]) + float(metrics["contrast2"])) / 2, rel=1e-5
    )
    assert float(metrics["grad_norm"]) > 0


def test_resume_restores_optimizer_structure(tmp_path, setup):
    """Regression: a structure-free restore returns raw dicts whose opt_state
    breaks ``optimizer.update`` on the first resumed step.  Template restore
    must yield a TrainState the jitted train step accepts."""
    _, trainer, batch, make_state = setup
    state = make_state()
    state, _ = trainer.train_step(state, trainer._place(batch))
    path = str(tmp_path / "resume.ckpt")
    save_checkpoint(path, {"state": jax.device_get(state), "epoch": 1})

    fresh = make_state()
    restored = restore_checkpoint(
        path, template={"state": jax.device_get(fresh), "epoch": 0}
    )
    assert restored["epoch"] == 1
    resumed = restored["state"].replace(rng=fresh.rng)
    # The restored state must drive a train step without structure errors.
    resumed, metrics = trainer.train_step(resumed, trainer._place(batch))
    assert np.isfinite(float(metrics["loss"]))


def test_av_model_overfits_to_low_cer(tok):
    """Full-stack learning check: the two-speaker AV model must overfit one
    tiny batch until greedy decode reproduces the labels (CER → low).  This
    exercises CTC credit assignment through fusion, both encoders, and the
    contrastive branch together."""
    from multimodal_av_model_tpu.ops.metrics import cer

    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"
    cfg.train.learning_rate = 3e-3
    cfg.train.audio_learning_rate = 3e-3
    model = MultiSpeakerAVModel(cfg.model)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    batch = tiny_batch(tok)
    # Restrict labels to a 20-token subset: the tiny (16–48 dim) model can
    # then separate classes within a test-budget number of steps.
    batch["text1"] = (5 + (batch["text1"] % 20)).astype(np.int32)
    batch["text2"] = (5 + (batch["text2"] % 20)).astype(np.int32)
    state = trainer.init_state(0, batch)
    for _ in range(300):
        state, metrics = trainer.train_step(state, trainer._place(batch))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < 1.0  # from ~18 at init

    _, _, eval_cer, _ = trainer.evaluate([batch], state, use_beam=False)
    assert eval_cer < 0.2, eval_cer  # reaches 0.0 at 300 steps


def test_audio_only_overfits_one_batch(tok):
    """The minimum end-to-end learning check: audio-only CTC must overfit a
    single tiny batch (BASELINE config 1)."""
    import optax

    cfg = tiny_config()
    V = 40
    cfg.model.decoder.vocab_size = V
    rng = np.random.default_rng(0)
    B, S, L = 2, 3200, 4
    audio = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(4, V, size=(B, L)).astype(np.int32))
    label_lengths = jnp.full((B,), L, jnp.int32)

    model = AudioOnlyCTC(cfg.model)
    params = model.init(jax.random.PRNGKey(0), audio)["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            lp, il = model.apply({"params": p}, audio)
            return ctc_loss(lp, labels, il, label_lengths, blank_id=3)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(60):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    final = float(loss)
    assert np.isfinite(final)
    assert final < first * 0.5, (first, final)


def test_audio_partial_unfreeze_labels(tok):
    """reference unfreeze_middle_layers semantics (main.py:26-31): with
    audio_trainable_layers set, only those conformer blocks stay trainable;
    all other audio-encoder params freeze."""
    from flax.traverse_util import flatten_dict

    from multimodal_av_model_tpu.train.trainer import label_params

    params = {
        "audio_encoder": {
            "block0": {"k": np.zeros(1)},
            "block1": {"k": np.zeros(1)},
            "block2": {"k": np.zeros(1)},
            "subsample": {"k": np.zeros(1)},
            "out_proj": {"k": np.zeros(1)},
        },
        "decoder": {"head": {"k": np.zeros(1)}},
    }
    labels = flatten_dict(label_params(params, audio_trainable_layers=(1, 2)))
    assert labels[("audio_encoder", "block0", "k")] == "frozen"
    assert labels[("audio_encoder", "block1", "k")] == "audio"
    assert labels[("audio_encoder", "block2", "k")] == "audio"
    assert labels[("audio_encoder", "subsample", "k")] == "frozen"
    assert labels[("audio_encoder", "out_proj", "k")] == "frozen"
    assert labels[("decoder", "head", "k")] == "base"
