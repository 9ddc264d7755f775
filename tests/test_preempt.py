"""Preemption-safe training + async checkpointing (train/preempt.py,
train/checkpoints.py AsyncCheckpointer).

The reference has no preemption handling (a SIGTERM mid-epoch loses the
epoch, reference main.py:158-192) and writes checkpoints synchronously on
the train thread.  These tests cover: the signal→flag protocol, the
background checkpoint writer (equivalence with sync writes, error
surfacing), and the full fit-loop path — a real SIGTERM delivered mid-epoch
must produce a resumable ``last.ckpt`` and a clean return.
"""

import os
import signal

import numpy as np
import pytest

import jax

from multimodal_av_model_tpu.data import SyntheticPairSource, collate_pairs
from multimodal_av_model_tpu.data.collate import BucketSpec
from multimodal_av_model_tpu.models import MultiSpeakerAVModel
from multimodal_av_model_tpu.text import CharTokenizer
from multimodal_av_model_tpu.train import MultiSpeakerTrainer, restore_checkpoint
from multimodal_av_model_tpu.train.checkpoints import (
    AsyncCheckpointer,
    CheckpointManager,
)
from multimodal_av_model_tpu.train.preempt import GracefulShutdown
from test_models import tiny_config

VOCAB = os.path.join(os.path.dirname(__file__), "..", "assets", "tokenizer800.vocab")


def test_graceful_shutdown_catches_sigterm_and_restores_handler():
    prior = signal.getsignal(signal.SIGTERM)
    with GracefulShutdown() as stop:
        assert not stop.requested
        os.kill(os.getpid(), signal.SIGTERM)  # delivered synchronously (CPython)
        assert stop.requested
    assert signal.getsignal(signal.SIGTERM) is prior


def test_graceful_shutdown_disabled_is_inert():
    prior = signal.getsignal(signal.SIGINT)
    with GracefulShutdown(enable=False) as stop:
        assert signal.getsignal(signal.SIGINT) is prior
        stop.request()
        assert stop.requested


def test_async_checkpointer_matches_sync(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": np.float32(2.5)}}
    ck = AsyncCheckpointer()
    ck.save(tree, [str(tmp_path / "one.ckpt"), str(tmp_path / "two.ckpt")])
    ck.close()
    for name in ("one.ckpt", "two.ckpt"):
        got = restore_checkpoint(str(tmp_path / name))
        np.testing.assert_array_equal(got["a"], tree["a"])
        assert float(got["b"]["c"]) == 2.5


def test_async_checkpointer_surfaces_write_errors(tmp_path):
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file, not directory")
    ck = AsyncCheckpointer()
    ck.save({"x": np.zeros(2)}, [str(blocker / "ckpt")])
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        ck.wait()


def test_manager_async_rolling_policy(tmp_path):
    mgr = CheckpointManager(str(tmp_path), async_io=True)
    t1 = {"state": {"w": np.ones(3)}, "epoch": 1}
    t2 = {"state": {"w": np.full(3, 2.0)}, "epoch": 2}
    saved = mgr.on_epoch_end(t1, eval_loss=1.0, eval_wer=0.5)
    assert saved["best_wer"] and saved["best_loss"]
    saved = mgr.on_epoch_end(t2, eval_loss=2.0, eval_wer=0.9)  # worse: last only
    assert not saved["best_wer"] and not saved["best_loss"]
    mgr.wait()
    last = restore_checkpoint(str(tmp_path / "last.ckpt"))
    best = restore_checkpoint(str(tmp_path / "best_wer.ckpt"))
    np.testing.assert_array_equal(last["state"]["w"], t2["state"]["w"])
    np.testing.assert_array_equal(best["state"]["w"], t1["state"]["w"])


@pytest.fixture(scope="module")
def tok():
    return CharTokenizer(VOCAB)


def _tiny_batch(tok, B=2):
    src = SyntheticPairSource(
        tok, seed=0, video_frames=(4, 7), lip_size=24, label_len=(2, 5))
    samples = [src.load_pair() for _ in range(B)]
    spec = BucketSpec(video_frames=8, audio_samples=4272, label_len=8)
    return collate_pairs(samples, spec)


def test_async_dispatch_matches_blocking_loop(tok):
    """train.async_dispatch changes WHEN metrics are read back, never what
    is computed: same data + seed gives identical epoch totals."""
    batch = _tiny_batch(tok)
    totals = {}
    for deferred in (False, True):
        cfg = tiny_config()
        cfg.model.decoder.vocab_size = tok.vocab_size
        cfg.model.fusion.temporal_model = "transformer"
        cfg.train.async_dispatch = deferred
        trainer = MultiSpeakerTrainer(cfg, MultiSpeakerAVModel(cfg.model), tok)
        state = trainer.init_state(0, batch)
        _, mean_loss, _ = trainer.train_epoch(
            [batch] * 4, state=state, log_every=3, log_fn=lambda s: None)
        totals[deferred] = mean_loss
    assert totals[True] == pytest.approx(totals[False], rel=1e-5)


def _audio_setup(tok):
    from multimodal_av_model_tpu.train.single_modality import (
        synthetic_audio_batches,
    )

    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    batches = list(synthetic_audio_batches(tok, 2, 2, samples=3200, label_len=3))
    return cfg, batches


def test_single_modality_async_dispatch_matches_blocking(tok):
    """SingleModalityTrainer.fit: deferred metric folding logs the same
    epoch train_loss as the blocking per-step readback."""
    from multimodal_av_model_tpu.train.single_modality import make_audio_trainer

    losses = {}
    for deferred in (False, True):
        cfg, batches = _audio_setup(tok)
        cfg.train.async_dispatch = deferred
        cfg.train.max_epochs = 1
        cfg.train.checkpoint_dir = ""
        trainer = make_audio_trainer(cfg, tok)
        state = trainer.init_state(0, batches[0])
        lines = []
        trainer.fit(state, lambda: iter(batches), lambda: iter(batches[:1]),
                    log_fn=lines.append)
        row = [ln for ln in lines if ln.startswith("[epoch 1]")]
        assert row, lines
        losses[deferred] = float(row[0].split("train_loss=")[1].split()[0])
    assert losses[True] == pytest.approx(losses[False], rel=1e-4)


def test_single_modality_fit_sigterm_saves_checkpoint(tok, tmp_path):
    """A SIGTERM between steps of epoch 1 → fit breaks at the batch
    boundary, saves last.ckpt as epoch 0 (resume redoes the epoch), and
    never reaches eval/epoch logging."""
    from multimodal_av_model_tpu.train.single_modality import make_audio_trainer

    cfg, batches = _audio_setup(tok)
    cfg.train.max_epochs = 3
    cfg.train.checkpoint_dir = str(tmp_path)
    trainer = make_audio_trainer(cfg, tok)
    state = trainer.init_state(0, batches[0])

    def train_factory():
        yield batches[0]
        os.kill(os.getpid(), signal.SIGTERM)
        yield batches[1]  # flag is polled before this batch trains

    lines = []
    trainer.fit(state, train_factory, lambda: iter(batches[:1]),
                log_fn=lines.append)
    assert any(ln.startswith("preempted:") for ln in lines), lines
    assert not any(ln.startswith("[epoch") for ln in lines)
    payload = restore_checkpoint(str(tmp_path / "last.ckpt"))
    assert int(payload["epoch"]) == 0
    assert "params" in payload["state"]


def test_ssl_fit_polls_stop_flag(tok):
    """MaskedAudioPretrainer.fit breaks at the step boundary once the
    preemption flag is set: with a pre-set flag and a poisoned batch
    iterator, no step runs and the state passes through unchanged."""
    from multimodal_av_model_tpu.train.ssl_pretrain import MaskedAudioPretrainer

    cfg = tiny_config()
    ssl = MaskedAudioPretrainer(cfg)
    stop = GracefulShutdown(enable=False)
    stop.request()

    def poisoned():
        yield {"audio": None, "mask1": None}  # would raise if ever trained

    state = {"params": {"w": np.ones(2)}, "opt_state": (), "key": 0}
    out = ssl.fit(state, poisoned(), stop=stop)
    assert out["last_loss"] is None
    np.testing.assert_array_equal(out["params"]["w"], state["params"]["w"])


def test_fit_sigterm_saves_resumable_checkpoint(tok, tmp_path):
    """A real SIGTERM mid-epoch 1 → fit returns cleanly, last.ckpt holds a
    post-step snapshot at epoch 0, and resume redoes epoch 1."""
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"
    cfg.train.checkpoint_dir = str(tmp_path)
    cfg.train.max_epochs = 3
    cfg.train.log_every = 1
    model = MultiSpeakerAVModel(cfg.model)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    batch = _tiny_batch(tok)
    state = trainer.init_state(0, batch)

    fired = []

    def log_fn(msg):
        # First per-batch log line of epoch 1: deliver a real SIGTERM.
        if not fired and msg.startswith("[batch"):
            fired.append(msg)
            os.kill(os.getpid(), signal.SIGTERM)

    def train_factory():
        return (batch for _ in range(50))  # far more steps than run

    state = trainer.fit(state, train_factory, lambda: iter([batch]),
                        log_fn=log_fn, start_epoch=1)
    assert fired, "per-batch log (and the signal) never fired"
    payload = restore_checkpoint(str(tmp_path / "last.ckpt"))
    # Saved as epoch 0 so the standard resume (epoch+1) redoes epoch 1.
    assert int(payload["epoch"]) == 0
    # No eval ran, so no best checkpoints and no eval log rows.
    assert not os.path.exists(tmp_path / "best_wer.ckpt")
    # The snapshot is post-step: params differ from a fresh init.
    fresh = jax.device_get(trainer.init_state(0, batch).params)
    saved_params = payload["state"]["params"]
    diff = jax.tree.reduce(
        lambda acc, x: acc + float(np.abs(x).sum()),
        jax.tree.map(lambda a, b: np.asarray(a, np.float32)
                     - np.asarray(b, np.float32),
                     saved_params, jax.tree.map(np.asarray, fresh)),
        0.0,
    )
    assert diff > 0
