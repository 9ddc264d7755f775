"""Round-2 regression tests: default-config (BatchNorm) single-modality
training, flush-batch valid weighting, NaN guards in the loops, checkpoint
best-metric persistence across resume, float-WAV decode, and the
environment-self-sufficient multi-chip dryrun hook."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from multimodal_av_model_tpu.config import Config
from multimodal_av_model_tpu.data import SyntheticPairSource, collate_pairs
from multimodal_av_model_tpu.data.audio_io import read_wav
from multimodal_av_model_tpu.data.collate import BucketSpec
from multimodal_av_model_tpu.data.pipeline import bucketed_batches
from multimodal_av_model_tpu.models import MultiSpeakerAVModel
from multimodal_av_model_tpu.parallel import pad_batch_to_multiple
from multimodal_av_model_tpu.text import CharTokenizer
from multimodal_av_model_tpu.train import MultiSpeakerTrainer
from multimodal_av_model_tpu.train.checkpoints import CheckpointManager, restore_checkpoint
from multimodal_av_model_tpu.train.profiling import NonFiniteLossError
from multimodal_av_model_tpu.train.single_modality import (
    make_visual_trainer,
    synthetic_visual_batches,
)
from test_models import tiny_config

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VOCAB = os.path.join(REPO_ROOT, "assets", "tokenizer800.vocab")


@pytest.fixture(scope="module")
def tok():
    return CharTokenizer(VOCAB)


# -- default-config (BatchNorm) families --------------------------------------

def test_visual_trainer_default_batch_norm(tok):
    """The DEFAULT visual config uses norm='batch' (reference parity,
    model/encoder.py:57-75); the trainer must thread batch_stats through
    apply (round-1 crash: flax ScopeCollectionNotFound)."""
    assert Config().model.visual.norm == "batch"  # guard: default unchanged
    cfg = tiny_config()
    cfg.model.visual.norm = "batch"
    cfg.model.decoder.vocab_size = tok.vocab_size
    trainer = make_visual_trainer(cfg, tok)
    batches = list(synthetic_visual_batches(tok, 2, 1, frames=6, size=24, label_len=2))
    state = trainer.init_state(0, batches[0])
    assert state["batch_stats"], "BatchNorm model must carry batch_stats"
    before = {k: np.asarray(v).copy()
              for k, v in _flatten(state["batch_stats"]).items()}
    for _ in range(3):
        state, loss = trainer.train_step(state, batches[0])
    assert np.isfinite(float(loss))
    after = _flatten(state["batch_stats"])
    moved = any(np.abs(np.asarray(after[k]) - before[k]).max() > 0 for k in before)
    assert moved, "running batch statistics must update in train mode"
    eval_loss, _, _ = trainer.evaluate(batches, state, use_beam=False)
    assert np.isfinite(eval_loss)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}"))
    else:
        out[prefix] = tree
    return out


def test_family_cli_default_norm(tok, tmp_path, monkeypatch):
    """`main.py --family=visual --synthetic` trains at the default norm
    (batch) — only sizes are shrunk for test speed (round-1 weak #2)."""
    from multimodal_av_model_tpu.main import main

    monkeypatch.chdir(tmp_path)
    main([
        "--family=visual", "--synthetic",
        "data.num_pairs_per_epoch=4", "data.eval_pairs=2",
        "train.batch_size=2", "train.eval_batch_size=2", "train.max_epochs=1",
        "model.visual.frontend_channels=8", "model.visual.resnet_layers=(1,1,1,1)",
        "model.visual.resnet_channels=(8,12,16,24)", "model.visual.output_dim=24",
        "model.decoder.input_dim=24",
        f"data.vocab_path={VOCAB}",
    ])


# -- flush-batch valid weighting ----------------------------------------------

@pytest.fixture(scope="module")
def av_setup(tok):
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"
    model = MultiSpeakerAVModel(cfg.model)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    return cfg, trainer


def _pair_samples(tok, n):
    src = SyntheticPairSource(tok, seed=3, video_frames=(4, 7), lip_size=24,
                              label_len=(2, 5))
    return [src.load_pair() for _ in range(n)]


def test_flush_batch_loss_matches_unpadded(tok, av_setup):
    """A flush batch (3 real rows duplicated to 4, valid=[1,1,1,0]) must yield
    the same eval CTC/contrastive losses as the unpadded 3-row batch."""
    import jax

    _, trainer = av_setup
    samples = _pair_samples(tok, 3)
    spec = BucketSpec(video_frames=8, audio_samples=4272, label_len=8)

    flush = list(bucketed_batches(iter(samples), [spec], batch_size=4))[0]
    assert int(flush["num_real"]) == 3
    np.testing.assert_array_equal(flush["valid"], [1, 1, 1, 0])
    plain = collate_pairs(samples, spec)

    state = trainer.init_state(0, plain)

    def losses(batch):
        batch = {k: v for k, v in batch.items() if k != "num_real"}
        _, (metrics, _, _) = trainer._losses(
            state.params, state.batch_stats, batch, state.rng, False)
        return {k: float(v) for k, v in metrics.items()}

    m_flush, m_plain = losses(flush), losses(plain)
    for key in ("loss", "ctc1", "ctc2", "contrast1", "contrast2"):
        assert m_flush[key] == pytest.approx(m_plain[key], rel=1e-5), key


def test_train_epoch_respects_valid(tok, av_setup):
    """Gradients from a flush batch equal gradients from the unpadded batch
    (padding rows contribute zero)."""
    import jax

    _, trainer = av_setup
    samples = _pair_samples(tok, 3)
    spec = BucketSpec(video_frames=8, audio_samples=4272, label_len=8)
    flush = list(bucketed_batches(iter(samples), [spec], batch_size=4))[0]
    plain = collate_pairs(samples, spec)
    state = trainer.init_state(0, plain)

    def grads(batch):
        batch = {k: v for k, v in batch.items() if k != "num_real"}
        g = jax.grad(lambda p: trainer._losses(
            p, state.batch_stats, batch, state.rng, False)[0])(state.params)
        return jax.device_get(g)

    g_flush, g_plain = grads(flush), grads(plain)
    flat_f, flat_p = _flatten(g_flush), _flatten(g_plain)
    worst = max(float(np.abs(flat_f[k] - flat_p[k]).max()) for k in flat_f)
    assert worst < 1e-5, f"max grad diff {worst}"


def test_pad_batch_to_multiple_sets_valid():
    batch = {"x": np.ones((3, 2), np.float32), "valid": np.ones((3,), np.float32)}
    out = pad_batch_to_multiple(batch, 4)
    np.testing.assert_array_equal(out["valid"], [1, 1, 1, 0])
    assert int(out["num_real"]) == 3


def test_frozen_visual_trunk_stops_gradient(tok, av_setup):
    """With the visual trunk frozen the model cuts its gradient at the
    boundary (XLA then drops the whole visual backward — the trunk dominates
    step FLOPs); the loss must be unchanged and visual grads exactly zero."""
    import jax

    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer

    cfg, base_trainer = av_setup
    samples = _pair_samples(tok, 2)
    spec = BucketSpec(video_frames=8, audio_samples=4272, label_len=8)
    batch = collate_pairs(samples, spec)
    frozen = MultiSpeakerTrainer(cfg, base_trainer.model, tok,
                                 frozen_prefixes=("visual_encoder",))
    state = base_trainer.init_state(0, batch)
    clean = {k: v for k, v in batch.items() if k != "num_real"}

    loss_base = float(base_trainer._losses(
        state.params, state.batch_stats, clean, state.rng, False)[0])
    loss_frozen = float(frozen._losses(
        state.params, state.batch_stats, clean, state.rng, False)[0])
    assert loss_base == pytest.approx(loss_frozen, rel=1e-6)

    g = jax.grad(lambda p: frozen._losses(
        p, state.batch_stats, clean, state.rng, False)[0])(state.params)
    vis = jax.tree.leaves(jax.device_get(g)["visual_encoder"])
    assert all(np.all(np.asarray(x) == 0) for x in vis)
    aud = jax.tree.leaves(jax.device_get(g)["audio_encoder"])
    assert any(np.abs(np.asarray(x)).sum() > 0 for x in aud)


# -- NaN guard wiring ----------------------------------------------------------

def test_train_epoch_raises_on_nan(tok, av_setup):
    _, trainer = av_setup
    samples = _pair_samples(tok, 2)
    spec = BucketSpec(video_frames=8, audio_samples=4272, label_len=8)
    batch = collate_pairs(samples, spec)
    state = trainer.init_state(0, batch)
    bad = dict(batch)
    bad["audio"] = batch["audio"].copy()
    bad["audio"][0, :10] = np.nan
    with pytest.raises(NonFiniteLossError):
        trainer.train_epoch([bad], state=state, log_every=1000, log_fn=lambda s: None)


def test_single_modality_fit_raises_on_nan(tok):
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.train.max_epochs = 1
    trainer = make_visual_trainer(cfg, tok)
    batches = list(synthetic_visual_batches(tok, 2, 1, frames=6, size=24, label_len=2))
    bad = dict(batches[0])
    bad["inputs"] = batches[0]["inputs"].copy()
    bad["inputs"][0] = np.nan
    state = trainer.init_state(0, batches[0])
    with pytest.raises(NonFiniteLossError):
        trainer.fit(state, lambda: [bad], lambda: batches, log_fn=lambda s: None)


# -- checkpoint best persistence -------------------------------------------------

def test_checkpoint_best_survives_reconstruction(tmp_path):
    d = str(tmp_path / "ckpt")
    m1 = CheckpointManager(d)
    good = {"v": np.float32(1.0)}
    worse = {"v": np.float32(2.0)}
    saved = m1.on_epoch_end(good, eval_loss=1.0, eval_wer=0.5)
    assert saved["best_wer"] and saved["best_loss"]

    # A resumed run constructs a fresh manager over the same directory.
    m2 = CheckpointManager(d)
    saved = m2.on_epoch_end(worse, eval_loss=2.0, eval_wer=0.9)
    assert not saved["best_wer"] and not saved["best_loss"]
    assert float(restore_checkpoint(m2.best_wer)["v"]) == 1.0
    assert float(restore_checkpoint(m2.best_loss)["v"]) == 1.0

    saved = m2.on_epoch_end(good, eval_loss=0.5, eval_wer=0.4)
    assert saved["best_wer"] and saved["best_loss"]


# -- float WAV decode ------------------------------------------------------------

def _write_float32_wav(path, audio, sr=16000):
    data = np.asarray(audio, "<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, sr, sr * 4, 4, 32)  # IEEE float mono
    size = 4 + (8 + len(fmt)) + (8 + len(data))
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", size) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        f.write(b"data" + struct.pack("<I", len(data)) + data)


def test_float32_wav_decodes_exactly(tmp_path):
    """Round-1 weak #7: a float32 WAV decoded as int32 is garbage; the manual
    RIFF fallback must decode it bit-exactly."""
    path = str(tmp_path / "f32.wav")
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(1600) * 0.3).astype(np.float32)
    _write_float32_wav(path, audio)
    decoded, sr = read_wav(path)
    assert sr == 16000
    np.testing.assert_array_equal(decoded, audio)


def test_pcm16_wav_still_decodes(tmp_path):
    from multimodal_av_model_tpu.data.audio_io import write_wav

    path = str(tmp_path / "pcm.wav")
    audio = np.linspace(-0.5, 0.5, 800, dtype=np.float32)
    write_wav(path, audio)
    decoded, sr = read_wav(path)
    assert sr == 16000
    assert np.abs(decoded - audio).max() < 1e-3


# -- environment-self-sufficient dryrun hook --------------------------------------

@pytest.mark.slow
def test_dryrun_multichip_clean_env():
    """The driver hook must succeed with NO caller-supplied JAX/XLA env vars
    (round-1 failure MULTICHIP_r01: ok=false)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(2):" in proc.stdout
