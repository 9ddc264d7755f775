"""Round-3 regression tests: early-stop persistence across resume, SSL
pretraining rigor (per-step dropout keys, full-state resume), the greedy
decode branch, static-shape real-data single-modality batches, the
multi-host initialize ordering, and the per-process batch helpers."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_av_model_tpu.config import Config
from multimodal_av_model_tpu.text import CharTokenizer
from multimodal_av_model_tpu.train import MultiSpeakerTrainer
from multimodal_av_model_tpu.train.checkpoints import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from test_models import tiny_config

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VOCAB = os.path.join(REPO_ROOT, "assets", "tokenizer800.vocab")


@pytest.fixture(scope="module")
def tok():
    return CharTokenizer(VOCAB)


# -- early-stop persistence (VERDICT r2 weak #4) -------------------------------

class _StubTrainer(MultiSpeakerTrainer):
    """fit() harness with train/eval stubbed: exercises ONLY the epoch loop,
    checkpoint, and early-stop logic."""

    def __init__(self, cfg, eval_losses):
        super().__init__(cfg, model=None, tokenizer=None)
        self.eval_losses = list(eval_losses)
        self.epochs_run = 0

    def train_epoch(self, batches, log_every=None, log_fn=print, state=None,
                    stop=None):
        self.epochs_run += 1
        return state, 0.0, {"utterances_per_sec": 1.0}

    def evaluate(self, batches, state, use_beam=True):
        loss = self.eval_losses.pop(0)
        return loss, 0.5, 0.5, {"wer1": 0.5, "wer2": 0.5, "jer": 0.5}


def _stub_cfg(tmp_path, patience=3, max_epochs=10):
    cfg = tiny_config()
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.tensorboard_dir = ""
    cfg.train.early_stop_patience = patience
    cfg.train.max_epochs = max_epochs
    return cfg


def test_early_stop_patience_survives_resume(tmp_path):
    """A resumed run continues the patience count (no_improve) instead of
    restarting it: 1 bad epoch before the restart + 2 after = stop at
    patience 3, NOT 3 fresh bad epochs after the restart."""
    cfg = _stub_cfg(tmp_path, patience=3)
    state = {"w": jnp.zeros((2,))}

    first = _StubTrainer(cfg, eval_losses=[1.0, 2.0])
    cfg.train.max_epochs = 2
    first.fit(state, lambda: [], lambda: [], log_fn=lambda s: None)
    assert first.epochs_run == 2        # best at epoch 1, one bad epoch

    mgr = CheckpointManager(cfg.train.checkpoint_dir)
    best, no_improve = mgr.early_stop_state()
    assert best == 1.0 and no_improve == 1

    # Resume at epoch 3 with only worse losses: patience (3) is reached
    # after TWO more bad epochs (1 carried + 2 new), so exactly 2 epochs run.
    cfg.train.max_epochs = 10
    second = _StubTrainer(cfg, eval_losses=[3.0, 4.0, 5.0, 6.0, 7.0, 8.0])
    second.fit(state, lambda: [], lambda: [], log_fn=lambda s: None,
               start_epoch=3)
    assert second.epochs_run == 2


def test_fresh_run_ignores_stale_patience(tmp_path):
    """start_epoch=1 (not a resume) starts patience from zero even if the
    directory holds an old sidecar."""
    cfg = _stub_cfg(tmp_path, patience=2)
    mgr = CheckpointManager(cfg.train.checkpoint_dir)
    mgr._best_loss = 0.01
    mgr.set_no_improve(5)

    state = {"w": jnp.zeros((2,))}
    t = _StubTrainer(cfg, eval_losses=[1.0, 0.9, 0.8])
    cfg.train.max_epochs = 3
    t.fit(state, lambda: [], lambda: [], log_fn=lambda s: None)
    assert t.epochs_run == 3            # improving every epoch; never stops


# -- SSL pretraining rigor (VERDICT r2 weak #2) --------------------------------

def _ssl_setup(tok):
    from multimodal_av_model_tpu.train.ssl_pretrain import MaskedAudioPretrainer

    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    ssl = MaskedAudioPretrainer(cfg)
    rng = np.random.default_rng(0)
    B, S = 2, 2136
    batch = {
        "audio": (rng.standard_normal((B, S)) * 0.1).astype(np.float32),
        "mask1": rng.integers(0, 3, size=(B, S)).astype(np.int32),
    }
    return ssl, batch


def test_ssl_dropout_key_advances_per_step(tok):
    """The dropout key is part of the SSL state and advances every step —
    the round-2 bug passed PRNGKey(0) on every step (identical masks)."""
    ssl, batch = _ssl_setup(tok)
    state = ssl.init_state(0, batch)
    key0 = np.asarray(state["key"]).copy()
    state = ssl.fit(state, [batch], log_fn=lambda s: None)
    key1 = np.asarray(state["key"]).copy()
    assert not np.array_equal(key0, key1)
    state = ssl.fit(state, [batch], log_fn=lambda s: None)
    assert not np.array_equal(key1, np.asarray(state["key"]))


def test_ssl_full_state_resume(tok, tmp_path):
    """SSL checkpoints carry opt_state + key; a resumed run restores Adam
    moments instead of re-initializing them."""
    ssl, batch = _ssl_setup(tok)
    state = ssl.init_state(0, batch)
    state = ssl.fit(state, [batch, batch], log_fn=lambda s: None)

    def snapshot(s):
        return {k: jax.device_get(s[k]) for k in ("params", "opt_state", "key")}

    path = str(tmp_path / "ssl.ckpt")
    save_checkpoint(path, {"state": snapshot(state), "epoch": 1})

    fresh = ssl.init_state(0, batch)
    restored = restore_checkpoint(
        path, template={"state": snapshot(fresh), "epoch": 0})
    assert restored["epoch"] == 1
    rstate = dict(restored["state"])

    # Adam moments survived (non-zero after 2 steps, unlike a fresh init).
    mu = jax.tree.leaves(rstate["opt_state"][0].mu)
    assert any(np.abs(np.asarray(m)).max() > 0 for m in mu)
    trained_mu = jax.tree.leaves(jax.device_get(state["opt_state"])[0].mu)
    for a, b in zip(mu, trained_mu):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Training continues from the restored state.
    out = ssl.fit(rstate, [batch], log_fn=lambda s: None)
    assert np.isfinite(out["last_loss"])


# -- greedy decode branch (ADVICE r2 medium #2) --------------------------------

def _fake_log_probs(B=2, T=6, V=8):
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    return lp, np.full((B,), T, np.int32)


def test_decode_ids_greedy_algorithm():
    from multimodal_av_model_tpu.infer import decode_ids
    from multimodal_av_model_tpu.ops.ctc import ctc_greedy_decode

    cfg = Config()
    cfg.decode.algorithm = "greedy"
    lp, lens = _fake_log_probs()
    blank = cfg.model.decoder.blank_id
    ids, out_len = decode_ids(cfg, lp, lens, use_beam=True)
    want_ids, want_len = ctc_greedy_decode(lp, lens, blank)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_ids))
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(want_len))


def test_trainer_decode_greedy_algorithm(tok):
    cfg = tiny_config()
    cfg.decode.algorithm = "greedy"
    trainer = MultiSpeakerTrainer(cfg, model=None, tokenizer=tok)
    lp, lens = _fake_log_probs()
    ids, out_len = trainer._decode(lp, lens)
    from multimodal_av_model_tpu.ops.ctc import ctc_greedy_decode

    want_ids, want_len = ctc_greedy_decode(lp, lens,
                                           cfg.model.decoder.blank_id)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_ids))
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(want_len))


# -- static-shape real-data single-modality batches (VERDICT r2 weak #8) -------

def _make_entries(tmp_path, tok, n):
    from multimodal_av_model_tpu.data.audio_io import write_wav
    from multimodal_av_model_tpu.data.manifest import SentenceEntry

    rng = np.random.default_rng(0)
    entries = []
    for i in range(n):
        lip = str(tmp_path / f"l{i}.npy")
        np.save(lip, rng.uniform(0, 255, size=(6, 128, 128, 3)).astype(np.uint8))
        wav = str(tmp_path / f"a{i}.wav")
        write_wav(wav, rng.standard_normal(8000) * 0.1, 16000)
        txt = str(tmp_path / f"t{i}.txt")
        with open(txt, "w", encoding="utf-8") as f:
            f.write("가나")
        entries.append(SentenceEntry(lip, txt, wav, 0.1, 0.4, "가나", i, f"v{i}"))
    return entries


def test_utterance_batches_pad_final_batch_static_shape(tok, tmp_path):
    from multimodal_av_model_tpu.train.single_modality import utterance_batches

    entries = _make_entries(tmp_path, tok, 5)
    batches = list(utterance_batches(entries, tok, "audio", 2,
                                     max_samples=8000, max_label_len=8))
    # 5 utterances at batch 2 → 3 batches, ALL at the full static shape.
    assert len(batches) == 3
    for b in batches:
        assert b["inputs"].shape == (2, 8000)
    last = batches[-1]
    assert int(last["num_real"]) == 1
    assert last["valid"].tolist() == [1.0, 0.0]
    # The padded row duplicates the last real row.
    np.testing.assert_array_equal(last["inputs"][1], last["inputs"][0])


def test_utterance_flush_batch_loss_equals_unpadded(tok, tmp_path):
    """valid-weighted loss of a padded flush batch == loss of the unpadded
    batch (same discipline as the flagship path)."""
    from multimodal_av_model_tpu.train.single_modality import (
        make_audio_trainer,
        utterance_batches,
    )

    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    trainer = make_audio_trainer(cfg, tok)

    entries = _make_entries(tmp_path, tok, 3)
    # batch_size 4 → one flush batch with 3 real rows + 1 padded.
    (padded,) = list(utterance_batches(entries, tok, "audio", 4,
                                       max_samples=8000, max_label_len=8))
    assert int(padded["num_real"]) == 3

    state = trainer.init_state(0, padded)
    loss_padded, _ = trainer._loss(state["params"], state["batch_stats"],
                                   padded, train=False)

    unpadded = {k: (v[:3] if getattr(v, "ndim", 0) > 0 else v)
                for k, v in padded.items() if k not in ("valid", "num_real")}
    loss_ref, _ = trainer._loss(state["params"], state["batch_stats"],
                                unpadded, train=False)
    np.testing.assert_allclose(float(loss_padded), float(loss_ref), rtol=1e-5)


# -- multi-host init ordering (ADVICE r2 high) ---------------------------------

def test_initialize_distributed_reads_env_before_backend(monkeypatch):
    """With cluster env vars set, jax.distributed.initialize must be invoked
    (BEFORE any backend query gates it away — the round-2 bug called
    jax.process_count() first, which initializes the backend and makes
    initialize() raise in exactly the multi-process case)."""
    from multimodal_av_model_tpu.parallel import multihost

    calls = {}

    def spy(coordinator_address=None, num_processes=None, process_id=None):
        calls["args"] = (coordinator_address, num_processes, process_id)

    monkeypatch.setattr(multihost, "_initialized", False)
    monkeypatch.setattr(jax.distributed, "initialize", spy)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    try:
        multihost.initialize_distributed()
        assert calls["args"] == ("10.0.0.1:1234", 2, 0)
    finally:
        multihost._initialized = False


# -- per-process batch helpers -------------------------------------------------

def test_local_helpers_on_virtual_mesh():
    from multimodal_av_model_tpu.parallel import (
        local_batch_rows,
        local_data_parallelism,
        make_mesh,
        shard_batch,
    )

    mesh = make_mesh()
    # Single process: the local data parallelism IS the data axis size.
    assert local_data_parallelism(mesh) == mesh.shape["data"]

    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    placed = shard_batch(mesh, batch)
    out = jax.jit(lambda b: b["x"] * 2)(placed)
    np.testing.assert_array_equal(local_batch_rows(out), batch["x"] * 2)
    # Plain numpy passes through untouched.
    np.testing.assert_array_equal(local_batch_rows(batch["x"]), batch["x"])


# -- shared audio pass + activation option (round-3 perf levers) ---------------

def _flagship_inputs(B=2, T=4, S=2136, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        lip1=rng.uniform(size=(B, T, 1, 24, 24)).astype(np.float32),
        lip2=rng.uniform(size=(B, T, 1, 24, 24)).astype(np.float32),
        audio=(rng.standard_normal((B, S)) * 0.1).astype(np.float32),
        mask1=rng.integers(0, 3, size=(B, S)).astype(np.int32),
        mask2=rng.integers(0, 3, size=(B, S)).astype(np.int32),
        lip1_len=np.full((B,), T, np.int32),
        lip2_len=np.full((B,), T, np.int32),
    )


def test_shared_audio_pass_exact_in_eval(tok):
    """shared_audio_pass=True must produce the same eval outputs as the
    reference-shaped double pass: both passes see the same mixture under the
    same sample mask (mask != 3; pad positions shared between speakers).
    Tolerance is float-noise only — the [B] vs [2B] batch changes XLA's
    reduction tiling, not the math."""
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel

    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    inputs = _flagship_inputs()

    cfg.model.shared_audio_pass = False
    m_double = MultiSpeakerAVModel(cfg.model)
    variables = jax.jit(m_double.init)(jax.random.PRNGKey(0), **inputs)

    out_double = m_double.apply(variables, **inputs)

    import dataclasses as _dc
    cfg2 = tiny_config()
    cfg2.model.decoder.vocab_size = tok.vocab_size
    cfg2.model.shared_audio_pass = True
    m_shared = MultiSpeakerAVModel(cfg2.model)
    out_shared = m_shared.apply(variables, **inputs)   # same params

    for k in out_double:
        np.testing.assert_allclose(
            np.asarray(out_double[k], np.float32),
            np.asarray(out_shared[k], np.float32),
            rtol=1e-5, atol=1e-5, err_msg=f"mismatch in {k}")


def test_relu_activation_variant_trains(tok):
    """visual.activation='relu' (the reference's own relu_type option) builds,
    has no PReLU alpha params, and trains a finite step."""
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer

    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.visual.activation = "relu"
    trainer = MultiSpeakerTrainer(cfg, MultiSpeakerAVModel(cfg.model), tok)
    inputs = _flagship_inputs()
    B, L = 2, 2
    rng = np.random.default_rng(1)
    batch = {
        "lip1": inputs["lip1"], "lip2": inputs["lip2"],
        "audio": inputs["audio"], "mask1": inputs["mask1"],
        "mask2": inputs["mask2"],
        "lip1_lengths": inputs["lip1_len"], "lip2_lengths": inputs["lip2_len"],
        "text1": rng.integers(5, tok.vocab_size, size=(B, L)).astype(np.int32),
        "text1_lengths": np.full((B,), L, np.int32),
        "text2": rng.integers(5, tok.vocab_size, size=(B, L)).astype(np.int32),
        "text2_lengths": np.full((B,), L, np.int32),
    }
    state = trainer.init_state(0, batch)
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    assert not any("alpha" in "/".join(str(p) for p in path)
                   for path, _ in flat), "relu variant must drop PReLU alphas"
    state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


# -- real-text structured corpus (round-3 quality loops) -----------------------

def test_real_text_source_uses_real_sentences(tok):
    import os as _os

    from multimodal_av_model_tpu.data.structured import (
        RealTextStructuredSource,
        load_reference_sentences,
    )

    if not _os.path.isdir("/root/reference/input_texts"):
        pytest.skip("reference corpus not mounted")
    sents = load_reference_sentences("/root/reference/input_texts")
    assert len(sents) > 400          # the bundled 517 transcripts
    src = RealTextStructuredSource(tok, sents, seed=0, max_chars=6)
    pair = src.load_pair()
    # Labels decode to real Korean text fragments (substrings of sentences).
    text = tok.decode(list(pair["label1"]))
    assert 1 <= len(text) <= 7
    # Audio/lip lengths follow the per-token layout.
    assert pair["lip1"].shape[0] == len(pair["label1"]) * src.frames_per_token
    # Distinct tokens get distinct chords.
    assert src._chord[5] != src._chord[6]


def test_real_text_chord_table_covers_vocab(tok):
    from multimodal_av_model_tpu.data.structured import RealTextStructuredSource

    src = RealTextStructuredSource(tok, ["가나다"], seed=0)
    assert len(src._chord) == tok.vocab_size
    assert len(set(src._chord.values())) == tok.vocab_size  # injective


def test_compile_cache_enable_and_opt_out(tmp_path):
    """CLI compile cache: enable_compile_cache points JAX's persistent
    compilation cache at the (created, ~-expanded) directory, is idempotent,
    and "" disables without touching config."""
    import jax

    from multimodal_av_model_tpu.runtime import compile_cache

    prior = jax.config.jax_compilation_cache_dir  # conftest's warm cache
    try:
        assert compile_cache.enable_compile_cache("") is None
        target = tmp_path / "xla_cache"
        got = compile_cache.enable_compile_cache(str(target))
        assert got == str(target) and target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)
        # Idempotent re-enable (same resolved path, no error).
        assert compile_cache.enable_compile_cache(str(target)) == str(target)
    finally:
        # Point the rest of the suite back at conftest's warm cache.
        compile_cache.enable_compile_cache(prior)
