"""Inference surface: checkpoint → Transcriber → texts (and the legacy
pair-sample builder feeding the legacy reader)."""

import os

import numpy as np
import pytest

import jax

from multimodal_av_model_tpu.data import SyntheticPairSource, collate_pairs
from multimodal_av_model_tpu.data.collate import BucketSpec
from multimodal_av_model_tpu.infer import Transcriber
from multimodal_av_model_tpu.models import MultiSpeakerAVModel
from multimodal_av_model_tpu.text import CharTokenizer
from multimodal_av_model_tpu.train import MultiSpeakerTrainer, save_checkpoint
from test_models import tiny_config

VOCAB = os.path.join(os.path.dirname(__file__), "..", "assets", "tokenizer800.vocab")


def test_transcriber_from_checkpoint(tmp_path):
    tok = CharTokenizer(VOCAB)
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"

    src = SyntheticPairSource(tok, seed=0, video_frames=(4, 7), lip_size=24,
                              label_len=(2, 5))
    batch = collate_pairs([src.load_pair() for _ in range(2)],
                          BucketSpec(8, 4272, 8))

    model = MultiSpeakerAVModel(cfg.model)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    state = trainer.init_state(0, batch)
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, {"state": jax.device_get(state), "epoch": 1})

    t = Transcriber.from_checkpoint(cfg, tok, path, batch, dtype=jax.numpy.float32)
    texts = t.transcribe(batch, use_beam=True)
    assert len(texts) == 2
    for t1, t2 in texts:
        assert isinstance(t1, str) and isinstance(t2, str)

    greedy = t.transcribe(batch, use_beam=False)
    assert len(greedy) == 2


def test_transcriber_restores_batch_stats(tmp_path):
    """The default visual norm is BatchNorm: serving must use the TRAINED
    running statistics, not init values."""
    tok = CharTokenizer(VOCAB)
    cfg = tiny_config()
    cfg.model.visual.norm = "batch"
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"

    src = SyntheticPairSource(tok, seed=0, video_frames=(4, 7), lip_size=24,
                              label_len=(2, 5))
    batch = collate_pairs([src.load_pair() for _ in range(2)],
                          BucketSpec(8, 4272, 8))

    model = MultiSpeakerAVModel(cfg.model)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    state = trainer.init_state(0, batch)
    for _ in range(2):  # move the running stats off their init values
        state, _ = trainer.train_step(state, trainer._place(batch))
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, {"state": jax.device_get(state), "epoch": 1})

    t = Transcriber.from_checkpoint(cfg, tok, path, batch, dtype=jax.numpy.float32)
    trained = jax.device_get(state.batch_stats)
    restored = t.variables["batch_stats"]
    leaves_t = jax.tree.leaves(trained)
    leaves_r = jax.tree.leaves(restored)
    assert leaves_t and len(leaves_t) == len(leaves_r)
    for a, b in zip(leaves_t, leaves_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert len(t.transcribe(batch, use_beam=False)) == 2


def test_audio_transcriber_serves():
    from multimodal_av_model_tpu.infer import AudioTranscriber
    from multimodal_av_model_tpu.models import AudioOnlyCTC

    tok = CharTokenizer(VOCAB)
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 3200)) * 0.1).astype(np.float32)
    mask = np.ones((2, 3200), bool)
    model = AudioOnlyCTC(cfg.model)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), audio, mask)
    t = AudioTranscriber(cfg, tok, variables, dtype=jax.numpy.float32)
    for use_beam in (True, False):
        texts = t.transcribe(audio, mask, use_beam=use_beam)
        assert len(texts) == 2 and all(isinstance(s, str) for s in texts)


def test_legacy_pair_sample_builder(tmp_path):
    from multimodal_av_model_tpu.data.audio_io import write_wav
    from multimodal_av_model_tpu.data.legacy_preprocess import build_all_pair_samples
    from multimodal_av_model_tpu.data.manifest import SentenceEntry
    from multimodal_av_model_tpu.text.korean import KoreanSyllableVocab
    from multimodal_av_model_tpu.train.legacy import load_legacy_sample

    rng = np.random.default_rng(0)
    entries = []
    for i in range(3):
        lip = str(tmp_path / f"l{i}.npy")
        np.save(lip, rng.uniform(0, 255, size=(3, 16, 16, 3)).astype(np.uint8))
        txt = str(tmp_path / f"t{i}.txt")
        with open(txt, "w", encoding="utf-8") as f:
            f.write("바나나")
        wav = str(tmp_path / f"a{i}.wav")
        write_wav(wav, rng.standard_normal(3200) * 0.1, 16000)
        entries.append(SentenceEntry(lip, txt, wav, 0.0, 0.2, "바나나", i, f"v{i}"))

    dirs = build_all_pair_samples(entries, str(tmp_path / "pairs"), max_pairs=2)
    assert len(dirs) == 2
    sample = load_legacy_sample(dirs[0], KoreanSyllableVocab(), image_size=16)
    assert sample["frames_A"].shape[0] == 3
    assert sample["mel"].shape[-1] == 80
    assert len(sample["label_A"]) == 3


def test_export_transcriber_round_trip(tmp_path):
    """Full serving artifact: export → load without model code → identical
    transcripts (greedy and prefix-beam+LM variants)."""
    from multimodal_av_model_tpu.infer import ExportedTranscriber, export_transcriber

    tok = CharTokenizer(VOCAB)
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"
    cfg.decode.algorithm = "prefix_beam"

    src = SyntheticPairSource(tok, seed=0, video_frames=(4, 7), lip_size=24,
                              label_len=(2, 5))
    batch = collate_pairs([src.load_pair() for _ in range(2)],
                          BucketSpec(8, 4272, 8))

    model = MultiSpeakerAVModel(cfg.model)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    state = trainer.init_state(0, batch)
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, {"state": jax.device_get(state), "epoch": 1})
    t = Transcriber.from_checkpoint(cfg, tok, path, batch, dtype=jax.numpy.float32)

    # LM fusion configured → the table ships inside the artifact.
    from multimodal_av_model_tpu.text.ngram_lm import save_bigram_lm, train_bigram_lm

    lm_path = str(tmp_path / "lm.npy")
    save_bigram_lm(lm_path, train_bigram_lm([[5, 6, 7]], tok.vocab_size))
    cfg.decode.lm_path = lm_path
    cfg.decode.lm_weight = 0.3
    cfg.decode.length_bonus = 0.5

    out_dir = str(tmp_path / "artifact")
    export_transcriber(t, out_dir, batch, use_beam=True)
    for f in ("model.stablehlo", "params.ckpt", "meta.json", "vocab.txt", "lm.npy"):
        assert os.path.isfile(os.path.join(out_dir, f)), f

    # Load with NO tokenizer/config/model objects — everything from disk.
    served = ExportedTranscriber.load(out_dir)
    got = served.transcribe(batch)
    want = t.transcribe(batch, use_beam=True)
    assert got == want

    # Greedy artifact too.
    out_dir2 = str(tmp_path / "artifact_greedy")
    cfg.decode.lm_path = ""
    export_transcriber(t, out_dir2, batch, use_beam=False)
    served2 = ExportedTranscriber.load(out_dir2)
    assert served2.transcribe(batch) == t.transcribe(batch, use_beam=False)
