#!/usr/bin/env python
"""Decoder quality comparison: greedy vs reference path beam vs CTC prefix beam.

Trains a small AV model PER SEED on structured pairs whose transcripts are
REAL Korean sentences (the 517 bundled AI-Hub transcripts rendered as
two-tone chords, data/structured.RealTextStructuredSource — real 800-way
char distribution) to a mid-training operating point — where decoder
differences matter; a fully-converged model makes every decoder look the
same — then evaluates the SAME checkpoint on held-out pairs with each
decode algorithm:

  greedy          ops/ctc.py:ctc_greedy_decode (argmax collapse)
  reference_beam  ops/beam_search.py (the reference's decoder: beam over
                  un-collapsed frame paths, reference beam_search.py:2-42)
  prefix_beam     ops/prefix_beam_search.py (true CTC prefix search — sums
                  alignment mass per transcript, Hannun 2014)

Writes benchmarks/decoder_quality.json: per-seed CER/WER per algorithm +
mean/spread + decode wall time per utterance (full on-device search, host
does id→text only).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_STEPS = 450
BATCH = 8
BUCKET_FRAMES = 28
BEAM_WIDTH = 5
N_SEEDS = 3
MAX_CHARS = 7


def make_config():
    from multimodal_av_model_tpu.config import Config

    cfg = Config()
    cfg.model.audio.d_model = 64
    cfg.model.audio.num_layers = 4
    cfg.model.audio.num_heads = 2
    cfg.model.audio.ffn_dim = 128
    cfg.model.audio.conv_kernel_size = 7
    cfg.model.audio.middle_layers = (1, 2)
    cfg.model.audio.output_dim = 96
    cfg.model.visual.frontend_channels = 8
    cfg.model.visual.resnet_layers = (1, 1, 1, 1)
    cfg.model.visual.resnet_channels = (8, 12, 16, 24)
    cfg.model.visual.output_dim = 24
    cfg.model.visual.norm = "group"
    cfg.model.fusion.fused_dim = 32
    cfg.model.fusion.num_heads = 2
    cfg.model.fusion.temporal_model = "transformer"
    cfg.model.contrastive.projection_dim = 16
    cfg.train.learning_rate = 1e-3
    cfg.train.audio_learning_rate = 1e-3
    cfg.train.log_every = 10_000
    cfg.decode.beam_width = BEAM_WIDTH
    return cfg


def batch_stream(tok, seed, n_batches):
    from multimodal_av_model_tpu.data.collate import BucketSpec
    from multimodal_av_model_tpu.data.pipeline import bucketed_batches
    from multimodal_av_model_tpu.data.structured import (
        RealTextStructuredSource,
        load_reference_sentences,
    )

    sents = load_reference_sentences("/root/reference/input_texts")
    src = RealTextStructuredSource(tok, sents, seed=seed, max_chars=MAX_CHARS)
    spec = BucketSpec(BUCKET_FRAMES, BUCKET_FRAMES * 534, 8)
    it = (src.load_pair() for _ in range(n_batches * BATCH))
    return list(bucketed_batches(it, [spec], BATCH, drop_last=True))


def run_seed(seed: int):
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))

    cfg = make_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    trainer = MultiSpeakerTrainer(cfg, MultiSpeakerAVModel(cfg.model), tok)

    train_batches = batch_stream(tok, seed=1000 * seed + 10, n_batches=40)
    val_batches = batch_stream(tok, seed=1000 * seed + 99, n_batches=6)

    st = trainer.init_state(1 + seed, train_batches[0])
    t0 = time.time()
    for i in range(TRAIN_STEPS):
        st, m = trainer.train_step(
            st, trainer._place(train_batches[i % len(train_batches)]))
    print(f"trained {TRAIN_STEPS} steps, loss={float(m['loss']):.3f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    results = {}
    for algo in ("greedy", "reference_beam", "prefix_beam"):
        cfg.decode.algorithm = algo if algo != "greedy" else "reference_beam"
        use_beam = algo != "greedy"
        # Warm compile outside the timed region.
        trainer.evaluate(val_batches[:1], st, use_beam=use_beam)
        t0 = time.time()
        loss, wer, cer, per = trainer.evaluate(val_batches, st, use_beam=use_beam)
        dt = time.time() - t0
        n_utts = sum(2 * b["audio"].shape[0] for b in val_batches)
        results[algo] = {
            "cer": round(cer, 4), "wer": round(wer, 4),
            "jer": round(per["jer"], 4),
            "decode_ms_per_utt": round(1e3 * dt / n_utts, 2),
        }
        print(f"{algo}: cer={cer:.4f} wer={wer:.4f} "
              f"({1e3 * dt / n_utts:.1f} ms/utt incl. forward)", flush=True)

    return results, cfg


def main():
    per_seed = {}
    cfg = None
    for seed in range(N_SEEDS):
        print(f"=== seed {seed} ===", flush=True)
        per_seed[str(seed)], cfg = run_seed(seed)

    algos = sorted({a for r in per_seed.values() for a in r})
    agg = {}
    for a in algos:
        agg[a] = {}
        for metric in ("cer", "wer", "jer", "decode_ms_per_utt"):
            vals = [r[a][metric] for r in per_seed.values()]
            agg[a][metric] = {"mean": round(float(np.mean(vals)), 4),
                              "std": round(float(np.std(vals)), 4)}

    out = {
        "train_steps": TRAIN_STEPS,
        "beam_width": BEAM_WIDTH,
        "prefix_top_k": cfg.decode.prefix_top_k,
        "corpus": "real AI-Hub transcripts (two-tone chords)",
        "n_seeds": N_SEEDS,
        "results_per_seed": per_seed,
        "results": agg,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "benchmarks", "decoder_quality.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
