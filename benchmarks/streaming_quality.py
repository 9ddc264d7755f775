#!/usr/bin/env python
"""Streaming decode quality: offline vs chunked, greedy vs prefix beam.

The streaming path (streaming.py) makes exactly two approximations vs
offline serving: (1) the encoder sees a truncated left context per chunk
instead of the whole utterance; (2) nothing — the decoders themselves are
exact streaming algorithms (greedy collapse carries one token of state;
the prefix beam carries its full beam state across chunks,
ops/prefix_beam_search.prefix_beam_stream_step).  This benchmark measures
the real CER cost of (1) and the benefit of the streaming beam:

  offline_greedy     full-utterance forward + greedy collapse
  offline_beam       full-utterance forward + CTC prefix beam
  stream_greedy      chunked forward (chunk 1 s, context 4 s) + greedy
  stream_beam        chunked forward + streaming prefix beam

on a tiny audio-only CTC model trained on the real-text chord corpus
(data/structured.RealTextStructuredSource — real AI-Hub transcripts,
800-way char distribution).  Writes benchmarks/streaming_quality.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 700
BATCH = 8
MAX_CHARS = 7
MAX_SAMPLES = 7 * 4 * 534        # chars x frames/token x samples/frame
EVAL_UTTS = 96
CHUNK_S = 1.0
CONTEXT_S = 4.0


def utterances(tok, seed, n):
    from multimodal_av_model_tpu.data.structured import (
        RealTextStructuredSource,
        load_reference_sentences,
    )

    sents = load_reference_sentences("/root/reference/input_texts")
    src = RealTextStructuredSource(tok, sents, seed=seed, max_chars=MAX_CHARS)
    out = []
    for _ in range(n):
        audio, _lip, label = src.one_utterance()
        out.append((audio[:MAX_SAMPLES], label))
    return out


def batches(utts, batch):
    for i in range(0, len(utts) - batch + 1, batch):
        chunk = utts[i : i + batch]
        inputs = np.zeros((batch, MAX_SAMPLES), np.float32)
        meta = np.zeros((batch, MAX_SAMPLES), bool)
        labels = np.zeros((batch, 8), np.int32)
        llen = np.zeros((batch,), np.int32)
        for j, (a, lab) in enumerate(chunk):
            inputs[j, : len(a)] = a
            meta[j, : len(a)] = True
            lab = lab[:8]
            labels[j, : len(lab)] = lab
            llen[j] = len(lab)
        yield {"inputs": inputs, "meta": meta,
               "labels": labels, "label_lengths": llen}


def main():
    import jax

    from multimodal_av_model_tpu.config import Config
    from multimodal_av_model_tpu.ops.metrics import cer
    from multimodal_av_model_tpu.streaming import StreamingAudioTranscriber
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train.single_modality import make_audio_trainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))

    cfg = Config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.audio.d_model = 96
    cfg.model.audio.num_layers = 4
    cfg.model.audio.num_heads = 4
    cfg.model.audio.ffn_dim = 192
    cfg.model.audio.output_dim = 96
    cfg.model.audio.middle_layers = (1, 2)
    cfg.train.learning_rate = 1e-3
    trainer = make_audio_trainer(cfg, tok)

    train_utts = utterances(tok, seed=0, n=30 * BATCH)
    train_b = list(batches(train_utts, BATCH))
    eval_utts = utterances(tok, seed=77, n=EVAL_UTTS)

    state = trainer.init_state(0, train_b[0])
    t0 = time.time()
    for i in range(STEPS):
        state, loss = trainer.train_step(state, train_b[i % len(train_b)])
    print(f"trained {STEPS} steps, loss={float(loss):.3f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    refs = [tok.decode(list(lab)) for _, lab in eval_utts]

    # Offline arms: batched full-utterance decode via the trainer path.
    def offline(algorithm, use_beam):
        cfg.decode.algorithm = algorithm
        hyps = []
        for b in batches(eval_utts, BATCH):
            lp, il = trainer.eval_forward(state["params"], state["batch_stats"],
                                          b["inputs"], b["meta"])
            if use_beam:
                from multimodal_av_model_tpu.ops.prefix_beam_search import (
                    prefix_beam_search_decode,
                )

                ids, lens, _ = prefix_beam_search_decode(
                    lp, il, cfg.decode.beam_width, cfg.decode.prefix_top_k,
                    cfg.model.decoder.blank_id)
            else:
                from multimodal_av_model_tpu.ops.ctc import ctc_greedy_decode

                ids, lens = ctc_greedy_decode(lp, il, cfg.model.decoder.blank_id)
            ids, lens = np.asarray(ids), np.asarray(lens)
            hyps += [tok.decode(ids[j, : lens[j]].tolist())
                     for j in range(ids.shape[0])]
        return hyps

    # Streaming arms: feed each utterance in CHUNK_S blocks.
    def streamed(algorithm):
        s = StreamingAudioTranscriber(
            cfg, tok, None, chunk_seconds=CHUNK_S, context_seconds=CONTEXT_S,
            dtype=jax.numpy.float32, algorithm=algorithm)
        s.variables = {"params": state["params"], **(
            {"batch_stats": state["batch_stats"]} if state["batch_stats"] else {})}
        hyps = []
        block = s.chunk_samples
        for audio, _lab in eval_utts:
            s.reset()
            text = ""
            for i in range(0, len(audio), block):
                text += s.feed(audio[i : i + block])
            text += s.flush()
            hyps.append(text)
        return hyps

    n_round = len(list(batches(eval_utts, BATCH))) * BATCH
    results = {}
    for name, fn in (
        ("offline_greedy", lambda: offline("greedy", False)),
        ("offline_beam", lambda: offline("prefix_beam", True)),
        ("stream_greedy", lambda: streamed("greedy")),
        ("stream_beam", lambda: streamed("prefix_beam")),
    ):
        t0 = time.time()
        hyps = fn()
        r = refs[: len(hyps)]
        results[name] = {"cer": round(cer(r, hyps), 4),
                         "wall_s": round(time.time() - t0, 1)}
        print(f"{name}: {json.dumps(results[name])}", flush=True)

    out = os.path.join(root, "benchmarks", "streaming_quality.json")
    with open(out, "w") as f:
        json.dump({"steps": STEPS, "chunk_seconds": CHUNK_S,
                   "context_seconds": CONTEXT_S, "eval_utterances": n_round,
                   "corpus": "real AI-Hub transcripts (two-tone chords)",
                   "results": results}, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
