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

Measured at TWO operating points of the same architecture family on the
real-transcript chord corpus (data/structured.RealTextStructuredSource —
real AI-Hub transcripts, 800-way char vocab):

* ``converged`` — the quality-ceiling AM (d=192x6, warmup-cosine, 2k steps,
  CER ~0.04 offline; the operating point of benchmarks/quality_ceiling.json)
  — the HEADLINE: truncation cost where a production system actually runs.
* ``weak_am`` — d=96x4 @ 700 steps (CER ~0.76), the pre-round-4 measurement
  point, kept because decode-search effects are largest on a flat posterior.

Writes benchmarks/streaming_quality.json.  Run on the TPU.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_harness import (  # noqa: E402
    BATCH, decode_hyps, load_tokenizer, pack, refs_of, tiny_audio_cfg,
    train_audio_ctc, utterances,
)

EVAL_UTTS = 96
CHUNK_S = 1.0
CONTEXT_S = 4.0


def run_operating_point(name, cfg, tok, steps):
    import jax

    from multimodal_av_model_tpu.ops.metrics import cer
    from multimodal_av_model_tpu.streaming import StreamingAudioTranscriber

    trainer, state, _loss = train_audio_ctc(
        cfg, tok, seed=0, steps=steps, n_train_batches=120)
    eval_utts = utterances(tok, seed=777, n=EVAL_UTTS)
    refs = refs_of(eval_utts, tok)

    def offline(algorithm):
        hyps, _ms = decode_hyps(trainer, state, pack(eval_utts), tok,
                                algorithm, cfg)
        return hyps

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

    results = {}
    for arm, fn in (
        ("offline_greedy", lambda: offline("greedy")),
        ("offline_beam", lambda: offline("prefix_beam")),
        ("stream_greedy", lambda: streamed("greedy")),
        ("stream_beam", lambda: streamed("prefix_beam")),
    ):
        t0 = time.time()
        hyps = fn()
        r = refs[: len(hyps)]
        results[arm] = {"cer": round(cer(r, hyps), 4),
                        "wall_s": round(time.time() - t0, 1)}
        print(f"{name}/{arm}: {json.dumps(results[arm])}", flush=True)
    results["truncation_cost_greedy"] = round(
        results["stream_greedy"]["cer"] - results["offline_greedy"]["cer"], 4)
    results["stream_beam_recovers"] = round(
        results["stream_greedy"]["cer"] - results["stream_beam"]["cer"], 4)
    return {"steps": steps, "model": f"d{cfg.model.audio.d_model}x"
                                     f"{cfg.model.audio.num_layers}",
            "results": results}


def main():
    tok = load_tokenizer()

    # Headline: the quality-ceiling operating point (quality_ceiling.json).
    cfg_big = tiny_audio_cfg(tok, d_model=192, num_layers=6)
    cfg_big.model.audio.ffn_dim = 384
    cfg_big.train.lr_schedule = "warmup_cosine"
    cfg_big.train.warmup_steps = 300
    cfg_big.train.decay_steps = 2000
    converged = run_operating_point("converged", cfg_big, tok, steps=2000)

    # Contrast: the weak AM where search effects dominate.
    cfg_small = tiny_audio_cfg(tok, d_model=96, num_layers=4)
    weak = run_operating_point("weak_am", cfg_small, tok, steps=700)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "benchmarks", "streaming_quality.json")
    with open(out, "w") as f:
        json.dump({"chunk_seconds": CHUNK_S, "context_seconds": CONTEXT_S,
                   "eval_utterances": EVAL_UTTS,
                   "corpus": "real AI-Hub transcripts (two-tone chords)",
                   "converged": converged, "weak_am": weak}, f, indent=2)
    print(json.dumps({"converged": converged["results"],
                      "weak_am": weak["results"]}))


if __name__ == "__main__":
    main()
