#!/usr/bin/env python
"""Decode-quality benchmark: greedy vs the reference's path beam vs the CTC
prefix beam, SAME trained model, held-out utterances.

Reference decoder: /root/reference/beam_search.py (width-5 path beam whose
hypotheses are frame paths, not collapsed prefixes — it rarely overturns the
argmax path).  Ours adds a true prefix beam (ops/prefix_beam_search.py).

Two corpora, N_SEEDS independent train+eval repeats each (audio-only CTC
acoustic model — see audio_harness.py for why):

* "tone" — the 12-way confusable pure-tone corpus at a MID-TRAINING
  operating point.  Adjacent token tones are acoustically close, so the
  posterior carries genuine ambiguity and search algorithms separate.
* "real" — chord renderings of the 517 bundled AI-Hub transcripts (full
  800-way char vocabulary, production char distribution).  Here chord
  posteriors are sharp (right or uniformly wrong) and all decoders tie —
  an honest negative result the JSON keeps.

Writes benchmarks/decoder_quality.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from audio_harness import (  # noqa: E402
    BATCH, decode_hyps, load_tokenizer, mean_std, pack, refs_of,
    tiny_audio_cfg, train_audio_ctc, utterances,
)

N_SEEDS = 3
EVAL_UTTS = 96
ALGOS = ("greedy", "reference_beam", "prefix_beam")
# tone: mid-training (decoders differ before the AM saturates the easy
# corpus); real: as far as the tiny AM gets in the budget.
CORPORA = {"tone": 160, "real": 800}


def run_corpus(tok, corpus, train_steps):
    from multimodal_av_model_tpu.ops.metrics import cer, wer

    per_algo = {a: {"cer": [], "wer": [], "ms": []} for a in ALGOS}
    for seed in range(N_SEEDS):
        cfg = tiny_audio_cfg(tok)
        trainer, state, _ = train_audio_ctc(cfg, tok, seed, train_steps,
                                            corpus=corpus)
        eval_utts = utterances(tok, seed=777 + seed, n=EVAL_UTTS,
                               corpus=corpus)
        refs = refs_of(eval_utts, tok)
        for algo in ALGOS:
            hyps, ms = decode_hyps(trainer, state, pack(eval_utts), tok,
                                   algo, cfg)
            r = refs[: len(hyps)]
            per_algo[algo]["cer"].append(cer(r, hyps))
            per_algo[algo]["wer"].append(wer(r, hyps))
            per_algo[algo]["ms"].append(ms)
            print(f"[{corpus}] seed {seed} {algo}: "
                  f"cer={per_algo[algo]['cer'][-1]:.4f} "
                  f"({ms:.1f} ms/utt incl. forward)", flush=True)
    return {
        a: {"cer": mean_std(v["cer"]), "wer": mean_std(v["wer"]),
            "decode_ms_per_utt": mean_std(v["ms"])}
        for a, v in per_algo.items()
    }


def main():
    tok = load_tokenizer()
    out = {
        "corpora": {
            "tone": "12-way confusable pure tones (markov transcripts), "
                    "mid-training AM",
            "real": "real AI-Hub transcripts rendered as two-tone chords "
                    "(800-way char vocab)",
        },
        "train_steps": CORPORA,
        "n_seeds": N_SEEDS,
        "beam_width": 5,
        "held_out_utterances": (EVAL_UTTS // BATCH) * BATCH,
        "results": {c: run_corpus(tok, c, steps)
                    for c, steps in CORPORA.items()},
    }
    root = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(root, "decoder_quality.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({c: {a: out["results"][c][a]["cer"]["mean"]
                          for a in ALGOS} for c in CORPORA}))


if __name__ == "__main__":
    main()
