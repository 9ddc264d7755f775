#!/usr/bin/env python
"""Bigram-LM shallow-fusion benchmark on REAL Korean text.

The LM (text/ngram_lm.py) is trained on the 517 real AI-Hub transcripts
bundled with the reference (/root/reference/input_texts — the same
sentence_text fields the reference trains on, dataset/
multi_speaker_dataset.py:65-69), so its bigram structure is the production
char distribution, not a toy Markov chain.  The acoustic model is the shared
audio-only CTC harness trained on chord renderings of the same text
distribution (held-out draws for eval).

Arms (all same trained model, held-out utterances):
  greedy                      argmax collapse
  prefix_beam_no_lm           CTC prefix beam, no fusion
  lm_{a}_no_bonus             + a·log P_lm            (raw fusion)
  lm_{a}_bonus                + a·log P_lm + b·|y|, b = -a·E[log P_lm]
                              (the principled insertion bonus — without it
                              the LM term is a deletion-biased length
                              penalty; the JSON records both as guidance)

N_SEEDS independent train/eval repeats; JSON reports per-seed + mean±std.
Writes benchmarks/lm_fusion.json.  The reference decoder has no LM.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from audio_harness import (  # noqa: E402
    decode_hyps, load_tokenizer, mean_std, pack, real_sentences, refs_of,
    tiny_audio_cfg, train_audio_ctc, utterances,
)

TRAIN_STEPS = 800
N_SEEDS = 3
EVAL_UTTS = 96
LM_WEIGHTS = (0.2, 0.4, 0.8)


def main():
    from multimodal_av_model_tpu.ops.metrics import cer
    from multimodal_av_model_tpu.text.ngram_lm import (
        mean_token_logprob, train_bigram_lm,
    )

    tok = load_tokenizer()
    sents = real_sentences()
    seqs = [tok.encode(s) for s in sents]
    lm = train_bigram_lm(seqs, tok.vocab_size)
    mean_lp = mean_token_logprob(lm, seqs)
    print(f"bigram LM on {len(sents)} real transcripts, "
          f"mean token logprob {mean_lp:.3f}", flush=True)

    arms = [("greedy", dict(algorithm="greedy")),
            ("prefix_beam_no_lm", dict(algorithm="prefix_beam"))]
    for a in LM_WEIGHTS:
        arms.append((f"lm_{a}_no_bonus",
                     dict(algorithm="prefix_beam", lm=lm, lm_weight=a)))
        arms.append((f"lm_{a}_bonus",
                     dict(algorithm="prefix_beam", lm=lm, lm_weight=a,
                          length_bonus=-a * mean_lp)))

    per_arm = {name: [] for name, _ in arms}
    for seed in range(N_SEEDS):
        cfg = tiny_audio_cfg(tok)
        trainer, state, _ = train_audio_ctc(cfg, tok, seed, TRAIN_STEPS)
        eval_utts = utterances(tok, seed=777 + seed, n=EVAL_UTTS)
        refs = refs_of(eval_utts, tok)
        for name, kw in arms:
            kw = dict(kw)
            algo = kw.pop("algorithm")
            hyps, _ = decode_hyps(trainer, state, pack(eval_utts), tok,
                                  algo, cfg, **kw)
            c = cer(refs[: len(hyps)], hyps)
            per_arm[name].append(c)
            print(f"seed {seed} {name}: cer={c:.4f}", flush=True)

    results = {name: mean_std(v) for name, v in per_arm.items()}
    out = {
        "corpus": "real AI-Hub transcripts rendered as two-tone chords",
        "lm_training_text": f"{len(sents)} real transcripts "
                            "(/root/reference/input_texts)",
        "mean_token_logprob": round(float(mean_lp), 4),
        "train_steps": TRAIN_STEPS,
        "n_seeds": N_SEEDS,
        "lm_weights": list(LM_WEIGHTS),
        "heldout_cer": results,
    }
    root = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(root, "lm_fusion.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v["mean"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
