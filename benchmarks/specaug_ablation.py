#!/usr/bin/env python
"""SpecAugment ablation on the real-text chord corpus.

Arms: no augmentation / time masking only / time+frequency masking
(`model.audio.specaug_*`, ops/specaugment.py — off by default; the reference
has no augmentation at all).  Regularization regime: a deliberately small
train set (N_TRAIN_BATCHES cycled) so the un-augmented model overfits; each
arm reports the held-out CER curve and the final train/held-out gap.

N_SEEDS independent data/init seeds; JSON carries per-seed finals + mean±std.
Writes benchmarks/specaug_ablation.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from audio_harness import (  # noqa: E402
    BATCH, decode_hyps, load_tokenizer, mean_std, pack, refs_of,
    tiny_audio_cfg, utterances,
)

STEPS = 800
EVAL_EVERY = 200
N_TRAIN_BATCHES = 8
N_SEEDS = 3
EVAL_UTTS = 96

ARMS = {
    "none": dict(specaug_time_masks=0, specaug_freq_masks=0),
    "time": dict(specaug_time_masks=2, specaug_freq_masks=0),
    "time+freq": dict(specaug_time_masks=2, specaug_freq_masks=2),
}


def run_arm(tok, seed, arm_cfg):
    from multimodal_av_model_tpu.ops.metrics import cer
    from multimodal_av_model_tpu.train.single_modality import make_audio_trainer

    cfg = tiny_audio_cfg(tok)
    for k, v in arm_cfg.items():
        setattr(cfg.model.audio, k, v)
    trainer = make_audio_trainer(cfg, tok)

    train_utts = utterances(tok, seed=1000 * seed + 10,
                            n=N_TRAIN_BATCHES * BATCH)
    train_b = list(pack(train_utts))
    train_refs = refs_of(train_utts, tok)
    eval_utts = utterances(tok, seed=777 + seed, n=EVAL_UTTS)
    eval_refs = refs_of(eval_utts, tok)

    state = trainer.init_state(seed, train_b[0])
    curve = []
    t0 = time.time()
    for i in range(STEPS):
        state, loss = trainer.train_step(state, train_b[i % len(train_b)])
        if (i + 1) % EVAL_EVERY == 0:
            hyps, _ = decode_hyps(trainer, state, pack(eval_utts), tok,
                                  "greedy", cfg)
            heldout = cer(eval_refs[: len(hyps)], hyps)
            thyps, _ = decode_hyps(trainer, state, pack(train_utts), tok,
                                   "greedy", cfg)
            train_cer = cer(train_refs[: len(thyps)], thyps)
            curve.append({"step": i + 1,
                          "heldout_cer": round(heldout, 4),
                          "train_cer": round(train_cer, 4)})
    print(f"  seed {seed}: final heldout {curve[-1]['heldout_cer']:.4f} "
          f"train {curve[-1]['train_cer']:.4f} ({time.time()-t0:.0f}s)",
          flush=True)
    return curve


def main():
    tok = load_tokenizer()
    results = {}
    for name, arm_cfg in ARMS.items():
        print(f"=== arm {name}", flush=True)
        curves = [run_arm(tok, seed, arm_cfg) for seed in range(N_SEEDS)]
        finals = [c[-1]["heldout_cer"] for c in curves]
        gaps = [c[-1]["heldout_cer"] - c[-1]["train_cer"] for c in curves]
        results[name] = {
            "arm": arm_cfg,
            "final_heldout_cer": mean_std(finals),
            "final_generalization_gap": mean_std(gaps),
            "curves": curves,
        }
    out = {
        "corpus": "real AI-Hub transcripts rendered as two-tone chords",
        "steps": STEPS,
        "train_batches": N_TRAIN_BATCHES,
        "n_seeds": N_SEEDS,
        "results": results,
    }
    root = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(root, "specaug_ablation.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v["final_heldout_cer"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
