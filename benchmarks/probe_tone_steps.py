#!/usr/bin/env python
"""One-off probe: where (in training steps) do decode algorithms separate on
the tone corpus?  Trains one seed, evaluating all three algorithms at several
checkpoints.  Not part of the benchmark suite."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from audio_harness import (  # noqa: E402
    decode_hyps, load_tokenizer, pack, refs_of, tiny_audio_cfg, utterances,
)

CHECKPOINTS = (20, 40, 70, 110, 160, 250)


def main():
    from multimodal_av_model_tpu.ops.metrics import cer
    from multimodal_av_model_tpu.train.single_modality import make_audio_trainer

    tok = load_tokenizer()
    cfg = tiny_audio_cfg(tok)
    trainer = make_audio_trainer(cfg, tok)
    train_utts = utterances(tok, seed=10, n=30 * 8, corpus="tone")
    train_b = list(pack(train_utts))
    eval_utts = utterances(tok, seed=777, n=64, corpus="tone")
    refs = refs_of(eval_utts, tok)
    state = trainer.init_state(0, train_b[0])
    step = 0
    for target in CHECKPOINTS:
        while step < target:
            state, loss = trainer.train_step(state, train_b[step % len(train_b)])
            step += 1
        row = {}
        for algo in ("greedy", "reference_beam", "prefix_beam"):
            hyps, _ = decode_hyps(trainer, state, pack(eval_utts), tok, algo, cfg)
            row[algo] = round(cer(refs[: len(hyps)], hyps), 4)
        print(f"step {target} loss={float(loss):.3f}: {row}", flush=True)


if __name__ == "__main__":
    main()
