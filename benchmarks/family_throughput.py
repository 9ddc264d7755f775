#!/usr/bin/env python
"""Single-modality family throughput (BASELINE configs 1 and 2).

The headline bench (bench.py) measures the flagship two-speaker AV model;
this one measures the audio-only and visual-only CTC training slices at
their production shapes on one chip — the other two trainable configs a
reference user has.  Writes benchmarks/family_throughput.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 16                  # the flagship's measured single-chip sweet spot
VIDEO_FRAMES = 120          # 4 s at 30 fps
SAMPLES = VIDEO_FRAMES * 534
LABEL_LEN = 20
WARMUP = 2
STEPS = 20


def main():
    import jax

    from multimodal_av_model_tpu.config import Config
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train.single_modality import (
        make_audio_trainer,
        make_visual_trainer,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))
    rng = np.random.default_rng(0)

    import jax.numpy as jnp

    labels = rng.integers(5, tok.vocab_size,
                          size=(BATCH, LABEL_LEN)).astype(np.int32)
    label_lengths = np.full((BATCH,), LABEL_LEN, np.int32)

    def measure(family):
        cfg = Config()
        cfg.model.decoder.vocab_size = tok.vocab_size
        cfg.model.dtype = "bfloat16"
        if family == "audio":
            trainer = make_audio_trainer(cfg, tok, dtype=jnp.bfloat16)
            batch = {
                "inputs": (rng.standard_normal((BATCH, SAMPLES)) * 0.1).astype(np.float32),
                "meta": np.ones((BATCH, SAMPLES), bool),
                "labels": labels,
                "label_lengths": label_lengths,
            }
        else:
            cfg.model.visual.norm = "group"
            trainer = make_visual_trainer(cfg, tok, dtype=jnp.bfloat16)
            batch = {
                "inputs": rng.uniform(size=(BATCH, VIDEO_FRAMES, 1, 96, 96)).astype(np.float32),
                "meta": np.full((BATCH,), VIDEO_FRAMES, np.int32),
                "labels": labels,
                "label_lengths": label_lengths,
            }
        state = trainer.init_state(0, batch)
        placed = {k: jax.device_put(v) for k, v in batch.items()}
        for _ in range(WARMUP):
            state, loss = trainer.train_step(state, placed)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, loss = trainer.train_step(state, placed)
        final = float(loss)
        dt = (time.perf_counter() - t0) / STEPS
        r = {"utt_per_sec": round(BATCH / dt, 1),
             "sec_per_step": round(dt, 4),
             "rtf": round((BATCH * VIDEO_FRAMES / 30) / dt, 1),
             "loss": round(final, 3)}
        print(family, r, flush=True)
        return r

    out = {"batch": BATCH,
           "audio_only": measure("audio"),
           "visual_only": measure("visual")}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "family_throughput.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "batch"}))


if __name__ == "__main__":
    main()
