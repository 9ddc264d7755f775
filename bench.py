#!/usr/bin/env python
"""Headline benchmark: flagship AV-CTC training throughput on one TPU chip.

Measures utterances/sec of the full two-speaker train step (visual ResNet-18
×2, log-mel Conformer ×2, fusion, contrastive, CTC, Adam update) at batch 8 ×
4-second utterances — the reference's production configuration
(reference main.py:88; shapes per SURVEY.md §6) — and compares against the
measured reference CPU throughput (benchmarks/reference_cpu.json, produced by
benchmarks/measure_reference_cpu.py driving the reference's own torch modules
on the same shapes).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N}
"""

import json
import os
import time

import numpy as np

BATCH = 8
VIDEO_FRAMES = 120          # 4 s at 30 fps
SAMPLES = VIDEO_FRAMES * 534
LABEL_LEN = 20
WARMUP = 2
STEPS = 30


def load_baseline() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "reference_cpu.json")
    if os.path.exists(path):
        with open(path) as f:
            return float(json.load(f)["utterances_per_sec"])
    return float("nan")


def main() -> None:
    import jax

    from multimodal_av_model_tpu.config import Config
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer

    root = os.path.dirname(os.path.abspath(__file__))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))

    cfg = Config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.visual.norm = "group"      # stateless norm at per-chip batch 8
    cfg.model.dtype = "bfloat16"

    model = MultiSpeakerAVModel(cfg.model, dtype=jax.numpy.bfloat16)
    trainer = MultiSpeakerTrainer(cfg, model, tok)

    rng = np.random.default_rng(0)
    batch = {
        "lip1": rng.uniform(size=(BATCH, VIDEO_FRAMES, 1, 96, 96)).astype(np.float32),
        "lip2": rng.uniform(size=(BATCH, VIDEO_FRAMES, 1, 96, 96)).astype(np.float32),
        "audio": (rng.standard_normal((BATCH, SAMPLES)) * 0.1).astype(np.float32),
        "mask1": rng.integers(0, 3, size=(BATCH, SAMPLES)).astype(np.int32),
        "mask2": rng.integers(0, 3, size=(BATCH, SAMPLES)).astype(np.int32),
        "lip1_lengths": np.full((BATCH,), VIDEO_FRAMES, np.int32),
        "lip2_lengths": np.full((BATCH,), VIDEO_FRAMES, np.int32),
        "audio_lengths": np.full((BATCH,), SAMPLES, np.int32),
        "text1": rng.integers(5, tok.vocab_size, size=(BATCH, LABEL_LEN)).astype(np.int32),
        "text1_lengths": np.full((BATCH,), LABEL_LEN, np.int32),
        "text2": rng.integers(5, tok.vocab_size, size=(BATCH, LABEL_LEN)).astype(np.int32),
        "text2_lengths": np.full((BATCH,), LABEL_LEN, np.int32),
    }

    state = trainer.init_state(0, batch)
    placed = {k: jax.device_put(v) for k, v in batch.items()}

    # NOTE: on tunneled backends block_until_ready can return before the
    # device finishes; a host readback of a value that depends on every step
    # (the final loss, chained through the donated state) is the only honest
    # barrier.  Steps are data-dependent through `state`, so the whole chain
    # must execute.
    for _ in range(WARMUP):
        state, metrics = trainer.train_step(state, placed)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = trainer.train_step(state, placed)
    final_loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS

    utt_per_sec = BATCH / dt
    rtf = (BATCH * SAMPLES / 16000) / dt
    baseline = load_baseline()
    vs = utt_per_sec / baseline if baseline == baseline else None

    print(json.dumps({
        "metric": "av_ctc_train_throughput",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": {
            "sec_per_step": round(dt, 4),
            "rtf": round(rtf, 2),
            "batch": BATCH,
            "video_frames": VIDEO_FRAMES,
            "loss": round(final_loss, 4),
            "device": str(jax.devices()[0]),
            "baseline_utt_per_sec": baseline if baseline == baseline else None,
        },
    }))


if __name__ == "__main__":
    main()
