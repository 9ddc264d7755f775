#!/usr/bin/env python
"""Measure flagship train-step throughput under perf-relevant config variants.

Round-3 MFU attack (VERDICT r2: b16 trace = 113 ms conv fusions + 30 ms f32
norm/alpha reductions + 16 ms scans; MFU 0.27).  Levers measured here:

  double_audio    round-2 behavior: encode the mixture TWICE (reference-
                  shaped, model/trainer.py:94-95)
  shared_audio    encode once, reuse for both speakers (exact: the two
                  passes see identical inputs — config.shared_audio_pass)
  relu            + visual activation "relu" (drops 17 per-channel PReLU
                  alpha-grad reduction passes; the reference's own
                  relu_type option, model/encoder.py:7)
  batchnorm       + visual norm "batch" (the shipped default) vs the
                  bench's "group"

Writes benchmarks/step_variants.json.  Run on the TPU.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIDEO_FRAMES = 120
SAMPLES = VIDEO_FRAMES * 534
LABEL_LEN = 20
BATCH = 16
WARMUP = 2
STEPS = 20
PEAK = 197e12     # TPU v5e bf16 spec peak


def make_batch(rng, tok):
    B = BATCH
    return {
        "lip1": rng.uniform(size=(B, VIDEO_FRAMES, 1, 96, 96)).astype(np.float32),
        "lip2": rng.uniform(size=(B, VIDEO_FRAMES, 1, 96, 96)).astype(np.float32),
        "audio": (rng.standard_normal((B, SAMPLES)) * 0.1).astype(np.float32),
        "mask1": rng.integers(0, 3, size=(B, SAMPLES)).astype(np.int32),
        "mask2": rng.integers(0, 3, size=(B, SAMPLES)).astype(np.int32),
        "lip1_lengths": np.full((B,), VIDEO_FRAMES, np.int32),
        "lip2_lengths": np.full((B,), VIDEO_FRAMES, np.int32),
        "audio_lengths": np.full((B,), SAMPLES, np.int32),
        "text1": rng.integers(5, tok.vocab_size, size=(B, LABEL_LEN)).astype(np.int32),
        "text1_lengths": np.full((B,), LABEL_LEN, np.int32),
        "text2": rng.integers(5, tok.vocab_size, size=(B, LABEL_LEN)).astype(np.int32),
        "text2_lengths": np.full((B,), LABEL_LEN, np.int32),
    }


def main():
    import jax

    from multimodal_av_model_tpu.config import Config
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))
    rng = np.random.default_rng(0)
    batch = make_batch(rng, tok)

    def variant(name, **overrides):
        cfg = Config()
        cfg.model.decoder.vocab_size = tok.vocab_size
        cfg.model.visual.norm = "group"
        cfg.model.shared_audio_pass = False
        for k, v in overrides.items():
            obj = cfg.model
            parts = k.split(".")
            for p in parts[:-1]:
                obj = getattr(obj, p)
            setattr(obj, parts[-1], v)

        model = MultiSpeakerAVModel(cfg.model, dtype=jax.numpy.bfloat16)
        trainer = MultiSpeakerTrainer(cfg, model, tok)
        state = trainer.init_state(0, batch)
        placed = {k: jax.device_put(v) for k, v in batch.items()}

        flops = None
        try:
            compiled = trainer.train_step.lower(state, placed).compile()
            a = compiled.cost_analysis()
            a = a[0] if isinstance(a, list) else a
            f = float(a.get("flops", -1))
            flops = f if f > 0 else None
        except Exception:
            pass

        for _ in range(WARMUP):
            state, metrics = trainer.train_step(state, placed)
        float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = trainer.train_step(state, placed)
        loss = float(metrics["loss"])   # host readback = honest barrier
        dt = (time.perf_counter() - t0) / STEPS
        r = {
            "sec_per_step": round(dt, 4),
            "utt_per_sec": round(BATCH / dt, 2),
            "step_tflops": round(flops / 1e12, 2) if flops else None,
            "mfu": round(flops / dt / PEAK, 4) if flops else None,
            "loss": round(loss, 3),
        }
        print(f"[{name}] {json.dumps(r)}", flush=True)
        return r

    results = {}
    results["double_audio"] = variant("double_audio")
    results["shared_audio"] = variant("shared_audio", shared_audio_pass=True)
    results["shared+relu"] = variant(
        "shared+relu", shared_audio_pass=True, **{"visual.activation": "relu"})
    results["shared+batchnorm"] = variant(
        "shared+batchnorm", shared_audio_pass=True, **{"visual.norm": "batch"})

    out = os.path.join(root, "benchmarks", "step_variants.json")
    with open(out, "w") as f:
        json.dump({"batch": BATCH, "video_frames": VIDEO_FRAMES,
                   "results": results}, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
