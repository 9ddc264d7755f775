#!/usr/bin/env python
"""Probe the speed-first operating point past the round-3 batch frontier.

Round 3 fixed the shipped-default frontier at (b32, visual.remat=frontend):
109.1 utt/s (`step_variants.json` batch_sweep_new_defaults).  Two levers were
measured only at b16 there: ``visual.activation=relu`` (the reference's own
relu_type option, model/encoder.py:7; drops 17 per-channel PReLU alpha-grad
reduction passes) and larger batches.  This probe composes them at the
frontier: b32/b48 x {default prelu, relu} under frontend remat, plus b48 at
deeper remat if memory forces it.  Results merge into step_variants.json
under "speed_first" — the shipped default (and the bench headline) stays
prelu for weight-compat parity with the reference trunk; this documents what
a speed-first training run should set.

Run on the TPU.
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
WARMUP = 2
STEPS = 20
PEAK = 197e12     # TPU v5e bf16 spec peak


def make_batch(rng, tok, B):
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

    def variant(name, B, remat, activation):
        batch = make_batch(rng, tok, B)
        cfg = Config()                      # shipped defaults: BN, shared pass
        cfg.model.decoder.vocab_size = tok.vocab_size
        cfg.model.visual.remat = remat
        cfg.model.visual.activation = activation
        model = MultiSpeakerAVModel(cfg.model, dtype=jax.numpy.bfloat16)
        trainer = MultiSpeakerTrainer(cfg, model, tok)
        try:
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
        except Exception as e:              # OOM at a probe point is a result
            r = {"batch": B, "visual_remat": remat, "activation": activation,
                 "error": type(e).__name__}
            print(f"[{name}] {json.dumps(r)}", flush=True)
            return r
        r = {
            "batch": B, "visual_remat": remat, "activation": activation,
            "sec_per_step": round(dt, 4),
            "utt_per_sec": round(B / dt, 2),
            "step_tflops": round(flops / 1e12, 2) if flops else None,
            "mfu": round(flops / dt / PEAK, 4) if flops else None,
            "loss": round(loss, 3),
        }
        print(f"[{name}] {json.dumps(r)}", flush=True)
        return r

    probes = {
        "b32_frontend_relu": (32, "frontend", "relu"),
        "b48_frontend_prelu": (48, "frontend", "prelu"),
        "b48_frontend_relu": (48, "frontend", "relu"),
    }
    results = {k: variant(k, *v) for k, v in probes.items()}

    path = os.path.join(root, "benchmarks", "step_variants.json")
    with open(path) as f:
        merged = json.load(f)
    merged["speed_first"] = results
    merged["speed_first_note"] = (
        "Composed levers at the round-3 frontier (defaults + frontend remat)."
        " The shipped default and bench headline stay activation=prelu for"
        " weight-compat parity with the reference trunk; relu is the"
        " speed-first recipe (reference's own relu_type option).")
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
