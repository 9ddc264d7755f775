#!/usr/bin/env python
"""Reference-scale audio capacity: train-step throughput at wav2vec2-large dims.

The reference's audio features come from a 24-layer, d=1024, ffn=4096,
317M-param pretrained wav2vec2 (reference model/encoder.py:83).  Our
production config uses a 12×512 log-mel Conformer — a deliberate capacity
choice (the reference only ever uses 4 middle layers' mean as features,
model/encoder.py:94-100, and our encoder is TRAINED on the task rather than
frozen).  This benchmark demonstrates the framework HANDLES reference-scale
capacity: it trains the audio-only CTC family with the Conformer scaled to
wav2vec2-large dimensions (24 layers, d_model 1024, ffn 4096, heads 16) on
one chip and reports utt/s + MFU, plus the production 12×512 point for
contrast.

Writes benchmarks/w2v2_scale.json.  Run on the TPU.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECONDS = 4
SAMPLES = 16000 * SECONDS
LABEL_LEN = 20
WARMUP = 2
STEPS = 10
PEAK = 197e12


def main():
    import jax

    from multimodal_av_model_tpu.config import Config
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train.single_modality import make_audio_trainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))
    rng = np.random.default_rng(0)

    def run(name, d_model, layers, heads, ffn, batch):
        cfg = Config()
        cfg.model.decoder.vocab_size = tok.vocab_size
        cfg.model.audio.d_model = d_model
        cfg.model.audio.num_layers = layers
        cfg.model.audio.num_heads = heads
        cfg.model.audio.ffn_dim = ffn
        cfg.model.audio.output_dim = d_model
        cfg.model.audio.middle_layers = tuple(
            range(layers // 4, layers // 4 + 4))   # reference's 4-layer tap
        trainer = make_audio_trainer(cfg, tok, dtype=jax.numpy.bfloat16)

        batch_d = {
            "inputs": (rng.standard_normal((batch, SAMPLES)) * 0.1).astype(np.float32),
            "meta": np.ones((batch, SAMPLES), bool),
            "labels": rng.integers(5, tok.vocab_size,
                                   size=(batch, LABEL_LEN)).astype(np.int32),
            "label_lengths": np.full((batch,), LABEL_LEN, np.int32),
        }
        state = trainer.init_state(0, batch_d)
        n_params = sum(np.asarray(p).size for p in jax.tree.leaves(state["params"]))

        flops = None
        try:
            compiled = trainer.train_step.lower(state, batch_d).compile()
            a = compiled.cost_analysis()
            a = a[0] if isinstance(a, list) else a
            f = float(a.get("flops", -1))
            flops = f if f > 0 else None
        except Exception:
            pass

        for _ in range(WARMUP):
            state, loss = trainer.train_step(state, batch_d)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, loss = trainer.train_step(state, batch_d)
        final = float(loss)
        dt = (time.perf_counter() - t0) / STEPS
        r = {
            "params_m": round(n_params / 1e6, 1),
            "batch": batch,
            "sec_per_step": round(dt, 4),
            "utt_per_sec": round(batch / dt, 2),
            "rtf": round(batch * SECONDS / dt, 1),
            "step_tflops": round(flops / 1e12, 2) if flops else None,
            "mfu": round(flops / dt / PEAK, 4) if flops else None,
            "loss": round(final, 3),
        }
        print(f"[{name}] {json.dumps(r)}", flush=True)
        return r

    results = {
        "production_12x512": run("production_12x512", 512, 12, 8, 2048, 16),
        "w2v2_large_24x1024_b8": run("w2v2_large_24x1024_b8", 1024, 24, 16, 4096, 8),
        "w2v2_large_24x1024_b16": run("w2v2_large_24x1024_b16", 1024, 24, 16, 4096, 16),
    }
    out = os.path.join(root, "benchmarks", "w2v2_scale.json")
    with open(out, "w") as f:
        json.dump({"seconds_per_utt": SECONDS, "results": results}, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
