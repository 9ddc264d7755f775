#!/usr/bin/env python
"""Ablation timings for the flagship train step on the attached TPU.

Times variants of the production configuration to locate the hot path
(honest methodology: data-dependent step chain + host readback; see
bench.py).  Writes benchmarks/ablation.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
T_V = 120
S = T_V * 534
L = 20
STEPS = 20


def make_batch(tok):
    rng = np.random.default_rng(0)
    return {
        "lip1": rng.uniform(size=(BATCH, T_V, 1, 96, 96)).astype(np.float32),
        "lip2": rng.uniform(size=(BATCH, T_V, 1, 96, 96)).astype(np.float32),
        "audio": (rng.standard_normal((BATCH, S)) * 0.1).astype(np.float32),
        "mask1": rng.integers(0, 3, size=(BATCH, S)).astype(np.int32),
        "mask2": rng.integers(0, 3, size=(BATCH, S)).astype(np.int32),
        "lip1_lengths": np.full((BATCH,), T_V, np.int32),
        "lip2_lengths": np.full((BATCH,), T_V, np.int32),
        "text1": rng.integers(5, tok.vocab_size, size=(BATCH, L)).astype(np.int32),
        "text1_lengths": np.full((BATCH,), L, np.int32),
        "text2": rng.integers(5, tok.vocab_size, size=(BATCH, L)).astype(np.int32),
        "text2_lengths": np.full((BATCH,), L, np.int32),
    }


def time_variant(name, cfg, tok, batch):
    import jax

    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer

    model = MultiSpeakerAVModel(cfg.model, dtype=jax.numpy.bfloat16)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    state = trainer.init_state(0, batch)
    placed = {k: jax.device_put(v) for k, v in batch.items()}
    for _ in range(2):
        state, m = trainer.train_step(state, placed)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = trainer.train_step(state, placed)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name}: {dt*1e3:.1f} ms/step ({BATCH/dt:.1f} utt/s)", flush=True)
    return dt


def main():
    from multimodal_av_model_tpu.config import Config
    from multimodal_av_model_tpu.text import CharTokenizer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))
    batch = make_batch(tok)

    results = {}

    def base_cfg():
        cfg = Config()
        cfg.model.decoder.vocab_size = tok.vocab_size
        cfg.model.visual.norm = "group"
        return cfg

    cfg = base_cfg()
    results["default_bilstm"] = time_variant("default (bilstm)", cfg, tok, batch)

    cfg = base_cfg()
    cfg.model.fusion.temporal_model = "transformer"
    results["transformer_temporal"] = time_variant("transformer temporal", cfg, tok, batch)

    cfg = base_cfg()
    cfg.model.frontend.use_pallas = True
    results["pallas_frontend"] = time_variant("bilstm + pallas frontend", cfg, tok, batch)

    cfg = base_cfg()
    cfg.model.audio.num_layers = 1
    cfg.model.audio.middle_layers = (0,)
    results["conformer_1layer"] = time_variant("1 conformer layer", cfg, tok, batch)

    cfg = base_cfg()
    cfg.model.visual.resnet_layers = (0, 0, 0, 0)
    cfg.model.visual.resnet_channels = (64, 64, 64, 64)
    results["no_resnet"] = time_variant("no resnet blocks", cfg, tok, batch)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ablation.json")
    with open(out, "w") as f:
        json.dump({k: round(v, 4) for k, v in results.items()}, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
