#!/usr/bin/env python
"""Quality at the reference's audio capacity: SSL-pretrain + finetune the
wav2vec2-LARGE-shape tower, CER vs the production width at matched wall-clock.

The reference rides a 24-layer d=1024 317M-param pretrained wav2vec2
(reference model/encoder.py:83).  benchmarks/w2v2_scale.py proved that shape
*trains fast* here (87.9 utt/s, MFU 0.33); this benchmark closes the quality
half (VERDICT r3 missing #2): both capacities run the SAME workflow the
framework ships for the reference's pretrained-checkpoint recipe —
masked-span InfoNCE SSL pretrain (train/ssl_pretrain.py, --family=ssl) →
graft → CTC finetune — on the real-transcript chord corpus
(data/structured.RealTextStructuredSource, 800-way char vocab), and CER is
compared at MATCHED FINETUNE WALL-CLOCK, the honest axis when one arm costs
~5x more per step.

Arms (both bf16 activations, warmup-cosine):
  production_12x512      the shipped default audio tower (config.py)
  w2v2_large_24x1024     reference-capacity: 24 layers, d=1024, ffn=4096

Writes benchmarks/w2v2_quality.json.  Run on the TPU.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_harness import (  # noqa: E402
    BATCH, decode_hyps, load_tokenizer, pack, refs_of, utterances,
)

SEED = 0
PRETRAIN_STEPS = 300
FT_BUDGET_S = 240.0            # pure train-step wall-clock per arm
EVAL_EVERY_S = 30.0            # probe CER roughly this often (by wall)
EVAL_UTTS = 96
N_TRAIN_BATCHES = 120


def make_cfg(tok, name):
    from multimodal_av_model_tpu.config import Config

    cfg = Config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.train.lr_schedule = "warmup_cosine"
    cfg.train.grad_clip_norm = 1.0
    # Peak LR scales DOWN with width: 1e-3 converges at d=192
    # (quality_ceiling.json) but leaves d>=512 towers on the all-blank CTC
    # plateau for the whole budget (measured in this benchmark's first run).
    # decay_steps must SPAN the arm's actual steps-in-budget or the cosine
    # floor freezes the arm early (round-4 bug: the LARGE arm decayed to ~0
    # at step 800 of 2088, so "capacity buys nothing" measured a dead LR,
    # not capacity).  Horizons below = measured steps-in-budget from the
    # round-4 run (production 3346, large 2088 in 240 s); the output JSON
    # carries a schedule_spans_run check so a silent drift gets flagged.
    if name == "production_12x512":
        # The shipped default audio tower (config.py) — only the recipe
        # knobs are set, the architecture is untouched.
        cfg.train.learning_rate = 3e-4
        cfg.train.warmup_steps = 300
        cfg.train.decay_steps = 3300
    elif name in ("w2v2_large_24x1024", "w2v2_large_2x_budget"):
        cfg.model.audio.d_model = 1024
        cfg.model.audio.num_layers = 24
        cfg.model.audio.num_heads = 16
        cfg.model.audio.ffn_dim = 4096
        cfg.model.audio.output_dim = 1024
        cfg.model.audio.middle_layers = (6, 7, 8, 9)  # reference's 4-layer tap
        cfg.train.learning_rate = 1.5e-4
        cfg.train.warmup_steps = 200
        cfg.train.decay_steps = (2100 if name == "w2v2_large_24x1024"
                                 else 4200)
    else:
        raise ValueError(name)
    return cfg


def run_arm(name, tok, eval_utts, refs, budget_s=FT_BUDGET_S):
    import jax
    import jax.numpy as jnp

    from multimodal_av_model_tpu.ops.metrics import cer
    from multimodal_av_model_tpu.train.single_modality import make_audio_trainer
    from multimodal_av_model_tpu.train.ssl_pretrain import (
        MaskedAudioPretrainer,
        flagship_audio_params,
    )

    cfg = make_cfg(tok, name)
    train_utts = utterances(tok, seed=1000 * SEED + 10,
                            n=N_TRAIN_BATCHES * BATCH)
    train_b = list(pack(train_utts, BATCH))
    eval_b = list(pack(eval_utts, BATCH))

    # -- SSL pretrain (the wav2vec2 substitute; reference model/encoder.py:83)
    ssl = MaskedAudioPretrainer(cfg, dtype=jnp.bfloat16)

    def as_pair_schema(b):
        return {"audio": b["inputs"],
                "mask1": np.where(b["meta"], 0, 3).astype(np.int32)}

    ssl_state = ssl.init_state(SEED, as_pair_schema(train_b[0]))
    n_params = sum(np.asarray(p).size
                   for p in jax.tree.leaves(ssl_state["params"]))
    t0 = time.time()
    stream = (as_pair_schema(train_b[i % len(train_b)])
              for i in range(PRETRAIN_STEPS))
    ssl_state = ssl.fit(ssl_state, stream, log_every=100)
    ssl_wall = time.time() - t0
    print(f"[{name}] ssl: {PRETRAIN_STEPS} steps, "
          f"infonce={ssl_state['last_loss']:.4f} ({ssl_wall:.0f}s)", flush=True)

    # -- graft + CTC finetune under a wall-clock budget ------------------------
    trainer = make_audio_trainer(cfg, tok, dtype=jnp.bfloat16)
    state = trainer.init_state(SEED + 1, train_b[0])
    params = dict(jax.device_get(state["params"]))
    params["audio_encoder"] = flagship_audio_params(
        jax.device_get(ssl_state["params"]))
    state["params"] = params
    state["opt_state"] = trainer._tx.init(params)

    def probe_cer(st):
        hyps, _ = decode_hyps(trainer, st, eval_b, tok, "greedy", cfg)
        return round(cer(refs[: len(hyps)], hyps), 4)

    # Exclude compile time from the budget: one throwaway step first.
    state, loss = trainer.train_step(state, train_b[0])
    float(loss)

    curve, spent, step, next_eval = [], 0.0, 0, EVAL_EVERY_S
    while spent < budget_s:
        t0 = time.perf_counter()
        state, loss = trainer.train_step(state, train_b[step % len(train_b)])
        loss = float(loss)          # host readback = honest timing
        spent += time.perf_counter() - t0
        step += 1
        if spent >= next_eval or spent >= budget_s:
            c = probe_cer(state)
            curve.append({"step": step, "wall_s": round(spent, 1),
                          "loss": round(loss, 4), "cer": c})
            print(f"[{name}] step {step} wall={spent:.0f}s cer={c}", flush=True)
            next_eval += EVAL_EVERY_S

    return {
        "params_m": round(n_params / 1e6, 1),
        "ssl": {"steps": PRETRAIN_STEPS, "wall_s": round(ssl_wall, 1),
                "final_infonce": round(ssl_state["last_loss"], 4)},
        "sec_per_step": round(spent / max(step, 1), 4),
        "finetune_budget_s": budget_s,
        "finetune_steps_in_budget": step,
        "decay_steps": cfg.train.decay_steps,
        # The round-4 failure mode, made un-silent: the cosine horizon must
        # span the run (within 35%) or the arm trained on a dead LR tail /
        # never finished its decay.
        "schedule_spans_run":
            abs(step - cfg.train.decay_steps) / cfg.train.decay_steps < 0.35,
        "finetune_curve": curve,
        "final_cer": curve[-1]["cer"] if curve else None,
        "best_cer": min(p["cer"] for p in curve) if curve else None,
    }


def main():
    tok = load_tokenizer()
    eval_utts = utterances(tok, seed=777, n=EVAL_UTTS)
    refs = refs_of(eval_utts, tok)

    results = {}
    for name, budget in (("production_12x512", FT_BUDGET_S),
                         ("w2v2_large_24x1024", FT_BUDGET_S),
                         ("w2v2_large_2x_budget", 2 * FT_BUDGET_S)):
        results[name] = run_arm(name, tok, eval_utts, refs, budget_s=budget)

    prod, large = results["production_12x512"], results["w2v2_large_24x1024"]
    out = {
        "protocol": {
            "corpus": "real AI-Hub transcripts (two-tone chords)",
            "pretrain_steps": PRETRAIN_STEPS,
            "finetune_budget_s": FT_BUDGET_S,
            "eval_utterances": EVAL_UTTS,
            "decode": "greedy",
            "note": "matched FINETUNE wall-clock, not matched steps: the "
                    "LARGE arm pays its ~5x step cost inside the same "
                    "budget.  Every arm's cosine horizon spans its own "
                    "steps-in-budget (schedule_spans_run per arm); the "
                    "2x-budget LARGE arm separates capacity from budget.",
        },
        "results": results,
        "summary": {
            "cer_production": prod["final_cer"],
            "cer_large": large["final_cer"],
            "cer_large_2x_budget":
                results["w2v2_large_2x_budget"]["final_cer"],
            "capacity_buys": round(prod["final_cer"] - large["final_cer"], 4),
            "schedules_ok": all(r["schedule_spans_run"]
                                for r in results.values()),
        },
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "w2v2_quality.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["summary"]))


if __name__ == "__main__":
    main()
