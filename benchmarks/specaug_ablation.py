#!/usr/bin/env python
"""SpecAugment ablation: does train-time mel masking improve held-out CER?

Three arms on the structured synthetic corpus (data/structured.py), with a
deliberately SMALL training set (8 distinct batches, cycled) so the model
can overfit and regularization has something to do:

  arm A  no augmentation (reference parity — the reference has none);
  arm B  time masking only (2 masks, 8% of the valid length each);
  arm C  time + frequency masking (2×8% time, 2×10-bin freq).  The
         structured corpus is tone-per-token (narrowband), so freq masks
         can delete a token's entire spectral evidence — this arm probes
         whether that breaks learning at this scale.

Each arm trains the same tiny AV model for the same steps from the same
init seed and evaluates held-out CER periodically (greedy decode).  The
whole experiment repeats over N_SEEDS independent data/init seeds; the JSON
reports per-seed finals and mean/spread.
Writes benchmarks/specaug_ablation.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 600
EVAL_EVERY = 150
N_SEEDS = 3
BATCH = 8
TRAIN_BATCHES = 8          # small on purpose: make overfitting visible
BUCKET_FRAMES = 28
ARMS = {
    "none": dict(freq_masks=0, time_masks=0),
    "time_only": dict(freq_masks=0, time_masks=2, time_frac=0.08),
    "time_and_freq": dict(freq_masks=2, freq_width=10, time_masks=2,
                          time_frac=0.08),
}


def make_config(arm):
    from multimodal_av_model_tpu.config import Config

    cfg = Config()
    cfg.model.audio.d_model = 64
    cfg.model.audio.num_layers = 4
    cfg.model.audio.num_heads = 2
    cfg.model.audio.ffn_dim = 128
    cfg.model.audio.conv_kernel_size = 7
    cfg.model.audio.middle_layers = (1, 2)
    cfg.model.audio.output_dim = 96
    cfg.model.audio.specaug_freq_masks = arm.get("freq_masks", 0)
    cfg.model.audio.specaug_freq_width = arm.get("freq_width", 27)
    cfg.model.audio.specaug_time_masks = arm.get("time_masks", 0)
    cfg.model.audio.specaug_time_frac = arm.get("time_frac", 0.05)
    cfg.model.visual.frontend_channels = 8
    cfg.model.visual.resnet_layers = (1, 1, 1, 1)
    cfg.model.visual.resnet_channels = (8, 12, 16, 24)
    cfg.model.visual.output_dim = 24
    cfg.model.visual.norm = "group"
    cfg.model.fusion.fused_dim = 32
    cfg.model.fusion.num_heads = 2
    cfg.model.fusion.temporal_model = "transformer"
    cfg.model.contrastive.projection_dim = 16
    cfg.train.learning_rate = 1e-3
    cfg.train.audio_learning_rate = 1e-3
    cfg.train.log_every = 10_000
    return cfg


def batch_stream(tok, seed, n_batches):
    from multimodal_av_model_tpu.data.collate import BucketSpec
    from multimodal_av_model_tpu.data.pipeline import bucketed_batches
    from multimodal_av_model_tpu.data.structured import StructuredPairSource

    src = StructuredPairSource(tok, seed=seed)
    spec = BucketSpec(BUCKET_FRAMES, BUCKET_FRAMES * 534, 8)
    it = (src.load_pair() for _ in range(n_batches * BATCH))
    return list(bucketed_batches(it, [spec], BATCH, drop_last=True))


def run_seed(seed: int):
    import jax

    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))

    train_batches = batch_stream(tok, seed=1000 * seed, n_batches=TRAIN_BATCHES)
    val_batches = batch_stream(tok, seed=1000 * seed + 99, n_batches=4)

    results = {}
    for name, arm in ARMS.items():
        cfg = make_config(arm)
        cfg.model.decoder.vocab_size = tok.vocab_size
        trainer = MultiSpeakerTrainer(cfg, MultiSpeakerAVModel(cfg.model), tok)
        st = trainer.init_state(7 + seed, train_batches[0])
        curve = []
        t0 = time.time()
        for i in range(STEPS):
            st, _ = trainer.train_step(
                st, trainer._place(train_batches[i % len(train_batches)]))
            if (i + 1) % EVAL_EVERY == 0:
                loss, wer, cer, _ = trainer.evaluate(val_batches, st,
                                                     use_beam=False)
                tr_loss, _, tr_cer, _ = trainer.evaluate(train_batches[:4], st,
                                                         use_beam=False)
                curve.append({
                    "step": i + 1,
                    "heldout_cer": round(cer, 4),
                    "heldout_loss": round(loss, 4),
                    "train_cer": round(tr_cer, 4),
                    "train_loss": round(tr_loss, 4),
                })
                print(f"[{name}] step {i+1}: heldout_cer={cer:.3f} "
                      f"train_cer={tr_cer:.3f}", flush=True)
        results[name] = {
            "arm": arm,
            "curve": curve,
            "final_heldout_cer": curve[-1]["heldout_cer"],
            "generalization_gap": round(
                curve[-1]["heldout_cer"] - curve[-1]["train_cer"], 4),
            "wall_s": round(time.time() - t0, 1),
        }

    return results


def main():
    per_seed = {}
    for seed in range(N_SEEDS):
        print(f"=== seed {seed} ===", flush=True)
        per_seed[str(seed)] = run_seed(seed)

    agg = {}
    for arm in ARMS:
        finals = [per_seed[s][arm]["final_heldout_cer"] for s in per_seed]
        gaps = [per_seed[s][arm]["generalization_gap"] for s in per_seed]
        agg[arm] = {
            "final_heldout_cer": {"mean": round(float(np.mean(finals)), 4),
                                  "std": round(float(np.std(finals)), 4)},
            "generalization_gap": {"mean": round(float(np.mean(gaps)), 4),
                                   "std": round(float(np.std(gaps)), 4)},
        }

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "specaug_ablation.json")
    with open(out, "w") as f:
        json.dump({"steps": STEPS, "train_batches": TRAIN_BATCHES,
                   "n_seeds": N_SEEDS,
                   "results_per_seed": per_seed, "results": agg}, f, indent=2)
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
