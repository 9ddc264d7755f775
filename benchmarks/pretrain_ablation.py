#!/usr/bin/env python
"""Pretraining ablation: demonstrate the wav2vec2 substitute (BASELINE
config 4 / VERDICT r1 missing #1).

The reference's audio features come from a 317M-param pretrained wav2vec2
(reference model/encoder.py:83-100); our stand-in is contrastive-only
AV-alignment pretraining (``train.contrastive_only``).  This experiment runs
on structured synthetic pairs (data/structured.py — tone-per-token audio,
grating-per-token video) and measures:

  (a) PROBE: nearest-centroid accuracy classifying overlap vs solo frames
      from the contrastive features — pretrained vs randomly-initialized
      encoder (the classes the masked InfoNCE organizes);
  (b) FINETUNE: full-loss training (CTC + λ·contrastive) from the pretrained
      audio encoder vs from scratch — eval CER on held-out pairs at fixed
      step checkpoints, and steps to reach a CER target.

Writes benchmarks/pretrain_ablation.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRETRAIN_STEPS = 400
FINETUNE_STEPS = 600
EVAL_EVERY = 100
BATCH = 8
CER_TARGET = 0.5
BUCKET_FRAMES = 28  # max 7 tokens x 4 frames


def make_config():
    from multimodal_av_model_tpu.config import Config

    cfg = Config()
    cfg.model.audio.d_model = 64
    cfg.model.audio.num_layers = 4
    cfg.model.audio.num_heads = 2
    cfg.model.audio.ffn_dim = 128
    cfg.model.audio.conv_kernel_size = 7
    cfg.model.audio.middle_layers = (1, 2)
    cfg.model.audio.output_dim = 96
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


def probe_accuracy(trainer, state, batches):
    from multimodal_av_model_tpu.train.probe import (
        collect_frame_features,
        nearest_centroid_probe,
        overlap_vs_solo_labels,
    )

    outs = []
    for b in batches:
        _, out = trainer.eval_step(state, trainer._place(b))
        outs.append({k: np.asarray(v) for k, v in out.items()
                     if k.startswith(("contrast", "mask_ds"))})
    feats, masks = collect_frame_features(outs, speaker=1)
    return nearest_centroid_probe(feats, overlap_vs_solo_labels(masks))


def main():
    import jax

    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer, graft_subtree
    from multimodal_av_model_tpu.train.trainer import TrainState

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))

    pre_batches = batch_stream(tok, seed=0, n_batches=40)
    ft_batches = batch_stream(tok, seed=10, n_batches=40)
    val_batches = batch_stream(tok, seed=99, n_batches=4)
    probe_batches = batch_stream(tok, seed=123, n_batches=4)

    # -- stage 1: contrastive-only pretraining --------------------------------
    cfg = make_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.train.contrastive_only = True
    model = MultiSpeakerAVModel(cfg.model)
    pre_trainer = MultiSpeakerTrainer(cfg, model, tok)
    state = pre_trainer.init_state(0, pre_batches[0])
    random_params = jax.device_get(state.params)

    t0 = time.time()
    for i in range(PRETRAIN_STEPS):
        state, metrics = pre_trainer.train_step(
            state, pre_trainer._place(pre_batches[i % len(pre_batches)]))
    pre_loss = float(metrics["loss"])
    print(f"pretrain: {PRETRAIN_STEPS} steps, final contrastive loss "
          f"{pre_loss:.4f} ({time.time() - t0:.0f}s)", flush=True)

    # -- probe: pretrained vs random features ----------------------------------
    acc_pre = probe_accuracy(pre_trainer, state, probe_batches)
    rand_state = state.replace(params=random_params)
    acc_rand = probe_accuracy(pre_trainer, rand_state, probe_batches)
    print(f"probe overlap-vs-solo: pretrained={acc_pre:.3f} random={acc_rand:.3f}",
          flush=True)
    pretrained_params = jax.device_get(state.params)

    # -- stage 2: finetune A/B --------------------------------------------------
    def finetune(init_from):
        cfg_ft = make_config()
        cfg_ft.model.decoder.vocab_size = tok.vocab_size
        model_ft = MultiSpeakerAVModel(cfg_ft.model)
        trainer = MultiSpeakerTrainer(cfg_ft, model_ft, tok)
        st = trainer.init_state(1, ft_batches[0])
        if init_from is not None:
            grafted = graft_subtree(jax.device_get(st.params), init_from,
                                    ["audio_encoder", "contrastive_proj"])
            st = st.replace(params=grafted)
        curve = []
        for i in range(FINETUNE_STEPS):
            st, m = trainer.train_step(st, trainer._place(ft_batches[i % len(ft_batches)]))
            if (i + 1) % EVAL_EVERY == 0:
                loss, wer, cer, _ = trainer.evaluate(val_batches, st, use_beam=False)
                curve.append({"step": i + 1, "eval_loss": round(loss, 4),
                              "cer": round(cer, 4), "wer": round(wer, 4)})
                print(f"  step {i+1}: loss={loss:.3f} cer={cer:.3f}", flush=True)
        return curve

    print("finetune from pretrained:", flush=True)
    curve_pre = finetune(pretrained_params)
    print("finetune from scratch:", flush=True)
    curve_scratch = finetune(None)

    def steps_to(curve, target):
        for p in curve:
            if p["cer"] <= target:
                return p["step"]
        return None

    result = {
        "pretrain_steps": PRETRAIN_STEPS,
        "pretrain_final_contrastive_loss": round(pre_loss, 4),
        "probe_overlap_vs_solo_acc": {"pretrained": round(acc_pre, 4),
                                      "random_init": round(acc_rand, 4)},
        "finetune": {"from_pretrained": curve_pre, "from_scratch": curve_scratch},
        "steps_to_cer": {
            "target": CER_TARGET,
            "from_pretrained": steps_to(curve_pre, CER_TARGET),
            "from_scratch": steps_to(curve_scratch, CER_TARGET),
        },
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "pretrain_ablation.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["steps_to_cer"]))


if __name__ == "__main__":
    main()
