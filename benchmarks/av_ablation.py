#!/usr/bin/env python
"""The cocktail-party ablation: does the visual stream actually do the job?

The reference exists to do ONE thing: use each speaker's lip video to pull
THEIR transcript out of a two-speaker mixed waveform (reference
model/fusion_module.py:5-67 — the audio-queries-visual attention — and
contrastive.py:8-44 — the masked speaker-contrastive loss).  Every converged
quality number in this repo before round 5 was single-speaker clean audio;
this benchmark trains the flagship ON THE MIXTURE TASK to a converged
operating point and measures the visual stream's (and the contrastive
term's) marginal contribution with matched-budget arms:

  av             full audio-visual flagship (production semantics);
  audio_only     lips zeroed at train AND eval — the model keeps the speaker
                 mask (solo/overlap structure) but has no visual content;
  shuffled_lips  each sample trains/evals with ANOTHER pair's lips — visual
                 content present but uninformative about the target speaker;
  no_contrastive full AV with λ=0 (train.lambda_contrastive=0).

Why the corpus forces visual reliance: RealTextStructuredSource renders each
character as a two-tone chord, and a mixture frame where both speakers talk
superimposes TWO chords = four base tones, which split into (up to) three
valid chord pairs — the audio alone cannot tell which chord belongs to the
target speaker.  Solo frames are unambiguous (the speaker mask marks them),
so the audio_only arm has a real but bounded ceiling: it can transcribe solo
spans and must guess inside overlap.  The lips carry the target's chord
identity at every frame, so the full-AV arm can resolve overlap — exactly
the reference's cocktail-party mechanism.  `overlap_token_fraction` in the
output quantifies how much of the eval corpus is in the ambiguous regime.

Also reported, on the trained `av` arm: eval-time lip-corruption probes
(zeroed / shuffled lips at eval only) — the most direct evidence that the
trained fusion READS the lips rather than ignoring them.

Per-speaker CER per arm, N_SEEDS seeds, cached per (arm, seed) so a
preempted sweep resumes.  Writes benchmarks/av_ablation.json.  Run on TPU.

Usage:
  python benchmarks/av_ablation.py                 # full sweep + aggregate
  python benchmarks/av_ablation.py --arm=av --seed=0   # one cell
  python benchmarks/av_ablation.py --pilot         # quick single-arm recipe check
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# -- experiment definition -----------------------------------------------------

N_SEEDS = 3
ARMS = ("av", "audio_only", "shuffled_lips", "no_contrastive")
# b32: the b8/4k recipe stayed all-blank through its whole budget (loss 3.2
# and falling at 4000); at the same 32k-sample budget, b32 x 1000 steps is
# already at CER 0.77 and falling — the larger batch escapes the CTC
# all-blank saddle where b8's gradient noise does not.
BATCH = 32
TOTAL_STEPS = 3000
STEP_GRID = (500, 1000, 2000, 3000)
EVAL_BATCHES = 2                  # 64 pairs = 128 transcripts
TRAIN_BATCHES = 40                # 1280 training pairs, cycled

MAX_CHARS, MIN_CHARS = 7, 3
FRAMES_PER_TOKEN = 4
LIP = 48
BUCKET_FRAMES = MAX_CHARS * FRAMES_PER_TOKEN
SAMPLES = BUCKET_FRAMES * 534
MAX_LABEL = MAX_CHARS + 1

D_AUDIO, AUDIO_LAYERS = 192, 6    # the width that reached CER 0.038 on the
LR = 1e-3                         # single-speaker task (quality_ceiling.py)
WARMUP = 300


def make_cfg(tok, lam=None):
    from multimodal_av_model_tpu.config import Config

    cfg = Config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.audio.d_model = D_AUDIO
    cfg.model.audio.num_layers = AUDIO_LAYERS
    cfg.model.audio.num_heads = 4
    cfg.model.audio.ffn_dim = 4 * D_AUDIO
    cfg.model.audio.output_dim = D_AUDIO
    cfg.model.audio.middle_layers = (2, 3)
    cfg.model.visual.frontend_channels = 32
    cfg.model.visual.resnet_layers = (1, 1, 1, 1)
    cfg.model.visual.resnet_channels = (32, 64, 96, 128)
    cfg.model.visual.output_dim = 192
    cfg.model.visual.norm = "group"
    cfg.model.fusion.fused_dim = 256
    cfg.model.fusion.num_heads = 4
    cfg.model.fusion.temporal_model = "transformer"
    cfg.model.fusion.transformer_heads = 4
    cfg.model.fusion.transformer_ffn_dim = 512
    cfg.model.contrastive.projection_dim = 64
    cfg.train.learning_rate = LR
    cfg.train.audio_learning_rate = LR
    # Constant 1e-3 leaves the mixture task on the all-blank plateau (the
    # round-3/4 parity grid's CER ~0.89 was exactly this); warmup->cosine is
    # the recipe every converged single-speaker run here uses.
    cfg.train.lr_schedule = "warmup_cosine"
    cfg.train.warmup_steps = WARMUP
    cfg.train.decay_steps = TOTAL_STEPS
    if lam is not None:
        cfg.train.lambda_contrastive = lam
    return cfg


def load_tokenizer():
    from multimodal_av_model_tpu.text import CharTokenizer

    return CharTokenizer(os.path.join(REPO, "assets", "tokenizer800.vocab"))


def batch_stream(tok, seed, n_batches):
    from multimodal_av_model_tpu.data.collate import BucketSpec, collate_pairs
    from multimodal_av_model_tpu.data.structured import (
        RealTextStructuredSource,
        load_reference_sentences,
    )

    src = RealTextStructuredSource(
        tok, load_reference_sentences("/root/reference/input_texts"),
        seed=seed, max_chars=MAX_CHARS, min_chars=MIN_CHARS, lip_size=LIP,
        frames_per_token=FRAMES_PER_TOKEN)
    spec = BucketSpec(BUCKET_FRAMES, SAMPLES, MAX_LABEL)
    return [collate_pairs([src.load_pair() for _ in range(BATCH)], spec)
            for _ in range(n_batches)]


def corrupt_lips(batch, mode, roll=1):
    """Arm-specific lip corruption.  ``zero``: lips carry no content at all.
    ``shuffle``: every sample gets a DIFFERENT pair's lips (roll along the
    batch) — visual content present but uncorrelated with the target."""
    if mode == "none":
        return batch
    b = dict(batch)
    if mode == "zero":
        b["lip1"] = np.zeros_like(batch["lip1"])
        b["lip2"] = np.zeros_like(batch["lip2"])
    elif mode == "shuffle":
        for k in ("lip1", "lip2", "lip1_lengths", "lip2_lengths"):
            b[k] = np.roll(np.asarray(batch[k]), roll, axis=0)
    else:
        raise ValueError(mode)
    return b


def overlap_token_fraction(batches):
    """Fraction of target tokens whose span is (partly) two-speaker overlap
    — the regime where audio alone cannot assign chords to speakers."""
    tok_overlap = tok_total = 0
    spt = 534 * FRAMES_PER_TOKEN
    for b in batches:
        for speaker in (1, 2):
            mask = np.asarray(b[f"mask{speaker}"])
            L = np.asarray(b[f"text{speaker}_lengths"])
            for i in range(mask.shape[0]):
                for t in range(int(L[i])):
                    seg = mask[i, t * spt: (t + 1) * spt]
                    tok_total += 1
                    tok_overlap += bool((seg == 1).any())
    return tok_overlap / max(tok_total, 1)


def eval_per_speaker(trainer, state, eval_batches, tok, lip_mode="none"):
    """Greedy decode; returns (cer1, cer2, cer_all)."""
    from multimodal_av_model_tpu.ops.metrics import cer

    refs = {1: [], 2: []}
    hyps = {1: [], 2: []}
    for batch in eval_batches:
        batch = corrupt_lips(batch, lip_mode)
        _, out = trainer.eval_step(state, trainer._place(batch))
        for s in (1, 2):
            ids = np.asarray(out[f"greedy{s}"])
            ns = np.asarray(out[f"greedy{s}_len"])
            t = np.asarray(batch[f"text{s}"])
            lt = np.asarray(batch[f"text{s}_lengths"])
            for i in range(ids.shape[0]):
                hyps[s].append(tok.decode(ids[i, : ns[i]].tolist()))
                refs[s].append(tok.decode(t[i, : lt[i]].tolist()))
    return (cer(refs[1], hyps[1]), cer(refs[2], hyps[2]),
            cer(refs[1] + refs[2], hyps[1] + hyps[2]))


def run_cell(arm: str, seed: int, verbose=False):
    import jax

    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer

    tok = load_tokenizer()
    lam = 0.0 if arm == "no_contrastive" else None
    cfg = make_cfg(tok, lam=lam)
    train_mode = {"av": "none", "no_contrastive": "none",
                  "audio_only": "zero", "shuffled_lips": "shuffle"}[arm]

    model = MultiSpeakerAVModel(cfg.model, dtype=jax.numpy.bfloat16)
    trainer = MultiSpeakerTrainer(cfg, model, tok)

    train_b = [corrupt_lips(b, train_mode)
               for b in batch_stream(tok, 1000 * seed, TRAIN_BATCHES)]
    eval_b = batch_stream(tok, 1000 * seed + 77, EVAL_BATCHES)

    state = trainer.init_state(seed, train_b[0])
    # Pre-place the (cycled) training batches once: a per-step _place is a
    # synchronous host->device transfer over the axon tunnel (~0.4 s/step
    # measured); resident batches let the donated-state step loop pipeline.
    train_p = [trainer._place(b) for b in train_b]
    curve = {}
    t0 = time.time()
    step = 0
    for target in STEP_GRID:
        while step < target:
            state, metrics = trainer.train_step(
                state, train_p[step % len(train_p)])
            step += 1
            if step % 200 == 0:
                # Bound the async-dispatch runahead: on this backend each
                # in-flight step holds host-side buffers, and a 1000-step
                # unsynced stretch OOM-killed the host at 130 GB.  One
                # scalar readback (~0.3 s) every 200 steps caps the queue.
                float(metrics["loss"])
        loss = float(metrics["loss"])
        c1, c2, call = eval_per_speaker(trainer, state, eval_b, tok,
                                        lip_mode=train_mode)
        curve[str(target)] = {"loss": round(loss, 4), "cer1": round(c1, 4),
                              "cer2": round(c2, 4), "cer": round(call, 4)}
        if verbose or True:
            print(f"[{arm} s{seed} @{step}] loss={loss:.3f} "
                  f"cer={call:.4f} ({c1:.3f}/{c2:.3f}) "
                  f"{time.time() - t0:.0f}s", flush=True)

    result = {"arm": arm, "seed": seed, "curve": curve,
              "final": curve[str(STEP_GRID[-1])],
              "train_wall_s": round(time.time() - t0, 1),
              "device": str(jax.devices()[0])}

    if arm == "av":
        # Lip-corruption probes on the TRAINED model: if fusion ignores
        # lips, zeroing/shuffling them at eval changes nothing.
        for probe, mode in (("eval_zero_lips", "zero"),
                            ("eval_shuffled_lips", "shuffle")):
            c1, c2, call = eval_per_speaker(trainer, state, eval_b, tok,
                                            lip_mode=mode)
            result[probe] = {"cer1": round(c1, 4), "cer2": round(c2, 4),
                             "cer": round(call, 4)}
            print(f"[{arm} s{seed}] {probe}: cer={call:.4f}", flush=True)
    return result


# -- persistence / aggregation -------------------------------------------------

PARTIAL = os.path.join(REPO, "benchmarks", "av_ablation_cells.json")
OUT = os.path.join(REPO, "benchmarks", "av_ablation.json")


def fingerprint():
    return {"steps": TOTAL_STEPS, "batch": BATCH, "lip": LIP,
            "max_chars": MAX_CHARS, "min_chars": MIN_CHARS,
            "d_audio": D_AUDIO, "audio_layers": AUDIO_LAYERS, "lr": LR}


def load_cells():
    if os.path.isfile(PARTIAL):
        with open(PARTIAL) as f:
            doc = json.load(f)
        if doc.get("fingerprint") == fingerprint():
            return doc["cells"]
        print("cell cache fingerprint mismatch — discarding", flush=True)
    return {}


def save_cells(cells):
    with open(PARTIAL, "w") as f:
        json.dump({"fingerprint": fingerprint(), "cells": cells}, f, indent=1)


def aggregate(cells):
    tok = load_tokenizer()
    arms_out = {}
    for arm in ARMS:
        rows = [cells[k] for k in cells if cells[k]["arm"] == arm]
        if not rows:
            continue
        finals = [r["final"]["cer"] for r in rows]
        arms_out[arm] = {
            "n_seeds": len(rows),
            "final_cer": {"mean": round(float(np.mean(finals)), 4),
                          "std": round(float(np.std(finals)), 4),
                          "per_seed": finals},
            "final_cer1": [r["final"]["cer1"] for r in rows],
            "final_cer2": [r["final"]["cer2"] for r in rows],
            "curves": {str(r["seed"]): r["curve"] for r in rows},
        }
    probes = {}
    for probe in ("eval_zero_lips", "eval_shuffled_lips"):
        vals = [cells[k][probe]["cer"] for k in cells
                if cells[k]["arm"] == "av" and probe in cells[k]]
        if vals:
            probes[probe] = {"mean": round(float(np.mean(vals)), 4),
                             "per_seed": vals}

    out = {
        "task": "two-speaker mixture -> per-speaker transcripts "
                "(the reference's headline task, model/trainer.py:179-252)",
        "corpus": "real AI-Hub transcripts as two-tone chords; overlap "
                  "frames superimpose two chords (audio-ambiguous), lips "
                  "carry the target's chord (data/structured.py)",
        "fingerprint": fingerprint(),
        "overlap_token_fraction": round(
            overlap_token_fraction(batch_stream(tok, 77, 4)), 4),
        "arms": arms_out,
        "trained_av_lip_corruption_probes": probes,
    }
    if "av" in arms_out and "audio_only" in arms_out:
        av = arms_out["av"]["final_cer"]["mean"]
        ao = arms_out["audio_only"]["final_cer"]["mean"]
        out["visual_marginal_cer"] = round(ao - av, 4)
        out["summary"] = (
            f"lips are worth {ao - av:+.3f} CER at matched budget "
            f"(audio_only {ao:.3f} -> av {av:.3f})")
    if "av" in arms_out and "no_contrastive" in arms_out:
        out["contrastive_marginal_cer"] = round(
            arms_out["no_contrastive"]["final_cer"]["mean"]
            - arms_out["av"]["final_cer"]["mean"], 4)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("arms",)}, indent=1))
    print("wrote", OUT)


def main(only_arm=None, only_seed=None, pilot=False):
    global TOTAL_STEPS, STEP_GRID, N_SEEDS
    if pilot:
        res = run_cell(only_arm or "av", only_seed or 0, verbose=True)
        print(json.dumps(res, indent=1))
        return
    cells = load_cells()
    for arm in (ARMS if only_arm is None else [only_arm]):
        for seed in (range(N_SEEDS) if only_seed is None else [only_seed]):
            key = f"{arm}:{seed}"
            if key in cells:
                print(f"=== {key} (cached) ===", flush=True)
                continue
            print(f"=== {key} ===", flush=True)
            cells[key] = run_cell(arm, seed)
            save_cells(cells)
    if only_arm is None and only_seed is None:
        aggregate(cells)


if __name__ == "__main__":
    arm = seed = None
    pilot = False
    for a in sys.argv[1:]:
        if a.startswith("--arm="):
            arm = a.split("=", 1)[1]
        elif a.startswith("--seed="):
            seed = int(a.split("=", 1)[1])
        elif a == "--pilot":
            pilot = True
        elif a.startswith("--steps="):
            TOTAL_STEPS = int(a.split("=", 1)[1])
            STEP_GRID = tuple(s for s in (500, 1000, 2000, 3000, 4000, 6000,
                                          8000, 12000, 16000, 24000)
                              if s < TOTAL_STEPS) + (TOTAL_STEPS,)
        elif a.startswith("--batch="):
            BATCH = int(a.split("=", 1)[1])
        elif a.startswith("--warmup="):
            WARMUP = int(a.split("=", 1)[1])
        elif a.startswith("--lr="):
            LR = float(a.split("=", 1)[1])
        elif a == "--aggregate":
            aggregate(load_cells())
            sys.exit(0)
    main(arm, seed, pilot)
