#!/usr/bin/env python
"""Headline benchmark: flagship AV-CTC training throughput on one TPU chip.

Measures utterances/sec of the full two-speaker train step (visual ResNet-18
x2, log-mel Conformer — encoded ONCE per mixture and shared across speakers,
round 3 — fused Pallas frontend on TPU by default, fusion, contrastive, CTC,
Adam update) on 4-second utterances, at the reference's production batch 8
(reference main.py:88) and at the round-3 frontier point batch 32 with
frontend-only visual remat, with an MFU estimate from the compiled step's
FLOP count.  Baseline: measured reference CPU throughput
(benchmarks/reference_cpu.json, the reference's own torch modules on the
same shapes).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N, ...}
"""

import json
import os
import time

import numpy as np

VIDEO_FRAMES = 120          # 4 s at 30 fps
SAMPLES = VIDEO_FRAMES * 534
LABEL_LEN = 20
# (batch, visual.remat) points: b16 at default remat, plus b32 with
# frontend-only remat — the round-3 frontier after the shared audio pass
# shrank the step (benchmarks/step_variants.json): 103.7 @ b16 none,
# 105.2 @ b24, 109.1 @ b32 frontend (MFU 0.30).  b8 kept as the
# reference-batch row.
BATCHES = ((8, "none"), (32, "frontend"))
FROZEN_BATCH = 32       # no visual backward → no memory pressure; bigger is
                        # better in the frozen regime
WARMUP = 2
STEPS = {8: 30, 16: 20, 24: 15, 32: 15, 48: 10}

# bf16 peak of one TPU v5e (v5litepod) chip.  NOTE: the calibrated *achieved*
# ceiling on this tunneled chip is ~93 TFLOP/s (chained 4096^3 bf16 matmuls),
# i.e. ~47% of spec; MFU here is reported against the hardware spec, the
# standard convention.
PEAK_FLOPS = {"TPU v5 lite": 197e12}


def load_baseline() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "reference_cpu.json")
    if os.path.exists(path):
        with open(path) as f:
            return float(json.load(f)["utterances_per_sec"])
    return float("nan")


def make_batch(rng, tok, batch):
    return {
        "lip1": rng.uniform(size=(batch, VIDEO_FRAMES, 1, 96, 96)).astype(np.float32),
        "lip2": rng.uniform(size=(batch, VIDEO_FRAMES, 1, 96, 96)).astype(np.float32),
        "audio": (rng.standard_normal((batch, SAMPLES)) * 0.1).astype(np.float32),
        "mask1": rng.integers(0, 3, size=(batch, SAMPLES)).astype(np.int32),
        "mask2": rng.integers(0, 3, size=(batch, SAMPLES)).astype(np.int32),
        "lip1_lengths": np.full((batch,), VIDEO_FRAMES, np.int32),
        "lip2_lengths": np.full((batch,), VIDEO_FRAMES, np.int32),
        "audio_lengths": np.full((batch,), SAMPLES, np.int32),
        "text1": rng.integers(5, tok.vocab_size, size=(batch, LABEL_LEN)).astype(np.int32),
        "text1_lengths": np.full((batch,), LABEL_LEN, np.int32),
        "text2": rng.integers(5, tok.vocab_size, size=(batch, LABEL_LEN)).astype(np.int32),
        "text2_lengths": np.full((batch,), LABEL_LEN, np.int32),
    }


def step_flops(trainer, state, placed) -> float | None:
    """FLOPs of the compiled train step (fwd + bwd + update) via XLA's cost
    analysis; None where the backend doesn't report it."""
    try:
        compiled = trainer.train_step.lower(state, placed).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis.get("flops", -1))
        return flops if flops > 0 else None
    except Exception:
        return None


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
    # Round 3: bench runs the SHIPPED defaults — BatchNorm trunk (measured
    # FASTER than the group-norm variant: 103.7 vs 101.4 utt/s @ b16) and
    # shared_audio_pass=True (the mixture is encoded once, not twice;
    # benchmarks/step_variants.json).
    cfg.model.dtype = "bfloat16"
    # frontend.use_pallas stays at auto: fused Pallas log-mel on TPU.

    rng = np.random.default_rng(0)
    device_kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(device_kind)

    def measure(trainer, batch_size):
        # (trainer carries its own cfg; see variants loop below)
        batch = make_batch(rng, tok, batch_size)
        state = trainer.init_state(0, batch)
        placed = {k: jax.device_put(v) for k, v in batch.items()}
        flops = step_flops(trainer, state, placed)

        # NOTE: on tunneled backends block_until_ready can return before the
        # device finishes; a host readback of a value that depends on every
        # step (the final loss, chained through the donated state) is the
        # only honest barrier.
        for _ in range(WARMUP):
            state, metrics = trainer.train_step(state, placed)
        float(metrics["loss"])

        steps = STEPS[batch_size]
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = trainer.train_step(state, placed)
        final_loss = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / steps

        mfu = (flops / dt / peak) if (flops and peak) else None
        return {
            "utt_per_sec": batch_size / dt,
            "sec_per_step": round(dt, 4),
            "rtf": round((batch_size * SAMPLES / 16000) / dt, 1),
            "step_tflops": round(flops / 1e12, 2) if flops else None,
            "mfu": round(mfu, 4) if mfu else None,
            "loss": round(final_loss, 4),
        }

    def trainer_for(remat, frozen=False, activation=None):
        import copy

        c = copy.deepcopy(cfg)
        c.model.visual.remat = remat
        if activation is not None:
            c.model.visual.activation = activation
        m = MultiSpeakerAVModel(c.model, dtype=jax.numpy.bfloat16)
        return MultiSpeakerTrainer(
            c, m, tok,
            frozen_prefixes=("visual_encoder",) if frozen else ())

    results = {b: measure(trainer_for(remat), b) for b, remat in BATCHES}
    for (b, remat) in BATCHES:
        results[b]["visual_remat"] = remat

    # The reference's own production regime freezes the pretrained visual
    # trunk (reference main.py:100-103); with the trunk's gradient cut XLA
    # drops its backward (~2/3 of the visual FLOPs).  Reported separately —
    # the headline stays FULL training, like-for-like with the CPU baseline.
    frozen = measure(trainer_for("none", frozen=True), FROZEN_BATCH)

    # Speed-first recipe (the reference's own relu_type option,
    # model/encoder.py:7): visual.activation=relu drops 17 per-channel PReLU
    # alpha-grad reduction passes.  Reported separately — the headline stays
    # the shipped default (prelu, weight-compat with the reference trunk).
    speed_first = measure(trainer_for("frontend", activation="relu"), 32)

    best_bs = max((b for b, _ in BATCHES),
                  key=lambda b: results[b]["utt_per_sec"])
    utt_per_sec = results[best_bs]["utt_per_sec"]
    baseline = load_baseline()
    vs = utt_per_sec / baseline if baseline == baseline else None

    print(json.dumps({
        "metric": "av_ctc_train_throughput",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": {
            "headline_batch": best_bs,
            "video_frames": VIDEO_FRAMES,
            "frontend": "pallas" if jax.default_backend() == "tpu" else "jnp",
            "per_batch": {str(b): {k: (round(v, 3) if isinstance(v, float) else v)
                                   for k, v in r.items()}
                          for b, r in results.items()},
            "frozen_visual_trunk": {
                "batch": FROZEN_BATCH,
                **{k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in frozen.items()},
            },
            "speed_first_relu": {
                "batch": 32, "visual_remat": "frontend",
                "activation": "relu",
                **{k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in speed_first.items()},
            },
            "mfu_note": f"vs {device_kind} bf16 spec peak" if peak else "no peak table entry",
            "device": str(jax.devices()[0]),
            "baseline_utt_per_sec": baseline if baseline == baseline else None,
        },
    }))


if __name__ == "__main__":
    main()
