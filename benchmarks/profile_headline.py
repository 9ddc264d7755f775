#!/usr/bin/env python
"""Per-op profile of the bench headline step (b32, remat=frontend, BatchNorm,
shared audio pass) — the round-3 frontier point.

Captures a jax.profiler trace of a few steps, then aggregates device-side op
time by fusion category from the trace protobuf, so DESIGN.md §2 claims about
where the remaining (1 - MFU) goes are measured, not asserted.

Writes /tmp/headline_trace/ (TensorBoard-loadable) and prints the top ops.
Run on the TPU with an otherwise idle host.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIDEO_FRAMES = 120
SAMPLES = VIDEO_FRAMES * 534
LABEL_LEN = 20
BATCH = 32
TRACE_DIR = "/tmp/headline_trace"


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

    cfg = Config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.visual.remat = "frontend"      # the bench headline config
    model = MultiSpeakerAVModel(cfg.model, dtype=jax.numpy.bfloat16)
    trainer = MultiSpeakerTrainer(cfg, model, tok)
    state = trainer.init_state(0, batch)
    placed = {k: jax.device_put(v) for k, v in batch.items()}

    for _ in range(3):
        state, metrics = trainer.train_step(state, placed)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(10):
        state, metrics = trainer.train_step(state, placed)
    float(metrics["loss"])
    sec = (time.perf_counter() - t0) / 10
    print(f"step {sec*1e3:.1f} ms, {BATCH/sec:.1f} utt/s", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        state, metrics = trainer.train_step(state, placed)
    float(metrics["loss"])
    jax.profiler.stop_trace()

    # Aggregate device op time from the trace.
    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace file found"); return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    # device-thread events only (TPU core lanes carry 'XLA Op'/'XLA Modules')
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in trace["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device:" in n.lower() or "tpu" in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        tname = e.get("tid")
        # keep leaf op events only: the op lane has args with long_name
        if not e.get("args"):
            continue
        key = name.split(".")[0]
        agg[key] += dur
        total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    print(f"device op time over 3 traced steps: {total:.1f} ms")
    for name, ms in top:
        print(f"  {ms/3:8.2f} ms/step  {100*ms/total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
