#!/usr/bin/env python
"""Online serving under load: dynamic batching latency/throughput (serve.py).

Open-loop Poisson arrivals against an ``AudioService`` wrapping the
production audio-only CTC model (12x512 Conformer, 8 s clips, on-device
prefix-beam decode).  At each offered rate we record per-request latency
(submit -> text) and the batcher's realized batch size; the batch-1 arm is
the no-batching baseline every request would pay with per-request serving
(the reference's eval loop decodes per batch on the host and has no serving
surface at all, reference model/trainer.py:179-252).

Writes benchmarks/serving_latency.json.  Run on the TPU.
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECONDS = 8.0
RATES = (25, 50, 100, 200)      # offered load, requests/s
DURATION = 8.0                  # per-rate measurement window, s
MAX_BATCH = 32
WARMUP = 3


def run_load(svc, rate, duration, rng):
    """Poisson arrivals at ``rate`` for ``duration`` s -> latency list (ms)."""
    lat = []
    lock = threading.Lock()
    futs = []
    t_end = time.monotonic() + duration
    while time.monotonic() < t_end:
        wave = (rng.standard_normal(int(SECONDS * 16000)) * 0.1).astype(
            np.float32)
        t0 = time.monotonic()
        fut = svc.submit(wave)

        def done(f, t0=t0):
            with lock:
                lat.append((time.monotonic() - t0) * 1000.0)

        fut.add_done_callback(done)
        futs.append(fut)
        time.sleep(rng.exponential(1.0 / rate))
    for f in futs:
        f.result(120)
    return lat


def summarize(lat, n_before, stats, duration):
    a = np.asarray(lat)
    return {
        "requests": len(lat),
        "achieved_rps": round(len(lat) / duration, 1),
        "p50_ms": round(float(np.percentile(a, 50)), 1),
        "p95_ms": round(float(np.percentile(a, 95)), 1),
        "p99_ms": round(float(np.percentile(a, 99)), 1),
        "mean_batch": round(
            (stats.requests - n_before.requests)
            / max(stats.batches - n_before.batches, 1), 2),
    }


def main():
    import copy

    import jax

    from multimodal_av_model_tpu.config import Config
    from multimodal_av_model_tpu.infer import AudioTranscriber
    from multimodal_av_model_tpu.models import AudioOnlyCTC
    from multimodal_av_model_tpu.serve import AudioService
    from multimodal_av_model_tpu.text import CharTokenizer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))
    cfg = Config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.decoder.input_dim = cfg.model.audio.output_dim

    S = int(SECONDS * 16000)
    model = AudioOnlyCTC(cfg.model, dtype=jax.numpy.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((2, S), np.float32), None)
    rng = np.random.default_rng(0)

    out = {"device": str(jax.devices()[0]),
           "model": "audio-only Conformer (production width)",
           "clip_seconds": SECONDS, "max_batch": MAX_BATCH}

    for arm, max_batch in (("batched", MAX_BATCH), ("batch1", 1)):
        t = AudioTranscriber(cfg, tok, variables)
        svc = AudioService(t, max_batch=max_batch, max_seconds=SECONDS,
                           max_wait_ms=10.0, use_beam=True)
        for _ in range(WARMUP):            # compile + steady-state
            svc.transcribe((rng.standard_normal(S) * 0.1).astype(np.float32))
        out[arm] = {}
        rates = RATES if arm == "batched" else RATES[:2]
        for rate in rates:
            before = copy.copy(svc.batcher.stats)
            lat = run_load(svc, rate, DURATION, rng)
            out[arm][f"rps_{rate}"] = summarize(lat, before,
                                                svc.batcher.stats, DURATION)
            print(f"{arm}@{rate}rps: {out[arm][f'rps_{rate}']}", flush=True)
        svc.close()

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "serving_latency.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
