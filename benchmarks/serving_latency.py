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
    """Poisson arrivals at ``rate`` for ``duration`` s.  Returns
    ``(admitted_latencies_ms, n_rejected, n_shed)``: rejected = refused at
    submit (Overloaded, bounded-queue arm only), shed = accepted then
    deadline-shed before execution."""
    from multimodal_av_model_tpu.serve import DeadlineExceeded, Overloaded

    lat = []
    lock = threading.Lock()
    futs = []
    rejected = 0
    t_end = time.monotonic() + duration
    while time.monotonic() < t_end:
        wave = (rng.standard_normal(int(SECONDS * 16000)) * 0.1).astype(
            np.float32)
        t0 = time.monotonic()
        try:
            fut = svc.submit(wave)
        except Overloaded:
            rejected += 1
            time.sleep(rng.exponential(1.0 / rate))
            continue

        def done(f, t0=t0):
            if f.exception() is None:
                with lock:
                    lat.append((time.monotonic() - t0) * 1000.0)

        fut.add_done_callback(done)
        futs.append(fut)
        time.sleep(rng.exponential(1.0 / rate))
    shed = 0
    for f in futs:
        try:
            f.result(120)
        except DeadlineExceeded:
            shed += 1
    return lat, rejected, shed


def summarize(lat, n_before, stats, duration):
    if not lat:
        return {"requests": 0, "achieved_rps": 0.0, "mean_batch": 0.0}
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

    # Arm 3 (overload): bounded queue + deadline vs the unbounded batcher at
    # 2x measured capacity.  The unbounded run's p99 diverges with queue
    # depth (13.2 s at rps_200 pre-round-4); the bounded run must show
    # bounded admitted-latency p99 + an explicit measured rejection rate.
    arms = (
        ("batched", dict(max_batch=MAX_BATCH)),
        ("batch1", dict(max_batch=1)),
        ("overload_bounded", dict(max_batch=MAX_BATCH, max_queue=64,
                                  deadline_ms=2000.0)),
    )
    for arm, svc_kw in arms:
        t = AudioTranscriber(cfg, tok, variables)
        svc = AudioService(t, max_seconds=SECONDS, max_wait_ms=10.0,
                           use_beam=True, **svc_kw)
        for _ in range(WARMUP):            # compile + steady-state
            # First call compiles the serving step (can exceed the 60 s
            # default future timeout on a tunneled backend) — wait it out.
            svc.transcribe((rng.standard_normal(S) * 0.1).astype(np.float32),
                           timeout=600.0)
        out[arm] = {}
        rates = {"batched": RATES, "batch1": RATES[:2],
                 "overload_bounded": (200,)}[arm]
        for rate in rates:
            before = copy.copy(svc.batcher.stats)
            lat, rejected, shed = run_load(svc, rate, DURATION, rng)
            s = summarize(lat, before, svc.batcher.stats, DURATION)
            if arm == "overload_bounded":
                offered = len(lat) + rejected + shed
                s.update({
                    "offered": offered,
                    "rejected_at_submit": rejected,
                    "deadline_shed": shed,
                    "rejection_rate": round((rejected + shed)
                                            / max(offered, 1), 3),
                    "max_queue": svc_kw["max_queue"],
                    "deadline_ms": svc_kw["deadline_ms"],
                })
            out[arm][f"rps_{rate}"] = s
            print(f"{arm}@{rate}rps: {s}", flush=True)
        svc.close()

    out["note"] = (
        "Absolute latencies include host->device transfer of the "
        "[32, 128000] float32 audio batch (16.4 MB) over this environment's "
        "TCP tunnel (~0.3-0.5 s/batch); on local PCIe/ICI that term is ~ms. "
        "batched-vs-batch1 is transfer-matched per utterance. The "
        "overload_bounded arm offers 2x capacity against max_queue + "
        "deadline: admitted p99 stays bounded and the rejection rate is "
        "explicit, vs the unbounded batcher whose p99 diverges with queue "
        "depth (rps_200 in `batched`).")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "serving_latency.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
