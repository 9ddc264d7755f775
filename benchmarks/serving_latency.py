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


def run_load(svc, rate, duration, rng, waves):
    """Poisson arrivals at ``rate`` for ``duration`` s.

    The generator must actually OFFER the nominal rate, or an admission
    policy is blamed for the generator's own ceiling (round-4 bug: a fresh
    ``standard_normal(128000)`` per request + relative sleeps capped the
    offered load near ~95 rps while claiming 200, so the bounded arm read as
    shedding half the chip).  Hence: a pre-generated wave pool (zero
    per-request synthesis cost) and absolute-time next-arrival scheduling
    (self-correcting — a slow submit does not push every later arrival).

    Returns ``(admitted_latencies_ms, n_rejected, n_shed, n_failed, span_s)``:
    rejected = refused at submit (Overloaded), shed = accepted then
    deadline-shed before execution, failed = any other per-request error
    (counted so the offered total stays honest), span = first submit ->
    last completion (the goodput denominator: for an unbounded queue the
    drain of the backlog lands in the span, as it should).
    """
    from multimodal_av_model_tpu.serve import DeadlineExceeded, Overloaded

    lat = []
    lock = threading.Lock()
    futs = []
    rejected = 0
    t_start = time.monotonic()
    t_next = t_start
    t_end = t_start + duration
    last_done = [t_start]
    i = 0
    while True:
        now = time.monotonic()
        if now >= t_end:
            break
        if now < t_next:
            time.sleep(t_next - now)
        t0 = time.monotonic()
        try:
            fut = svc.submit(waves[i % len(waves)])

            def done(f, t0=t0):
                if f.exception() is None:
                    with lock:
                        lat.append((time.monotonic() - t0) * 1000.0)
                        last_done[0] = time.monotonic()

            fut.add_done_callback(done)
            futs.append(fut)
        except Overloaded:
            rejected += 1
        i += 1
        t_next += rng.exponential(1.0 / rate)
    t_submit_end = time.monotonic()
    shed = failed = 0
    for f in futs:
        try:
            f.result(120)
        except DeadlineExceeded:
            shed += 1
        except Exception:
            failed += 1
    with lock:
        span = max(last_done[0], t_submit_end) - t_start
    return lat, rejected, shed, failed, span


def summarize(lat, n_before, stats, span):
    if not lat:
        return {"requests": 0, "achieved_rps": 0.0, "mean_batch": 0.0}
    a = np.asarray(lat)
    return {
        "requests": len(lat),
        # Goodput: completed requests over first-submit -> last-completion.
        "achieved_rps": round(len(lat) / span, 1),
        "span_s": round(span, 2),
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
    # Pre-generated wave pool: per-request cost in the generator is ~0, so
    # the offered rate is real (see run_load docstring).
    waves = [(rng.standard_normal(S) * 0.1).astype(np.float32)
             for _ in range(64)]

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
            lat, rejected, shed, failed, span = run_load(
                svc, rate, DURATION, rng, waves)
            s = summarize(lat, before, svc.batcher.stats, span)
            offered = len(lat) + rejected + shed + failed
            s["offered_rps"] = round(offered / DURATION, 1)
            if failed:
                s["failed"] = failed
            if arm == "overload_bounded":
                s.update({
                    "offered": offered,
                    "rejected_at_submit": rejected,
                    "deadline_shed": shed,
                    "rejection_rate": round((rejected + shed + failed)
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
        "deadline: admitted p99 stays bounded, the rejection rate is "
        "explicit, and goodput (completions / first-submit->last-completion "
        "span) must stay near saturated capacity — depth-bounded admission "
        "rejects only true excess, so every service slot stays full.  The "
        "unbounded batcher at the same offered load keeps the backlog's "
        "drain inside its span, so its diverging queue shows up as latency, "
        "not phantom throughput.")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "serving_latency.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
