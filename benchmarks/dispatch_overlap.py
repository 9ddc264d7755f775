#!/usr/bin/env python
"""Production train-loop dispatch: blocking vs deferred metric readback.

``bench.py`` times the bare jitted step (one placed batch, readback only at
the end), which is the device's ceiling.  A real epoch runs through
``MultiSpeakerTrainer.train_epoch``: per step it places a HOST batch
(device_put) and — before round 3 — blocked on ``float(metrics["loss"])``,
a host↔device round trip that idles the chip between steps (expensive over
this tunneled backend).  ``train.async_dispatch`` folds metrics into
device-side running sums (one extra jitted enqueue per step, no readback)
and syncs only at log points and epoch end.

This measures the full production loop both ways at the reference batch (8)
and the frontier batch (32 + frontend remat), production model config,
synthetic host batches.  Writes benchmarks/dispatch_overlap.json.

Run on a QUIET host (concurrent pytest pollutes TPU timings).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (repo root: reuse shapes + batch builder)

STEPS_PER_EPOCH = {8: 24, 32: 10}


def main() -> None:
    import jax

    from multimodal_av_model_tpu.config import Config
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))
    rng = np.random.default_rng(0)

    out = {"device": str(jax.devices()[0]), "model": "production config",
           "video_frames": bench.VIDEO_FRAMES, "results": {}}
    for batch_size, remat in ((8, "none"), (32, "frontend")):
        steps = STEPS_PER_EPOCH[batch_size]
        # Distinct host batches so every step pays device_put like a real
        # epoch (one shared batch would let the runtime cache the transfer).
        host_batches = [bench.make_batch(rng, tok, batch_size)
                        for _ in range(steps)]
        row = {}
        for deferred in (False, True):
            cfg = Config()
            cfg.model.decoder.vocab_size = tok.vocab_size
            cfg.model.dtype = "bfloat16"
            cfg.model.visual.remat = remat
            cfg.train.async_dispatch = deferred
            cfg.train.log_every = 10_000   # no log-point syncs mid-epoch
            model = MultiSpeakerAVModel(cfg.model, dtype=jax.numpy.bfloat16)
            trainer = MultiSpeakerTrainer(cfg, model, tok)
            state = trainer.init_state(0, host_batches[0])
            # Epoch 1 compiles; epochs 2-3 measure.
            state, _, _ = trainer.train_epoch(iter(host_batches), state=state,
                                              log_fn=lambda s: None)
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                state, loss, _ = trainer.train_epoch(
                    iter(host_batches), state=state, log_fn=lambda s: None)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            row["deferred" if deferred else "blocking"] = {
                "epoch_s": round(dt, 3),
                "utt_per_sec": round(steps * batch_size / dt, 2),
                "sec_per_step": round(dt / steps, 4),
                "final_loss": round(float(loss), 4),
            }
        row["speedup"] = round(row["deferred"]["utt_per_sec"]
                               / row["blocking"]["utt_per_sec"], 3)
        out["results"][f"b{batch_size}_{remat}"] = row
        print(f"b{batch_size}: blocking {row['blocking']['utt_per_sec']} "
              f"-> deferred {row['deferred']['utt_per_sec']} utt/s "
              f"({row['speedup']}x)", flush=True)

    path = os.path.join(root, "benchmarks", "dispatch_overlap.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
