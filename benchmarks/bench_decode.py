#!/usr/bin/env python
"""Serving-side benchmark: full AV inference (forward + on-device beam search
+ id→text) throughput and RTF on the attached TPU.

The reference's eval loop decodes on the host with a per-frame ``.item()``
sync (SURVEY.md §3.2); this measures our on-device pipeline end to end.
Writes benchmarks/decode.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = (8, 32)       # forward-only has no backward memory pressure, so
                        # bigger batches keep scaling (unlike training)
T_V = 120
S = T_V * 534
ROUNDS = 10


def main():
    import jax

    from multimodal_av_model_tpu.config import Config
    from multimodal_av_model_tpu.infer import Transcriber
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.text import CharTokenizer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))
    cfg = Config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.visual.norm = "group"

    rng = np.random.default_rng(0)

    def make_batch(n):
        return {
            "lip1": rng.uniform(size=(n, T_V, 1, 96, 96)).astype(np.float32),
            "lip2": rng.uniform(size=(n, T_V, 1, 96, 96)).astype(np.float32),
            "audio": (rng.standard_normal((n, S)) * 0.1).astype(np.float32),
            "mask1": rng.integers(0, 3, size=(n, S)).astype(np.int32),
            "mask2": rng.integers(0, 3, size=(n, S)).astype(np.int32),
            "lip1_lengths": np.full((n,), T_V, np.int32),
            "lip2_lengths": np.full((n,), T_V, np.int32),
        }

    b0 = make_batch(min(BATCHES))
    model = MultiSpeakerAVModel(cfg.model, dtype=jax.numpy.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        b0["lip1"], b0["lip2"], b0["audio"],
        b0["mask1"], b0["mask2"],
        b0["lip1_lengths"], b0["lip2_lengths"],
    )
    t = Transcriber(cfg, tok, variables)

    results = {}
    for n in BATCHES:
        # Pre-place once: host→device transfer rides a TCP tunnel in this
        # environment (~70 MB/batch would dominate); production feeds the
        # device via the overlapped prefetch pipeline.
        batch = {k: jax.device_put(v) for k, v in make_batch(n).items()}
        for mode, use_beam in (("beam", True), ("greedy", False)):
            texts = t.transcribe(batch, use_beam=use_beam)   # compile + sanity
            assert len(texts) == n
            t0 = time.perf_counter()
            for _ in range(ROUNDS):
                texts = t.transcribe(batch, use_beam=use_beam)
            dt = (time.perf_counter() - t0) / ROUNDS     # id→text is host work,
            results[f"{mode}_b{n}"] = {                  # included by design
                "batch": n,
                "sec_per_batch": round(dt, 4),
                "utterances_per_sec": round(n / dt, 2),
                "rtf": round((n * S / 16000) / dt, 1),
            }
            print(f"{mode}_b{n}", results[f"{mode}_b{n}"], flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "decode.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
