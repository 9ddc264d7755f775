#!/usr/bin/env python
"""Host input-pipeline throughput: can the loader feed the chip?

The training headline (~87 utt/s/chip, bench.py) is measured with
device-resident batches; in production the HOST must sustain that rate.
This benchmark builds a small on-disk AI-Hub-style corpus
(data/synth_corpus.py — real WAV decode, real .npy lip clips) and measures,
on this host, utterances/sec through:

  raw      FilePairSource.load_pair_raw — decode + slice only; grayscale /
           resize / mixing / masks run ON DEVICE (data/device_pipeline.py,
           the production default ``data.device_preprocess=true``);
  host     FilePairSource.load_pair — full reference-style host
           preprocessing (the fallback path);
  cold/warm separately, to show the WavCache effect (each 5-min production
           WAV is decoded once, then sliced per utterance).

Writes benchmarks/input_pipeline.json with the sustained rates and the
ratio to the training headline.  NOTE: this container has ONE CPU core;
a production host with N cores scales the loader ~linearly (samples are
independent), so the honest capacity figure is per-core.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_UTTERANCES = 60
ROUNDS = 3
TRAIN_HEADLINE_UTT_S = 87.1     # bench.py b16 headline (BENCH round 2)


def main():
    import random

    from multimodal_av_model_tpu.data.manifest import build_data_list
    from multimodal_av_model_tpu.data.pairs import speaker_id_of
    from multimodal_av_model_tpu.data.pipeline import FilePairSource
    from multimodal_av_model_tpu.data.synth_corpus import write_synthetic_corpus
    from multimodal_av_model_tpu.text import CharTokenizer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))

    with tempfile.TemporaryDirectory() as tmp:
        paths = write_synthetic_corpus(tmp, tok, n_videos=4, sentences_per_video=8)
        entries, skipped = build_data_list(
            paths["json_folder"], paths["npy_dir"], paths["text_dir"],
            paths["wav_dir"])
        assert entries and not skipped, (len(entries), skipped)

        # Fixed speaker-distinct pair list so cold and warm passes do the
        # same work.
        rng = random.Random(0)
        pairs = []
        while len(pairs) < N_UTTERANCES:
            s1, s2 = rng.sample(entries, 2)
            if speaker_id_of(s1["text_path"]) != speaker_id_of(s2["text_path"]):
                pairs.append((s1, s2))

        src = FilePairSource(tok)

        def measure(loader_fn, label):
            # Cold: first pass decodes every WAV (cache miss).
            src._wavs._cache.clear()
            t0 = time.perf_counter()
            for s1, s2 in pairs:
                loader_fn(s1, s2)
            cold = len(pairs) / (time.perf_counter() - t0)
            # Warm: WavCache holds the decoded files.
            t0 = time.perf_counter()
            for _ in range(ROUNDS):
                for s1, s2 in pairs:
                    loader_fn(s1, s2)
            warm = ROUNDS * len(pairs) / (time.perf_counter() - t0)
            print(f"{label}: cold {cold:.1f} utt/s, warm {warm:.1f} utt/s",
                  flush=True)
            return {"cold_utt_s": round(cold, 1), "warm_utt_s": round(warm, 1)}

        results = {
            "raw_device_preprocess": measure(src.load_pair_raw, "raw (device preprocess)"),
            "host_preprocess": measure(src.load_pair, "host preprocess"),
        }

    warm_raw = results["raw_device_preprocess"]["warm_utt_s"]
    out = {
        "n_utterances": N_UTTERANCES,
        "results": results,
        "train_headline_utt_s": TRAIN_HEADLINE_UTT_S,
        "cores": os.cpu_count(),
        "loader_vs_chip_ratio": round(warm_raw / TRAIN_HEADLINE_UTT_S, 2),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "input_pipeline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))


if __name__ == "__main__":
    main()
