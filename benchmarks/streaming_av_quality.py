#!/usr/bin/env python
"""Streaming quality for the TWO-SPEAKER AV flagship: streamed vs offline.

streaming_quality.py measured the audio-only path; the flagship claim ("the
cocktail-party model itself streams", streaming.py:StreamingAVTranscriber)
had tests but no accuracy number (VERDICT r4 weak #5).  This benchmark
closes it at the converged mixture-task operating point from
benchmarks/flagship_ceiling.py.

Protocol — streamed CONVERSATIONS, in-distribution content:
the training corpus is short utterances (3-7 chars), so a meaningful stream
is a SESSION: K consecutive pairs concatenated per speaker (lips + mixed
audio back-to-back, zero-padded lip gaps where one speaker's utterance is
shorter).  Per-speaker reference = concatenated transcripts.  Arms:

  offline_stream_conv   whole session in ONE window (chunk=session,
                        context=0) through the SAME streaming forward —
                        i.e. no truncation, but the live-stream mask
                        convention (no oracle overlap masks: every valid
                        sample is "target present", streaming.py docstring);
  streamed              chunk 1 s / context 4 s (production defaults);
                        greedy AND carried prefix-beam decodes.

The offline-vs-streamed delta is the TRUNCATION cost; the gap between
flagship_ceiling.json (oracle masks, per-utterance) and offline_stream_conv
is the MASK-CONVENTION cost — reported separately so neither hides in the
other.  Writes an "av" section into benchmarks/streaming_quality.json.
Run on the TPU after flagship_ceiling.py (reuses its checkpoint).
"""

import json
import os
import pickle
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from av_ablation import (  # noqa: E402
    FRAMES_PER_TOKEN, LIP, MAX_CHARS, MIN_CHARS, load_tokenizer, make_cfg,
)

CKPT = "/tmp/flagship_ceiling_params.pkl"
N_SESSIONS = 16
SEGMENTS = 6
SPF = 534
SESSION_FRAMES = SEGMENTS * MAX_CHARS * FRAMES_PER_TOKEN   # fixed shape: 168
CHUNK_F = 30                   # 1 s of video
CONTEXT_F = 120                # 4 s


def build_sessions(tok, seed):
    """K-segment two-speaker sessions at ONE padded length.  Returns a list
    of (lips1 [F,1,H,W], lips2, audio [F*SPF], ref1, ref2)."""
    from multimodal_av_model_tpu.data.structured import (
        RealTextStructuredSource, load_reference_sentences,
    )

    src = RealTextStructuredSource(
        tok, load_reference_sentences("/root/reference/input_texts"),
        seed=seed, max_chars=MAX_CHARS, min_chars=MIN_CHARS, lip_size=LIP,
        frames_per_token=FRAMES_PER_TOKEN)
    sessions = []
    for _ in range(N_SESSIONS):
        lips = [[], []]
        audio = []
        refs = ["", ""]
        for _ in range(SEGMENTS):
            pair = src.load_pair()
            seg_samples = pair["audio"].shape[0]
            seg_f = -(-seg_samples // SPF)
            audio.append(np.pad(pair["audio"],
                                (0, seg_f * SPF - seg_samples)))
            for s, key in ((0, "lip1"), (1, "lip2")):
                lp = pair[key]
                pad = np.zeros((seg_f - lp.shape[0], 1, LIP, LIP),
                               np.float32)
                lips[s].append(np.concatenate([lp, pad]))
            refs[0] += tok.decode(pair["label1"].tolist())
            refs[1] += tok.decode(pair["label2"].tolist())
        l1 = np.concatenate(lips[0])
        l2 = np.concatenate(lips[1])
        a = np.concatenate(audio)
        F = l1.shape[0]
        assert F <= SESSION_FRAMES, (F, SESSION_FRAMES)
        padf = SESSION_FRAMES - F
        l1 = np.concatenate([l1, np.zeros((padf, 1, LIP, LIP), np.float32)])
        l2 = np.concatenate([l2, np.zeros((padf, 1, LIP, LIP), np.float32)])
        a = np.pad(a, (0, SESSION_FRAMES * SPF - a.shape[0]))
        sessions.append((l1, l2, a, refs[0], refs[1]))
    return sessions


def run_arm(cfg, tok, variables, sessions, chunk_f, context_f, algorithm):
    from multimodal_av_model_tpu.ops.metrics import cer
    from multimodal_av_model_tpu.streaming import StreamingAVTranscriber

    s = StreamingAVTranscriber(
        cfg, tok, variables, chunk_frames=chunk_f, context_frames=context_f,
        lip_size=LIP, algorithm=algorithm)
    refs = {0: [], 1: []}
    hyps = {0: [], 1: []}
    t0 = time.time()
    for l1, l2, a, r1, r2 in sessions:
        texts = ["", ""]
        # Feed in ~0.5 s blocks (any block size; chunking is internal).
        for i in range(0, SESSION_FRAMES, 15):
            t1, t2 = s.feed(l1[i:i + 15], l2[i:i + 15],
                            a[i * SPF:(i + 15) * SPF])
            texts[0] += t1
            texts[1] += t2
        t1, t2 = s.flush()
        texts[0] += t1
        texts[1] += t2
        for sp, r in ((0, r1), (1, r2)):
            refs[sp].append(r)
            hyps[sp].append(texts[sp])
    wall = time.time() - t0
    return {
        "cer1": round(cer(refs[0], hyps[0]), 4),
        "cer2": round(cer(refs[1], hyps[1]), 4),
        "cer": round(cer(refs[0] + refs[1], hyps[0] + hyps[1]), 4),
        "wall_s_per_session": round(wall / len(sessions), 2),
    }


def main():
    import jax

    tok = load_tokenizer()
    cfg = make_cfg(tok)
    if not os.path.isfile(CKPT):
        raise SystemExit(f"{CKPT} missing - run benchmarks/flagship_ceiling.py "
                         f"first (it saves the converged checkpoint)")
    with open(CKPT, "rb") as f:
        ck = pickle.load(f)
    variables = {"params": ck["params"]}
    if ck.get("batch_stats"):
        variables["batch_stats"] = ck["batch_stats"]

    sessions = build_sessions(tok, seed=4242)
    arms = {}
    for name, chunk_f, ctx_f, algo in (
            ("offline_stream_conv_greedy", SESSION_FRAMES, 0, "greedy"),
            ("streamed_greedy", CHUNK_F, CONTEXT_F, "greedy"),
            ("offline_stream_conv_beam", SESSION_FRAMES, 0, "prefix_beam"),
            ("streamed_beam", CHUNK_F, CONTEXT_F, "prefix_beam")):
        arms[name] = run_arm(cfg, tok, variables, sessions, chunk_f, ctx_f,
                             algo)
        print(f"{name}: {arms[name]}", flush=True)

    av = {
        "checkpoint": "flagship_ceiling.py converged operating point",
        "sessions": N_SESSIONS, "segments_per_session": SEGMENTS,
        "session_frames": SESSION_FRAMES,
        "chunk_s": CHUNK_F / 30.0, "context_s": CONTEXT_F / 30.0,
        "arms": arms,
        "truncation_cost_greedy": round(
            arms["streamed_greedy"]["cer"]
            - arms["offline_stream_conv_greedy"]["cer"], 4),
        "truncation_cost_beam": round(
            arms["streamed_beam"]["cer"]
            - arms["offline_stream_conv_beam"]["cer"], 4),
        "device": str(jax.devices()[0]),
        "note": ("offline_stream_conv uses the SAME live-stream mask "
                 "convention as streamed (no oracle overlap masks) so the "
                 "streamed-vs-offline delta isolates left-context "
                 "truncation; compare offline_stream_conv vs "
                 "flagship_ceiling.json greedy for the mask-convention "
                 "cost on per-utterance content."),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "streaming_quality.json")
    doc = {}
    if os.path.isfile(path):
        with open(path) as f:
            doc = json.load(f)
    doc["av"] = av
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote av section ->", path)


if __name__ == "__main__":
    main()
