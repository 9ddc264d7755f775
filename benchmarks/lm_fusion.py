#!/usr/bin/env python
"""LM shallow-fusion benchmark: does a corpus bigram LM cut held-out CER?

Setup (round 3): structured pairs whose transcripts are REAL Korean
sentences — the 517 AI-Hub transcripts bundled with the reference
(reference input_texts/*.json; data/structured.RealTextStructuredSource
renders each character as a separable two-tone chord).  The label stream
therefore has the PRODUCTION character statistics: 800-way vocabulary,
heavy-tailed unigrams, real Korean bigram structure for the LM to exploit.
One small AV model is trained per seed; a bigram LM (text/ngram_lm.py) is
fitted to the TRAIN transcripts only.  The held-out set is decoded with
greedy, the plain CTC prefix beam, and the prefix beam fused with the LM at
several weights — each fusion arm WITH and WITHOUT the principled insertion
bonus ``β = -α·mean_token_logprob`` (the LM term is always negative per
emitted token, so unbonused fusion is a deletion-biased length penalty; the
first run of this benchmark measured exactly that failure).

Runs N_SEEDS independent seeds and reports per-seed results + mean/spread.

Writes benchmarks/lm_fusion.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 500
BATCH = 8
TRAIN_BATCHES = 30
BUCKET_FRAMES = 28
LM_WEIGHTS = (0.2, 0.4, 0.8)
N_SEEDS = 3
MAX_CHARS = 7


def make_config():
    from multimodal_av_model_tpu.config import Config

    cfg = Config()
    cfg.model.audio.d_model = 64
    cfg.model.audio.num_layers = 4
    cfg.model.audio.num_heads = 2
    cfg.model.audio.ffn_dim = 128
    cfg.model.audio.conv_kernel_size = 7
    cfg.model.audio.middle_layers = (1, 2)
    cfg.model.audio.output_dim = 96
    cfg.model.visual.frontend_channels = 8
    cfg.model.visual.resnet_layers = (1, 1, 1, 1)
    cfg.model.visual.resnet_channels = (8, 12, 16, 24)
    cfg.model.visual.output_dim = 24
    cfg.model.visual.norm = "group"
    cfg.model.fusion.fused_dim = 32
    cfg.model.fusion.num_heads = 2
    cfg.model.fusion.temporal_model = "transformer"
    cfg.model.contrastive.projection_dim = 16
    cfg.train.learning_rate = 1e-3
    cfg.train.audio_learning_rate = 1e-3
    cfg.train.log_every = 10_000
    return cfg


def batch_stream(tok, seed, n_batches):
    from multimodal_av_model_tpu.data.collate import BucketSpec
    from multimodal_av_model_tpu.data.pipeline import bucketed_batches
    from multimodal_av_model_tpu.data.structured import (
        RealTextStructuredSource,
        load_reference_sentences,
    )

    sents = load_reference_sentences("/root/reference/input_texts")
    src = RealTextStructuredSource(tok, sents, seed=seed, max_chars=MAX_CHARS)
    spec = BucketSpec(BUCKET_FRAMES, BUCKET_FRAMES * 534, 8)
    it = (src.load_pair() for _ in range(n_batches * BATCH))
    return list(bucketed_batches(it, [spec], BATCH, drop_last=True))


def run_seed(seed: int):
    import jax
    import jax.numpy as jnp

    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.ops.metrics import cer
    from multimodal_av_model_tpu.ops.prefix_beam_search import (
        prefix_beam_search_decode,
    )
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.text.ngram_lm import (
        mean_token_logprob,
        train_bigram_lm,
    )
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))

    train_batches = batch_stream(tok, seed=1000 * seed, n_batches=TRAIN_BATCHES)
    val_batches = batch_stream(tok, seed=1000 * seed + 99, n_batches=6)

    cfg = make_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    blank = cfg.model.decoder.blank_id

    # Bigram LM from the TRAIN transcripts only.
    seqs = []
    for b in train_batches:
        for key, lkey in (("text1", "text1_lengths"), ("text2", "text2_lengths")):
            t, ln = np.asarray(b[key]), np.asarray(b[lkey])
            seqs += [t[i, : ln[i]].tolist() for i in range(t.shape[0])]
    lm_host = train_bigram_lm(seqs, tok.vocab_size, add_k=0.01)
    lm = jnp.asarray(lm_host)
    mean_lp = mean_token_logprob(lm_host, seqs)
    print(f"LM mean token logprob: {mean_lp:.3f}", flush=True)

    trainer = MultiSpeakerTrainer(cfg, MultiSpeakerAVModel(cfg.model), tok)
    st = trainer.init_state(3 + seed, train_batches[0])
    t0 = time.time()
    for i in range(STEPS):
        st, _ = trainer.train_step(
            st, trainer._place(train_batches[i % len(train_batches)]))
    print(f"trained {STEPS} steps in {time.time()-t0:.0f}s", flush=True)

    # Collect held-out logits once; decode many ways.
    outs, refs = [], []
    for b in val_batches:
        _, out = trainer.eval_step(st, trainer._place(b))
        for sp, lkey in (("1", "text1"), ("2", "text2")):
            lp = np.asarray(out[f"log_probs{sp}"], np.float32)
            ln = np.asarray(out[f"input_lengths{sp}"])
            outs.append((lp, ln, sp))
        t1, l1 = np.asarray(b["text1"]), np.asarray(b["text1_lengths"])
        t2, l2 = np.asarray(b["text2"]), np.asarray(b["text2_lengths"])
        refs.append([
            [tok.decode(t1[i, : l1[i]].tolist()) for i in range(t1.shape[0])],
            [tok.decode(t2[i, : l2[i]].tolist()) for i in range(t2.shape[0])],
        ])

    def decode_all(lm_table, weight, bonus=0.0):
        hyps, flat_refs = [], []
        for (lp, ln, sp), ref_pair in zip(
                outs, [r for pair in refs for r in pair]):
            ids, out_len, _ = prefix_beam_search_decode(
                jnp.asarray(lp), jnp.asarray(ln),
                cfg.decode.beam_width, cfg.decode.prefix_top_k, blank,
                lm=lm_table, lm_weight=weight, length_bonus=bonus)
            ids, out_len = np.asarray(ids), np.asarray(out_len)
            hyps += [tok.decode(ids[i, : out_len[i]].tolist())
                     for i in range(ids.shape[0])]
            flat_refs += ref_pair
        return round(cer(flat_refs, hyps), 4)

    results = {"prefix_beam_no_lm": decode_all(None, 0.0)}
    for w in LM_WEIGHTS:
        results[f"lm_{w}_no_bonus"] = decode_all(lm, w)
        auto = round(-w * mean_lp, 3)
        results[f"lm_{w}_bonus_{auto}"] = decode_all(lm, w, auto)
        print(f"lm_weight={w}: no_bonus={results[f'lm_{w}_no_bonus']} "
              f"auto_bonus({auto})={results[f'lm_{w}_bonus_{auto}']}",
              flush=True)

    # Greedy reference point.
    _, _, greedy_cer, _ = trainer.evaluate(val_batches, st, use_beam=False)
    results["greedy"] = round(greedy_cer, 4)
    return results


def main():
    per_seed = {}
    for seed in range(N_SEEDS):
        print(f"=== seed {seed} ===", flush=True)
        per_seed[str(seed)] = run_seed(seed)

    keys = sorted({k for r in per_seed.values() for k in r})
    agg = {}
    for k in keys:
        vals = [r[k] for r in per_seed.values() if k in r]
        agg[k] = {"mean": round(float(np.mean(vals)), 4),
                  "std": round(float(np.std(vals)), 4),
                  "n": len(vals)}

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "lm_fusion.json")
    with open(out_path, "w") as f:
        json.dump({"steps": STEPS, "lm_weights": LM_WEIGHTS,
                   "corpus": "real AI-Hub transcripts (two-tone chords)",
                   "n_seeds": N_SEEDS,
                   "heldout_cer_per_seed": per_seed,
                   "heldout_cer": agg}, f, indent=2)
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
