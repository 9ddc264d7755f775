"""Shared harness for the quality ablations: a small audio-only CTC model
trained on the REAL-TEXT chord corpus (data/structured.RealTextStructuredSource
— labels are the 517 real AI-Hub transcripts bundled with the reference,
rendered as two-tone chords; full 800-way char vocabulary, real char
distribution).

Why audio-only: the decode/LM/augmentation ablations need a trained acoustic
model whose log-probs the arms share — nothing about them needs the visual
trunk or the fusion stack, and the audio-only CTC path reaches usable CER in
~30 s of TPU time where the full AV model (with host-side lip rendering)
needs ~20 min per arm.  Quality loops stay honest AND affordable.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
MAX_CHARS = 7
SAMPLES_PER_FRAME = 534
FRAMES_PER_TOKEN = 4
MAX_SAMPLES = MAX_CHARS * FRAMES_PER_TOKEN * SAMPLES_PER_FRAME
MAX_LABEL = 8
SENTENCES_DIR = "/root/reference/input_texts"


def load_tokenizer():
    from multimodal_av_model_tpu.text import CharTokenizer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return CharTokenizer(os.path.join(root, "assets", "tokenizer800.vocab"))


def tiny_audio_cfg(tok, d_model=96, num_layers=4):
    from multimodal_av_model_tpu.config import Config

    cfg = Config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.audio.d_model = d_model
    cfg.model.audio.num_layers = num_layers
    cfg.model.audio.num_heads = 4
    cfg.model.audio.ffn_dim = 2 * d_model
    cfg.model.audio.output_dim = d_model
    cfg.model.audio.middle_layers = (1, 2)
    cfg.train.learning_rate = 1e-3
    return cfg


def real_sentences():
    from multimodal_av_model_tpu.data.structured import load_reference_sentences

    return load_reference_sentences(SENTENCES_DIR)


def utterances(tok, seed, n, max_chars=MAX_CHARS, corpus="real"):
    """n (audio, label) draws.

    corpus="real": chord renderings of the 517 real AI-Hub transcripts
    (800-way vocab, production char distribution).
    corpus="tone": the 12-way pure-tone corpus (data/structured.
    StructuredPairSource, markov transcripts) — adjacent token frequencies
    are acoustically confusable, so decode-search differences are visible;
    on the real corpus posteriors are sharp and all decoders tie (the JSON
    records both regimes).
    """
    from multimodal_av_model_tpu.data.structured import (
        RealTextStructuredSource, StructuredPairSource,
    )

    if corpus == "real":
        src = RealTextStructuredSource(tok, real_sentences(), seed=seed,
                                       max_chars=max_chars)
    elif corpus == "tone":
        src = StructuredPairSource(tok, seed=seed, markov=True,
                                   label_len=(3, max_chars))
    else:
        raise ValueError(corpus)
    out = []
    for _ in range(n):
        audio, _lip, label = src.one_utterance()
        out.append((audio[:MAX_SAMPLES], label))
    return out


def pack(utts, batch=BATCH, max_samples=MAX_SAMPLES, max_label=MAX_LABEL):
    """Static-shape audio batches {inputs, meta, labels, label_lengths}."""
    for i in range(0, len(utts) - batch + 1, batch):
        chunk = utts[i : i + batch]
        inputs = np.zeros((batch, max_samples), np.float32)
        meta = np.zeros((batch, max_samples), bool)
        labels = np.zeros((batch, max_label), np.int32)
        llen = np.zeros((batch,), np.int32)
        for j, (a, lab) in enumerate(chunk):
            inputs[j, : len(a)] = a
            meta[j, : len(a)] = True
            lab = lab[:max_label]
            labels[j, : len(lab)] = lab
            llen[j] = len(lab)
        yield {"inputs": inputs, "meta": meta,
               "labels": labels, "label_lengths": llen}


def train_audio_ctc(cfg, tok, seed, steps, n_train_batches=30, batch=BATCH,
                    log=print, corpus="real"):
    """Train a fresh audio-only CTC model; returns (trainer, state, loss)."""
    from multimodal_av_model_tpu.train.single_modality import make_audio_trainer

    trainer = make_audio_trainer(cfg, tok)
    train_utts = utterances(tok, seed=1000 * seed + 10,
                            n=n_train_batches * batch, corpus=corpus)
    train_b = list(pack(train_utts, batch))
    state = trainer.init_state(seed, train_b[0])
    t0 = time.time()
    loss = None
    for i in range(steps):
        state, loss = trainer.train_step(state, train_b[i % len(train_b)])
    log(f"seed {seed}: trained {steps} steps, loss={float(loss):.3f} "
        f"({time.time() - t0:.0f}s)")
    return trainer, state, float(loss)


def decode_hyps(trainer, state, eval_batches, tok, algorithm, cfg,
                lm=None, lm_weight=0.0, length_bonus=0.0):
    """Decode eval batches with one algorithm; returns (hyps, ms_per_utt)."""
    from multimodal_av_model_tpu.ops.beam_search import beam_search_decode
    from multimodal_av_model_tpu.ops.ctc import ctc_greedy_decode
    from multimodal_av_model_tpu.ops.prefix_beam_search import (
        prefix_beam_search_decode,
    )

    blank = cfg.model.decoder.blank_id
    hyps, n, t0 = [], 0, time.time()
    for b in eval_batches:
        lp, il = trainer.eval_forward(state["params"], state["batch_stats"],
                                      b["inputs"], b["meta"])
        if algorithm == "greedy":
            ids, lens = ctc_greedy_decode(lp, il, blank)
        elif algorithm == "reference_beam":
            ids, lens, _ = beam_search_decode(lp, il, cfg.decode.beam_width,
                                              blank)
        elif algorithm == "prefix_beam":
            ids, lens, _ = prefix_beam_search_decode(
                lp, il, cfg.decode.beam_width, cfg.decode.prefix_top_k, blank,
                lm=lm, lm_weight=lm_weight, length_bonus=length_bonus)
        else:
            raise ValueError(algorithm)
        ids, lens = np.asarray(ids), np.asarray(lens)
        for j in range(ids.shape[0]):
            hyps.append(tok.decode(ids[j, : lens[j]].tolist()))
            n += 1
    return hyps, (time.time() - t0) * 1000.0 / max(n, 1)


def refs_of(eval_utts, tok):
    return [tok.decode(list(lab)) for _, lab in eval_utts]


def mean_std(xs):
    a = np.asarray(xs, np.float64)
    return {"mean": round(float(a.mean()), 4),
            "std": round(float(a.std(ddof=1 if len(a) > 1 else 0)), 4),
            "per_seed": [round(float(x), 4) for x in xs]}
