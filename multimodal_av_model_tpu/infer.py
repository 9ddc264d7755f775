"""Inference / serving surface: checkpoint → transcripts.

The reference has no inference entry point at all — decoding exists only
inside ``trainer.evaluate`` (reference model/trainer.py:179-252).  This
module packages it for deployment: one jitted forward + on-device beam
search per bucket shape, host work limited to id→text.

    t = Transcriber.from_checkpoint(cfg, tok, "ckpt/best_wer.ckpt")
    texts = t.transcribe(batch)     # [(speaker1_text, speaker2_text), ...]
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

from .config import Config
from .models import AudioOnlyCTC, MultiSpeakerAVModel
from .ops.beam_search import beam_search_decode
from .ops.ctc import ctc_greedy_decode
from .ops.prefix_beam_search import prefix_beam_search_decode


_LM_CACHE: dict[str, Any] = {}


def _fusion_lm(config: Config):
    """Bigram LM table for shallow fusion, cached per path ('' → None)."""
    path = config.decode.lm_path
    if not path:
        return None
    if path not in _LM_CACHE:
        from .text.ngram_lm import load_bigram_lm

        _LM_CACHE[path] = load_bigram_lm(path)
    return _LM_CACHE[path]


def decode_ids(config: Config, log_probs, lengths, use_beam: bool = True):
    """Decoder dispatch per ``config.decode.algorithm`` → ``(ids, out_len)``."""
    blank = config.model.decoder.blank_id
    if not use_beam:
        return ctc_greedy_decode(log_probs, lengths, blank)
    if config.decode.algorithm == "prefix_beam":
        lm = _fusion_lm(config)
        ids, out_len, _ = prefix_beam_search_decode(
            log_probs, lengths, config.decode.beam_width,
            config.decode.prefix_top_k, blank,
            lm=lm,
            lm_weight=config.decode.lm_weight if lm is not None else 0.0,
            length_bonus=config.decode.length_bonus if lm is not None else 0.0)
        return ids, out_len
    if config.decode.algorithm == "reference_beam":
        ids, out_len, _ = beam_search_decode(
            log_probs, lengths, config.decode.beam_width, blank)
        return ids, out_len
    raise ValueError(f"unknown decode algorithm {config.decode.algorithm!r}")


@dataclasses.dataclass
class Transcriber:
    config: Config
    tokenizer: Any
    variables: Any                      # {"params": ..., ["batch_stats": ...]}
    dtype: Any = None

    def __post_init__(self):
        dtype = self.dtype or jax.numpy.bfloat16
        self.model = MultiSpeakerAVModel(self.config.model, dtype=dtype)
        self._forward = jax.jit(
            lambda v, *args: self.model.apply(v, *args)
        )

    @classmethod
    def from_checkpoint(cls, config: Config, tokenizer, path, example_batch: dict,
                        dtype=None):
        """Build params with a jitted init at the example batch's shapes, then
        load the checkpoint's params over them (template restore).

        ``path`` may be a list of checkpoint files, in which case they are
        uniformly averaged first (``train.checkpoints.average_checkpoints``,
        the standard eval-time "model soup" trick)."""
        from .train.checkpoints import average_checkpoints, restore_checkpoint

        model = MultiSpeakerAVModel(config.model, dtype=dtype or jax.numpy.bfloat16)
        b = example_batch
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jax.numpy.asarray(b["lip1"]), jax.numpy.asarray(b["lip2"]),
            jax.numpy.asarray(b["audio"]),
            jax.numpy.asarray(b["mask1"]), jax.numpy.asarray(b["mask2"]),
            jax.numpy.asarray(b["lip1_lengths"]), jax.numpy.asarray(b["lip2_lengths"]),
        )
        if isinstance(path, (list, tuple)):
            ckpt = average_checkpoints(list(path))
        else:
            ckpt = restore_checkpoint(path)
        state = ckpt.get("state", ckpt)
        params = state.get("params", state) if isinstance(state, dict) else state.params
        variables = dict(variables)
        variables["params"] = jax.tree.unflatten(
            jax.tree.structure(variables["params"]), jax.tree.leaves(params)
        )
        # BatchNorm (the default visual norm) predicts with RUNNING statistics:
        # restore them too, or eval would run on init-value stats.
        stats = state.get("batch_stats") if isinstance(state, dict) else state.batch_stats
        if stats and "batch_stats" in variables:
            variables["batch_stats"] = jax.tree.unflatten(
                jax.tree.structure(variables["batch_stats"]), jax.tree.leaves(stats)
            )
        return cls(config, tokenizer, variables, dtype)

    def transcribe(self, batch: dict, use_beam: bool = True):
        """Batch dict (collate_pairs layout) → list of per-speaker texts."""
        out = self._forward(
            self.variables,
            batch["lip1"], batch["lip2"], batch["audio"],
            batch["mask1"], batch["mask2"],
            batch["lip1_lengths"], batch["lip2_lengths"],
        )
        ids1, len1 = decode_ids(self.config, out["log_probs1"],
                                out["input_lengths1"], use_beam)
        ids2, len2 = decode_ids(self.config, out["log_probs2"],
                                out["input_lengths2"], use_beam)
        ids1, len1 = np.asarray(ids1), np.asarray(len1)
        ids2, len2 = np.asarray(ids2), np.asarray(len2)
        texts = []
        for b in range(ids1.shape[0]):
            texts.append((
                self.tokenizer.decode(ids1[b, : len1[b]].tolist()),
                self.tokenizer.decode(ids2[b, : len2[b]].tolist()),
            ))
        return texts


@dataclasses.dataclass
class AudioTranscriber:
    """Audio-only CTC serving path (BASELINE config 1)."""

    config: Config
    tokenizer: Any
    variables: Any
    dtype: Any = None

    def __post_init__(self):
        self.model = AudioOnlyCTC(self.config.model, dtype=self.dtype or jax.numpy.bfloat16)
        self._forward = jax.jit(lambda v, a, m: self.model.apply(v, a, m))

    def transcribe(self, audio, sample_mask=None, use_beam: bool = True):
        log_probs, lengths = self._forward(self.variables, audio, sample_mask)
        ids, out_len = decode_ids(self.config, log_probs, lengths, use_beam)
        ids, out_len = np.asarray(ids), np.asarray(out_len)
        return [
            self.tokenizer.decode(ids[b, : out_len[b]].tolist())
            for b in range(ids.shape[0])
        ]
