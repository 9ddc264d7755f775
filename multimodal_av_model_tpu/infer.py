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
    def from_checkpoint(cls, config: Config, tokenizer, path: str, example_batch: dict,
                        dtype=None):
        """Build params with a jitted init at the example batch's shapes, then
        load the checkpoint's params over them (template restore)."""
        from .train.checkpoints import restore_checkpoint

        model = MultiSpeakerAVModel(config.model, dtype=dtype or jax.numpy.bfloat16)
        b = example_batch
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jax.numpy.asarray(b["lip1"]), jax.numpy.asarray(b["lip2"]),
            jax.numpy.asarray(b["audio"]),
            jax.numpy.asarray(b["mask1"]), jax.numpy.asarray(b["mask2"]),
            jax.numpy.asarray(b["lip1_lengths"]), jax.numpy.asarray(b["lip2_lengths"]),
        )
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
        blank = self.config.model.decoder.blank_id
        if use_beam:
            ids1, len1, _ = beam_search_decode(
                out["log_probs1"], out["input_lengths1"],
                self.config.decode.beam_width, blank)
            ids2, len2, _ = beam_search_decode(
                out["log_probs2"], out["input_lengths2"],
                self.config.decode.beam_width, blank)
        else:
            ids1, len1 = ctc_greedy_decode(out["log_probs1"], out["input_lengths1"], blank)
            ids2, len2 = ctc_greedy_decode(out["log_probs2"], out["input_lengths2"], blank)
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
        blank = self.config.model.decoder.blank_id
        if use_beam:
            ids, out_len, _ = beam_search_decode(
                log_probs, lengths, self.config.decode.beam_width, blank)
        else:
            ids, out_len = ctc_greedy_decode(log_probs, lengths, blank)
        ids, out_len = np.asarray(ids), np.asarray(out_len)
        return [
            self.tokenizer.decode(ids[b, : out_len[b]].tolist())
            for b in range(ids.shape[0])
        ]
