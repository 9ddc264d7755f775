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
import os
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
    if not use_beam or config.decode.algorithm == "greedy":
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
    quantize: bool = False              # int8 weight-only serving (ops/quantize.py)
    quantize_min_size: int = 4096       # leave small kernels fp (noise bytes)

    def __post_init__(self):
        dtype = self.dtype or jax.numpy.bfloat16
        self.model = MultiSpeakerAVModel(self.config.model, dtype=dtype)
        if self.quantize:
            from .ops.quantize import dequantize_variables, quantize_variables

            self.qvariables, self.scales = quantize_variables(
                self.variables, self.quantize_min_size)
            # Serve from the int8 form only: the fp copy is dropped so host +
            # device residency actually halves (the point of quantizing).
            self.variables = None
            self._forward = jax.jit(
                lambda qv, sc, *args: self.model.apply(
                    dequantize_variables(qv, sc, dtype), *args))
            self._fwd_args = (self.qvariables, self.scales)
        else:
            self._forward = jax.jit(
                lambda v, *args: self.model.apply(v, *args)
            )
            self._fwd_args = (self.variables,)

    @classmethod
    def from_checkpoint(cls, config: Config, tokenizer, path, example_batch: dict,
                        dtype=None, quantize: bool = False,
                        quantize_min_size: int = 4096):
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
        from flax import serialization

        state = ckpt.get("state", ckpt)
        params = state.get("params", state) if isinstance(state, dict) else state.params
        variables = dict(variables)
        # Restore by name into the init template (never by flattened leaf
        # order — that silently mispairs on any traversal-order difference).
        variables["params"] = serialization.from_state_dict(
            variables["params"], params)
        # BatchNorm (the default visual norm) predicts with RUNNING statistics:
        # restore them too, or eval would run on init-value stats.
        stats = state.get("batch_stats") if isinstance(state, dict) else state.batch_stats
        if stats and "batch_stats" in variables:
            variables["batch_stats"] = serialization.from_state_dict(
                variables["batch_stats"], stats)
        return cls(config, tokenizer, variables, dtype, quantize,
                   quantize_min_size)

    def transcribe(self, batch: dict, use_beam: bool = True):
        """Batch dict (collate_pairs layout) → list of per-speaker texts."""
        out = self._forward(
            *self._fwd_args,
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


def export_transcriber(t: Transcriber, out_dir: str, example_batch: dict,
                       use_beam: bool = True) -> None:
    """Package the full serving computation as a deployment artifact.

    Writes to ``out_dir``:
      ``model.stablehlo``  — ``jax.export`` serialization of ONE jitted
                             function: forward + on-device decode
                             (ids out, not logits);
      ``params.ckpt``      — the variables (msgpack checkpoint);
      ``lm.npy``           — the fusion LM table, if configured;
      ``meta.json``        — input shapes/dtypes + decode settings.

    The artifact reloads with ``ExportedTranscriber.load`` and serves
    WITHOUT the model classes or config — the computation is frozen in the
    blob.  Shapes are static (one artifact per bucket shape, matching the
    framework's bucketed batching); params are an *argument* of the
    exported function, not a constant, so the blob stays small and the
    remote-compile size limit is never hit.
    """
    import json

    from jax import export as jax_export

    from .train.checkpoints import save_checkpoint

    os.makedirs(out_dir, exist_ok=True)
    lm = _fusion_lm(t.config)
    cfg = t.config
    quantized = bool(getattr(t, "quantize", False))

    def _apply(variables, *args):
        if quantized:
            from .ops.quantize import dequantize_variables

            variables = dequantize_variables(
                variables["qvariables"], variables["scales"],
                t.dtype or jax.numpy.bfloat16)
        return t.model.apply(variables, *args)

    def serve(variables, lm_table, lip1, lip2, audio, mask1, mask2, l1, l2):
        out = _apply(variables, lip1, lip2, audio, mask1, mask2, l1, l2)
        blank = cfg.model.decoder.blank_id
        if not use_beam:
            ids1, len1 = ctc_greedy_decode(out["log_probs1"], out["input_lengths1"], blank)
            ids2, len2 = ctc_greedy_decode(out["log_probs2"], out["input_lengths2"], blank)
            return ids1, len1, ids2, len2
        def beam(lp, lens):
            if cfg.decode.algorithm == "prefix_beam":
                ids, out_len, _ = prefix_beam_search_decode(
                    lp, lens, cfg.decode.beam_width, cfg.decode.prefix_top_k,
                    blank, lm=lm_table,
                    lm_weight=cfg.decode.lm_weight if lm_table is not None else 0.0,
                    length_bonus=(cfg.decode.length_bonus
                                  if lm_table is not None else 0.0))
            else:
                ids, out_len, _ = beam_search_decode(
                    lp, lens, cfg.decode.beam_width, blank)
            return ids, out_len

        ids1, len1 = beam(out["log_probs1"], out["input_lengths1"])
        ids2, len2 = beam(out["log_probs2"], out["input_lengths2"])
        return ids1, len1, ids2, len2

    import jax.numpy as jnp

    keys = ("lip1", "lip2", "audio", "mask1", "mask2",
            "lip1_lengths", "lip2_lengths")
    batch_structs = [
        jax.ShapeDtypeStruct(np.asarray(example_batch[k]).shape,
                             np.asarray(example_batch[k]).dtype)
        for k in keys
    ]
    var_arg = ({"qvariables": t.qvariables, "scales": t.scales}
               if quantized else t.variables)
    var_struct = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        var_arg)
    lm_struct = (None if lm is None
                 else jax.ShapeDtypeStruct(lm.shape, np.float32))
    exp = jax_export.export(jax.jit(serve))(var_struct, lm_struct, *batch_structs)

    with open(os.path.join(out_dir, "model.stablehlo"), "wb") as f:
        f.write(exp.serialize())
    save_checkpoint(os.path.join(out_dir, "params.ckpt"), var_arg)
    if lm is not None:
        np.save(os.path.join(out_dir, "lm.npy"), np.asarray(lm))
    import shutil

    vocab_src = getattr(t.tokenizer, "vocab_path", None)
    if vocab_src and os.path.isfile(vocab_src):
        shutil.copy(vocab_src, os.path.join(out_dir, "vocab.txt"))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({
            "keys": list(keys),
            "shapes": {k: list(np.asarray(example_batch[k]).shape) for k in keys},
            "use_beam": use_beam,
            "algorithm": cfg.decode.algorithm,
            "has_lm": lm is not None,
            "quantized": quantized,
        }, f, indent=2)


@dataclasses.dataclass
class ExportedTranscriber:
    """Serve from an ``export_transcriber`` artifact — no model code, no
    config, no retracing; the computation is frozen in the StableHLO blob."""

    exported: Any
    variables: Any
    tokenizer: Any
    lm: Any = None

    @classmethod
    def load(cls, out_dir: str, tokenizer=None):
        from jax import export as jax_export

        from .train.checkpoints import restore_checkpoint

        with open(os.path.join(out_dir, "model.stablehlo"), "rb") as f:
            exported = jax_export.deserialize(f.read())
        variables = restore_checkpoint(os.path.join(out_dir, "params.ckpt"))
        lm_path = os.path.join(out_dir, "lm.npy")
        lm = np.load(lm_path) if os.path.isfile(lm_path) else None
        if tokenizer is None:
            from .text import CharTokenizer

            tokenizer = CharTokenizer(os.path.join(out_dir, "vocab.txt"))
        return cls(exported, variables, tokenizer, lm)

    def transcribe(self, batch: dict):
        args = [self.variables]
        args.append(None if self.lm is None else self.lm)
        for k in ("lip1", "lip2", "audio", "mask1", "mask2",
                  "lip1_lengths", "lip2_lengths"):
            args.append(np.asarray(batch[k]))
        ids1, len1, ids2, len2 = self.exported.call(*args)
        ids1, len1 = np.asarray(ids1), np.asarray(len1)
        ids2, len2 = np.asarray(ids2), np.asarray(len2)
        return [
            (self.tokenizer.decode(ids1[b, : len1[b]].tolist()),
             self.tokenizer.decode(ids2[b, : len2[b]].tolist()))
            for b in range(ids1.shape[0])
        ]


@dataclasses.dataclass
class AudioTranscriber:
    """Audio-only CTC serving path (BASELINE config 1)."""

    config: Config
    tokenizer: Any
    variables: Any
    dtype: Any = None
    quantize: bool = False
    quantize_min_size: int = 4096

    def __post_init__(self):
        dtype = self.dtype or jax.numpy.bfloat16
        self.model = AudioOnlyCTC(self.config.model, dtype=dtype)
        if self.quantize:
            from .ops.quantize import dequantize_variables, quantize_variables

            self.qvariables, self.scales = quantize_variables(
                self.variables, self.quantize_min_size)
            self.variables = None
            self._forward = jax.jit(
                lambda qv, sc, a, m: self.model.apply(
                    dequantize_variables(qv, sc, dtype), a, m))
            self._fwd_args = (self.qvariables, self.scales)
        else:
            self._forward = jax.jit(lambda v, a, m: self.model.apply(v, a, m))
            self._fwd_args = (self.variables,)

    def transcribe(self, audio, sample_mask=None, use_beam: bool = True):
        log_probs, lengths = self._forward(*self._fwd_args, audio, sample_mask)
        ids, out_len = decode_ids(self.config, log_probs, lengths, use_beam)
        ids, out_len = np.asarray(ids), np.asarray(out_len)
        return [
            self.tokenizer.decode(ids[b, : out_len[b]].tolist())
            for b in range(ids.shape[0])
        ]
