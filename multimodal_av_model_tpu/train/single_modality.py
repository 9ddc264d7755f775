"""Single-modality training paths: audio-only and video-only CTC.

BASELINE.json configs 1–2: the audio-only slice (log-mel → Conformer → CTC,
the CPU-runnable minimum end-to-end path) and the video-only lipreading
slice (lip ROI → VisualEncoder → CTC).  Both share one jitted trainer over
the single-stream batch schema ``{inputs, input_meta, labels, label_lengths}``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..ops.ctc import ctc_greedy_decode, ctc_loss
from ..ops.metrics import cer, wer


@dataclasses.dataclass
class SingleModalityTrainer:
    """Jitted CTC training for a model with signature
    ``apply(vars, inputs, meta, train=...) -> (log_probs, input_lengths)``."""

    config: Config
    model: Any
    tokenizer: Any

    def __post_init__(self):
        # Honor the same train.lr_schedule / grad_clip_norm knobs as the
        # flagship trainer (they are documented on TrainConfig for every
        # family; constant-LR Adam remains the reference-parity default).
        from .trainer import make_lr_schedule

        tcfg = self.config.train
        tx = optax.adam(make_lr_schedule(tcfg, tcfg.learning_rate))
        if tcfg.grad_clip_norm:
            tx = optax.chain(optax.clip_by_global_norm(tcfg.grad_clip_norm), tx)
        self._tx = tx
        self._step = None
        self._eval = None
        self._fold = None

    def init_state(self, rng: int, batch: dict):
        key = jax.random.PRNGKey(rng)
        init_key, state_key = jax.random.split(key)
        variables = jax.jit(self.model.init)(init_key, batch["inputs"], batch["meta"])
        params = variables["params"]
        return {"params": params, "opt_state": self._tx.init(params),
                "batch_stats": variables.get("batch_stats", {}), "rng": state_key}

    def _loss(self, params, batch_stats, batch, train: bool, rng=None):
        """Threads ``batch_stats`` through apply exactly like
        MultiSpeakerTrainer._losses — the default visual config uses BatchNorm
        (config.py visual.norm='batch', reference model/encoder.py:57-75), which
        needs the collection present and mutable in train mode."""
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        kwargs = {"rngs": {"dropout": rng}} if (train and rng is not None) else {}
        if train:
            (lp, il), new_vars = self.model.apply(
                variables, batch["inputs"], batch["meta"], train=True,
                mutable=["batch_stats"] if batch_stats else [], **kwargs)
            new_stats = new_vars.get("batch_stats", batch_stats)
        else:
            lp, il = self.model.apply(variables, batch["inputs"], batch["meta"],
                                      train=False, **kwargs)
            new_stats = batch_stats
        blank = self.config.model.decoder.blank_id
        valid = batch.get("valid")
        if valid is None:
            loss = ctc_loss(lp, batch["labels"], il, batch["label_lengths"], blank)
        else:
            # Flush batches pad to full size with duplicated rows at valid=0;
            # weighting makes a flush batch's loss identical to the unpadded
            # batch (same discipline as MultiSpeakerTrainer._losses).
            per = ctc_loss(lp, batch["labels"], il, batch["label_lengths"],
                           blank, reduction="none")
            per = per / jnp.maximum(batch["label_lengths"], 1).astype(jnp.float32)
            loss = (per * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        return loss, (lp, il, new_stats)

    @property
    def train_step(self):
        if self._step is None:
            def step(state, batch):
                rng, step_rng = jax.random.split(state["rng"])
                (loss, (_, _, new_stats)), grads = jax.value_and_grad(
                    lambda p: self._loss(p, state["batch_stats"], batch, True,
                                         step_rng),
                    has_aux=True,
                )(state["params"])
                updates, opt_state = self._tx.update(grads, state["opt_state"])
                return {
                    "params": optax.apply_updates(state["params"], updates),
                    "opt_state": opt_state,
                    "batch_stats": new_stats,
                    "rng": rng,
                }, loss

            self._step = jax.jit(step, donate_argnums=(0,))
        return self._step

    @property
    def eval_forward(self):
        if self._eval is None:
            def fwd(params, batch_stats, inputs, meta):
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                return self.model.apply(variables, inputs, meta, train=False)

            self._eval = jax.jit(fwd)
        return self._eval

    def evaluate(self, batches: Iterable[dict], state, use_beam: bool = True):
        refs, hyps = [], []
        total, n = 0.0, 0
        blank = self.config.model.decoder.blank_id
        for batch in batches:
            num_real = int(batch.get("num_real", batch["inputs"].shape[0]))
            lp, il = self.eval_forward(state["params"], state["batch_stats"],
                                       batch["inputs"], batch["meta"])
            valid = batch.get("valid")
            if valid is None:
                loss = ctc_loss(lp, batch["labels"], il, batch["label_lengths"], blank)
            else:
                per = ctc_loss(lp, batch["labels"], il, batch["label_lengths"],
                               blank, reduction="none")
                per = per / np.maximum(np.asarray(batch["label_lengths"]), 1)
                loss = (np.asarray(per) * np.asarray(valid)).sum() / max(
                    float(np.asarray(valid).sum()), 1.0)
            total += float(loss)
            n += 1
            if use_beam:
                # Production decode dispatch (config.decode.algorithm:
                # prefix_beam + LM fusion / reference_beam / greedy) — the
                # same surface the flagship eval uses.
                from .trainer import decode_log_probs

                ids, lens = decode_log_probs(self.config, lp, il)
            else:
                ids, lens = ctc_greedy_decode(lp, il, blank)
            ids, lens = np.asarray(ids), np.asarray(lens)
            labels = np.asarray(batch["labels"])
            llen = np.asarray(batch["label_lengths"])
            for b in range(num_real):
                hyps.append(self.tokenizer.decode(ids[b, : lens[b]].tolist()))
                refs.append(self.tokenizer.decode(labels[b, : llen[b]].tolist()))
        return total / max(n, 1), wer(refs, hyps), cer(refs, hyps)

    def fit(self, state, train_factory: Callable, val_factory: Callable,
            log_fn=print, start_epoch: int = 1):
        from .checkpoints import CheckpointManager
        from .preempt import GracefulShutdown
        from .profiling import check_finite

        tcfg = self.config.train
        ckpts = (CheckpointManager(tcfg.checkpoint_dir,
                                   async_io=tcfg.async_checkpoint,
                                   layout=tcfg.checkpoint_layout)
                 if tcfg.checkpoint_dir else None)
        if self._fold is None:
            # Device-side loss accumulation (async_dispatch): one jitted
            # enqueue per step instead of a blocking float(loss) readback.
            self._fold = jax.jit(lambda acc, ok, x: (
                acc + x.astype(jnp.float32), ok & jnp.isfinite(x)))
        with GracefulShutdown(enable=tcfg.handle_signals) as stop:
            for epoch in range(start_epoch, tcfg.max_epochs + 1):
                total, n = 0.0, 0
                acc, ok = jnp.zeros((), jnp.float32), jnp.asarray(True)
                for batch in train_factory():
                    if stop.requested:
                        break
                    state, loss = self.train_step(state, batch)
                    if tcfg.async_dispatch:
                        acc, ok = self._fold(acc, ok, loss)
                    else:
                        loss = float(loss)
                        if tcfg.check_finite:
                            check_finite({"loss": loss}, step=n)
                        total += loss
                    n += 1
                if tcfg.async_dispatch:
                    if tcfg.check_finite and not bool(ok):
                        from .profiling import NonFiniteLossError

                        raise NonFiniteLossError(
                            f"non-finite loss within epoch {epoch}")
                    total = float(acc)
                if stop.requested:
                    if ckpts is not None:
                        ckpts.save_now({"state": state, "epoch": epoch - 1})
                        log_fn(f"preempted: saved {ckpts.last} mid-epoch "
                               f"{epoch} (resume will redo the epoch)")
                    break
                eval_loss, eval_wer, eval_cer = self.evaluate(val_factory(), state)
                log_fn(f"[epoch {epoch}] train_loss={total / max(n,1):.4f} "
                       f"eval_loss={eval_loss:.4f} wer={eval_wer:.3f} cer={eval_cer:.3f}")
                if ckpts is not None:
                    ckpts.on_epoch_end({"state": state, "epoch": epoch},
                                       eval_loss, eval_wer)
        if ckpts is not None:
            ckpts.wait()
        return state


class _AudioAdapter:
    """Adapts AudioOnlyCTC to the (inputs, meta) trainer signature where
    ``meta`` is the boolean sample mask (or None-like all-ones)."""

    def __init__(self, inner):
        self.inner = inner

    def init(self, rng, inputs, meta):
        return self.inner.init(rng, inputs, sample_mask=meta)

    def apply(self, variables, inputs, meta, train: bool = False, **kw):
        return self.inner.apply(variables, inputs, sample_mask=meta, train=train, **kw)


class _VisualAdapter:
    """Adapts VisualOnlyCTC: ``meta`` is the per-sample frame count."""

    def __init__(self, inner):
        self.inner = inner

    def init(self, rng, inputs, meta):
        return self.inner.init(rng, inputs, meta)

    def apply(self, variables, inputs, meta, train: bool = False, **kw):
        return self.inner.apply(variables, inputs, meta, train=train, **kw)


def make_audio_trainer(cfg: Config, tokenizer, dtype=None) -> SingleModalityTrainer:
    from ..models import AudioOnlyCTC

    model = _AudioAdapter(AudioOnlyCTC(cfg.model, dtype=dtype or jnp.float32))
    return SingleModalityTrainer(cfg, model, tokenizer)


def make_visual_trainer(cfg: Config, tokenizer, dtype=None) -> SingleModalityTrainer:
    from ..models import VisualOnlyCTC

    model = _VisualAdapter(VisualOnlyCTC(cfg.model, dtype=dtype or jnp.float32))
    return SingleModalityTrainer(cfg, model, tokenizer)


def utterance_batches(entries, tokenizer, family: str, batch_size: int,
                      sample_rate: int = 16000, max_samples: int = 160000,
                      max_frames: int = 448, lip_size: int = 96,
                      max_label_len: int = 128, drop_last: bool = False):
    """Real-data single-utterance batches from manifest entries.

    ``family``: 'audio' (wav segment → waveform + sample mask) or 'visual'
    (lip .npy → [T,1,96,96] frames + frame count).

    Every yielded batch has the FULL static shape: a final partial batch is
    padded to ``batch_size`` by repeating its last row with ``valid``-weight 0
    (``num_real`` records the true count) — no new XLA compile for a ragged
    leftover, and the weighted loss matches the unpadded batch exactly.  Set
    ``drop_last=True`` to drop the leftover instead (reference
    DataLoader-default semantics).
    """
    from ..data.audio_io import WavCache
    from ..data.pipeline import preprocess_lip_clip_host

    wavs = WavCache(target_sr=sample_rate)
    buf = []

    def flush():
        num_real = len(buf)
        rows = buf + [buf[-1]] * (batch_size - num_real)
        B = batch_size
        labels = np.zeros((B, max_label_len), np.int32)
        llen = np.zeros((B,), np.int32)
        for i, (x, lab) in enumerate(rows):
            lab = lab[:max_label_len]
            labels[i, : len(lab)] = lab
            llen[i] = len(lab)
        if family == "audio":
            inputs = np.zeros((B, max_samples), np.float32)
            meta = np.zeros((B, max_samples), bool)
            for i, (x, _) in enumerate(rows):
                n = min(len(x), max_samples)
                inputs[i, :n] = x[:n]
                meta[i, :n] = True
        else:
            inputs = np.zeros((B, max_frames, 1, lip_size, lip_size), np.float32)
            meta = np.zeros((B,), np.int32)
            for i, (x, _) in enumerate(rows):
                n = min(x.shape[0], max_frames)
                inputs[i, :n] = x[:n]
                meta[i] = n
        valid = np.zeros((B,), np.float32)
        valid[:num_real] = 1.0
        return {"inputs": inputs, "meta": meta,
                "labels": labels, "label_lengths": llen,
                "valid": valid, "num_real": np.int32(num_real)}

    for entry in entries:
        label = np.asarray(
            tokenizer.encode(getattr(entry, "sentence_text", "") or
                             open(entry["text_path"], encoding="utf-8").read().strip()),
            np.int64,
        )
        if family == "audio":
            x = wavs.load_segment(entry["audio_path"], entry["start_time"],
                                  entry["end_time"])
        else:
            x = preprocess_lip_clip_host(np.load(entry["lip_path"]), lip_size)
        buf.append((x, label))
        if len(buf) == batch_size:
            yield flush()
            buf = []
    if buf and not drop_last:
        yield flush()


def synthetic_audio_batches(tokenizer, batch_size: int, n_batches: int,
                            samples: int = 16000, label_len: int = 8, seed: int = 0):
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        yield {
            "inputs": (rng.standard_normal((batch_size, samples)) * 0.1).astype(np.float32),
            "meta": np.ones((batch_size, samples), bool),
            "labels": rng.integers(5, tokenizer.vocab_size,
                                   size=(batch_size, label_len)).astype(np.int32),
            "label_lengths": np.full((batch_size,), label_len, np.int32),
        }


def synthetic_visual_batches(tokenizer, batch_size: int, n_batches: int,
                             frames: int = 16, size: int = 96, label_len: int = 4,
                             seed: int = 0):
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        yield {
            "inputs": rng.uniform(size=(batch_size, frames, 1, size, size)).astype(np.float32),
            "meta": np.full((batch_size,), frames, np.int32),
            "labels": rng.integers(5, tokenizer.vocab_size,
                                   size=(batch_size, label_len)).astype(np.int32),
            "label_lengths": np.full((batch_size,), label_len, np.int32),
        }
