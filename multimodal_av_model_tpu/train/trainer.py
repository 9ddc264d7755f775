"""Training runtime: one jitted train step for the full two-speaker model.

Replaces the reference's imperative epoch loop (reference model/trainer.py:50-177)
with a functional, compiled step:

* total loss = (ctc1 + ctc2)/2 + λ·(contrast1 + contrast2)/2 with λ = 0.1
  (reference model/trainer.py:14,119);
* per-group Adam — base lr 1e-4, audio encoder 2e-5
  (reference model/trainer.py:34-39) — via ``optax.multi_transform`` over
  param-path labels, with optional frozen subtrees reproducing the
  reference's visual-trunk freeze (main.py:100-106) as ``set_to_zero``;
* bf16 activations need no GradScaler (the reference's CUDA-AMP machinery,
  trainer.py:40,121-123, has no TPU analogue: bf16 has fp32-range exponent);
* under a ``Mesh`` the same step is pjit-sharded: batch over the ``data``
  axis, params replicated; XLA inserts the gradient ``psum`` over ICI.

Eval mirrors reference ``evaluate`` (trainer.py:179-252) minus its
double-log-softmax quirk (SURVEY.md §7): loss + on-device beam search decode,
WER/CER computed on host from decoded ids.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict

from ..config import Config
from ..ops.beam_search import beam_search_decode
from ..ops.contrastive import contrastive_loss_with_mask
from ..ops.ctc import ctc_greedy_decode, ctc_loss
from ..ops.metrics import cer, wer
from .checkpoints import CheckpointManager
from .logging_utils import CsvLogger, StepTimer, TensorBoardLogger
from .profiling import NonFiniteLossError, check_finite


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray


def label_params(
    params: dict,
    frozen_prefixes: tuple[str, ...] = (),
    audio_trainable_layers: tuple[int, ...] | None = None,
) -> dict:
    """Path-label each param leaf: 'audio' for the audio encoder (low LR),
    'frozen' for frozen subtrees, 'base' otherwise.

    ``audio_trainable_layers`` reproduces the reference's partial unfreeze
    (main.py:26-31: freeze the whole audio encoder, then unfreeze encoder
    layers 6–9): only the listed conformer blocks stay trainable at the
    audio LR; every other audio-encoder param freezes.
    """
    flat = flatten_dict(params)
    trainable_blocks = (
        None if audio_trainable_layers is None
        else {f"block{i}" for i in audio_trainable_layers}
    )
    labels = {}
    for path in flat:
        joined = "/".join(str(p) for p in path)
        if any(joined.startswith(p) for p in frozen_prefixes):
            labels[path] = "frozen"
        elif "audio_encoder" in path[:2]:
            if trainable_blocks is None:
                labels[path] = "audio"
            elif any(p in trainable_blocks for p in path):
                labels[path] = "audio"
            else:
                labels[path] = "frozen"
        else:
            labels[path] = "base"
    return unflatten_dict(labels)


def make_lr_schedule(tcfg, base_lr: float):
    """Per-group LR schedule (reference: constant Adam only).  Every option
    scales from the group's base LR so the 1e-4/2e-5 split survives."""
    if tcfg.lr_schedule == "constant":
        return base_lr
    if tcfg.lr_schedule == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_lr,
            warmup_steps=max(tcfg.warmup_steps, 1),
            decay_steps=max(tcfg.decay_steps, tcfg.warmup_steps + 1),
            end_value=base_lr * tcfg.lr_min_ratio,
        )
    if tcfg.lr_schedule == "noam":
        warm = max(tcfg.warmup_steps, 1)

        def noam(step):
            s = jnp.maximum(step, 1).astype(jnp.float32)
            # Normalized so the peak (at step == warmup_steps) equals base_lr.
            return base_lr * jnp.sqrt(float(warm)) * jnp.minimum(
                jax.lax.rsqrt(s), s * warm ** -1.5
            )

        return noam
    raise ValueError(f"unknown lr_schedule {tcfg.lr_schedule!r}")


def decode_log_probs(config: Config, log_probs, lengths):
    """Production decoder dispatch per ``config.decode.algorithm`` (LM
    shallow fusion included when ``decode.lm_path`` is set — see infer.py).
    Shared by every family's eval/serving surface: the flagship trainer,
    the single-modality trainer (train/single_modality.py) and the
    standalone ``--eval``/``--infer`` CLI (main.py)."""
    dcfg = config.decode
    blank = config.model.decoder.blank_id
    if dcfg.algorithm == "greedy":
        return ctc_greedy_decode(log_probs, lengths, blank)
    if dcfg.algorithm == "prefix_beam":
        from ..infer import _fusion_lm
        from ..ops.prefix_beam_search import prefix_beam_search_decode

        lm = _fusion_lm(config)
        ids, out_len, _ = prefix_beam_search_decode(
            log_probs, lengths, dcfg.beam_width, dcfg.prefix_top_k, blank,
            lm=lm,
            lm_weight=dcfg.lm_weight if lm is not None else 0.0,
            length_bonus=dcfg.length_bonus if lm is not None else 0.0)
        return ids, out_len
    if dcfg.algorithm == "reference_beam":
        ids, out_len, _ = beam_search_decode(
            log_probs, lengths, dcfg.beam_width, blank)
        return ids, out_len
    raise ValueError(f"unknown decode algorithm {dcfg.algorithm!r}")


def make_optimizer(cfg: Config, params: dict, frozen_prefixes: tuple[str, ...] = ()):
    tcfg = cfg.train
    def adam(lr):
        chain = []
        if tcfg.grad_clip_norm:
            chain.append(optax.clip_by_global_norm(tcfg.grad_clip_norm))
        chain.append(optax.adam(make_lr_schedule(tcfg, lr)))
        return optax.chain(*chain)

    labels = label_params(params, frozen_prefixes, tcfg.audio_trainable_layers)
    tx = optax.multi_transform(
        {"base": adam(tcfg.learning_rate), "audio": adam(tcfg.audio_learning_rate),
         "frozen": optax.set_to_zero()},
        labels,
    )
    if tcfg.grad_accum_steps > 1:
        # k micro-batches average into one update; the schedule advances per
        # UPDATE (MultiSteps holds the inner step count), so warmup/decay
        # horizons are in optimizer steps regardless of k.
        tx = optax.MultiSteps(tx, every_k_schedule=tcfg.grad_accum_steps)
    return tx


@dataclasses.dataclass
class MultiSpeakerTrainer:
    """Owns the jitted steps + host orchestration for the flagship model."""

    config: Config
    model: Any                      # MultiSpeakerAVModel
    tokenizer: Any
    frozen_prefixes: tuple[str, ...] = ()
    mesh: Any = None                # optional jax.sharding.Mesh
    fsdp: bool = False              # ZeRO-style param+Adam-state sharding
                                    # over the mesh data axis (parallel/fsdp.py)

    def __post_init__(self):
        self._tx = None
        self._train_step = None
        self._eval_step = None
        self._metric_fold = None
        self._metric_nkeys = 0

    # -- state ---------------------------------------------------------------

    def init_state(self, rng, batch: dict) -> TrainState:
        init_rng, state_rng = jax.random.split(jax.random.PRNGKey(rng) if isinstance(rng, int) else rng)
        # jit the init: eager init dispatches hundreds of tiny ops one by one,
        # which is pathological on remote/tunneled devices.
        variables = jax.jit(self.model.init)(
            init_rng,
            jnp.asarray(batch["lip1"]), jnp.asarray(batch["lip2"]),
            jnp.asarray(batch["audio"]),
            jnp.asarray(batch["mask1"]), jnp.asarray(batch["mask2"]),
            jnp.asarray(batch["lip1_lengths"]), jnp.asarray(batch["lip2_lengths"]),
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self.mesh is not None:
            # Explicit placement over the mesh: wide Conformer layers shard
            # over the `model` axis (tensor parallel), everything else
            # replicates; jit propagates from there.  With fsdp=True each
            # leaf's largest free dimension additionally shards over the
            # `data` axis (ZeRO-3 via GSPMD, parallel/fsdp.py) — Adam's
            # mu/nu below are zeros_like(params) and inherit the shardings,
            # so optimizer state is sharded too.
            from ..parallel import replicate_tree, shard_params, shard_params_fsdp

            params = (shard_params_fsdp(self.mesh, params) if self.fsdp
                      else shard_params(self.mesh, params))
            batch_stats = replicate_tree(self.mesh, batch_stats)
        self._tx = make_optimizer(self.config, params, self.frozen_prefixes)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self._tx.init(params),
            rng=state_rng,
        )

    # -- loss ----------------------------------------------------------------

    def _losses(self, params, batch_stats, batch, rng, train: bool):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        # With the whole visual trunk frozen, cut its gradient at the model
        # boundary so XLA drops the visual backward entirely (the trunk
        # dominates step FLOPs) instead of computing grads set_to_zero drops.
        frozen_visual = any(p.startswith("visual_encoder")
                            for p in self.frozen_prefixes)
        kwargs = dict(train=train, stop_visual_grad=frozen_visual)
        apply_kw = {}
        if train:
            apply_kw = dict(mutable=["batch_stats"] if batch_stats else [],
                            rngs={"dropout": rng})
        result = self.model.apply(
            variables,
            batch["lip1"], batch["lip2"], batch["audio"],
            batch["mask1"], batch["mask2"],
            batch["lip1_lengths"], batch["lip2_lengths"],
            **kwargs, **apply_kw,
        )
        out, new_stats = (result if train else (result, {}))
        if train and batch_stats:
            new_stats = new_stats["batch_stats"]
        ccfg = self.config.model.contrastive
        blank = self.config.model.decoder.blank_id
        valid = batch.get("valid")
        mask_ds1, mask_ds2 = out["mask_ds1"], out["mask_ds2"]
        if valid is not None:
            # Flush batches pad to full size by duplicating rows; those rows
            # carry valid=0.  Their frames become pad (3) so the contrastive
            # loss ignores them, and their CTC losses get zero weight below —
            # a flush batch then yields the same loss as its unpadded batch.
            row_ok = valid > 0
            mask_ds1 = jnp.where(row_ok[:, None], mask_ds1, 3)
            mask_ds2 = jnp.where(row_ok[:, None], mask_ds2, 3)
        con1 = contrastive_loss_with_mask(out["contrast1"], mask_ds1,
                                          ccfg.temperature, ccfg.weight_pos_align,
                                          ccfg.weight_neg_suppress)
        con2 = contrastive_loss_with_mask(out["contrast2"], mask_ds2,
                                          ccfg.temperature, ccfg.weight_pos_align,
                                          ccfg.weight_neg_suppress)

        def weighted_ctc(lp, labels, il, ll):
            # torch 'mean' semantics (per-sample loss / label length, then
            # batch mean) with valid-row weighting.
            per = ctc_loss(lp, labels, il, ll, blank, reduction="none")
            per = per / jnp.maximum(ll, 1).astype(jnp.float32)
            if valid is None:
                return per.mean()
            return (per * valid).sum() / jnp.maximum(valid.sum(), 1.0)

        if self.config.train.contrastive_only:
            # AV-alignment pretraining (BASELINE config 4): no CTC term.
            ctc1 = ctc2 = jnp.zeros((), jnp.float32)
            total = (con1 + con2) / 2
        else:
            ctc1 = weighted_ctc(out["log_probs1"], batch["text1"],
                                out["input_lengths1"], batch["text1_lengths"])
            ctc2 = weighted_ctc(out["log_probs2"], batch["text2"],
                                out["input_lengths2"], batch["text2_lengths"])
            lam = self.config.train.lambda_contrastive
            total = (ctc1 + ctc2) / 2 + lam * (con1 + con2) / 2
        metrics = {"loss": total, "ctc1": ctc1, "ctc2": ctc2,
                   "contrast1": con1, "contrast2": con2}
        return total, (metrics, new_stats, out)

    # -- steps ---------------------------------------------------------------

    def _build_train_step(self):
        def train_step(state: TrainState, batch: dict):
            rng, step_rng = jax.random.split(state.rng)

            def loss_fn(params):
                return self._losses(params, state.batch_stats, batch, step_rng, True)

            (_, (metrics, new_stats, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = self._tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            return (
                state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt, rng=rng),
                metrics,
            )

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_eval_step(self):
        def eval_step(state: TrainState, batch: dict):
            _, (metrics, _, out) = self._losses(
                state.params, state.batch_stats, batch, state.rng, False
            )
            blank = self.config.model.decoder.blank_id
            g1, g1_len = ctc_greedy_decode(out["log_probs1"], out["input_lengths1"], blank)
            g2, g2_len = ctc_greedy_decode(out["log_probs2"], out["input_lengths2"], blank)
            return metrics, {
                "log_probs1": out["log_probs1"], "input_lengths1": out["input_lengths1"],
                "log_probs2": out["log_probs2"], "input_lengths2": out["input_lengths2"],
                "greedy1": g1, "greedy1_len": g1_len,
                "greedy2": g2, "greedy2_len": g2_len,
                # Contrastive feature taps + frame masks: consumed by the
                # feature probes (train/probe.py) and pretraining analyses.
                "contrast1": out["contrast1"], "mask_ds1": out["mask_ds1"],
                "contrast2": out["contrast2"], "mask_ds2": out["mask_ds2"],
            }

        return jax.jit(eval_step)

    @property
    def train_step(self):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        return self._train_step

    @property
    def eval_step(self):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        return self._eval_step

    # -- host orchestration ----------------------------------------------------

    def _place(self, batch: dict) -> dict:
        if self.mesh is not None:
            from ..parallel import (
                local_data_parallelism,
                pad_batch_to_multiple,
                shard_batch,
            )

            # The data axis needs a divisible batch; padded rows get valid=0
            # so they contribute nothing to the loss.  Multi-process runs
            # feed process-LOCAL rows, so the multiple is this process's
            # data-axis share, not the global axis size.
            batch = pad_batch_to_multiple(
                {k: np.asarray(v) for k, v in batch.items()},
                local_data_parallelism(self.mesh),
            )
            batch = {k: v for k, v in batch.items() if k != "num_real"}
            return shard_batch(self.mesh, batch)
        return {k: v for k, v in batch.items() if k != "num_real"}

    def train_epoch(self, batches: Iterable[dict], log_every: int | None = None,
                    log_fn: Callable[[str], None] = print, state: TrainState | None = None,
                    stop=None):
        assert state is not None
        log_every = log_every or self.config.train.log_every
        timer = StepTimer()
        total, n = 0.0, 0
        sr = self.config.data.sample_rate
        guard = self.config.train.check_finite
        deferred = self.config.train.async_dispatch
        # Async dispatch: a per-step float(metrics) is a host↔device
        # round-trip that idles the chip between steps (worse over a
        # tunneled backend).  Instead, a tiny jitted combine folds each
        # step's metrics into device-side running sums + a finiteness flag
        # (one async enqueue, no readback); the host only syncs at log
        # points and epoch end.  check_finite granularity widens from
        # per-step to per-sync — it still raises before any checkpoint.
        acc = ok = None
        last_drained = -1
        for i, batch in enumerate(batches):
            if stop is not None and stop.requested:
                break  # preemption: state is a consistent post-step snapshot
            placed = self._place(batch)
            state, metrics = self.train_step(state, placed)
            if deferred:
                acc, ok = self._fold_metrics(acc, ok, metrics)
            else:
                loss = float(metrics["loss"])
                if guard:
                    check_finite({"loss": loss}, step=i)
                total += loss
            n += 1
            timer.tick(batch["audio"].shape[0],
                       float(np.sum(batch["audio_lengths"])) / sr)
            if i % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}  # host sync
                if deferred and guard and not bool(ok):
                    raise NonFiniteLossError(
                        f"non-finite metrics in steps {last_drained + 1}..{i}")
                last_drained = i
                tp = timer.summary()
                log_fn(
                    f"[batch {i}] loss={m['loss']:.4f} ctc1={m['ctc1']:.4f} "
                    f"ctc2={m['ctc2']:.4f} con1={m['contrast1']:.4f} "
                    f"con2={m['contrast2']:.4f} gnorm={m['grad_norm']:.3f} "
                    f"utt/s={tp['utterances_per_sec']:.2f} rtf={tp['rtf']:.2f}"
                )
        if deferred and acc is not None:
            if guard and not bool(ok):
                raise NonFiniteLossError(
                    f"non-finite metrics in steps {last_drained + 1}..{n - 1}")
            total = float(acc[0])  # index 0 = "loss" (fold order)
        return state, (total / max(n, 1)), timer.summary()

    def _fold_metrics(self, acc, ok, metrics):
        """One jitted enqueue: running metric sums + all-finite flag on
        device.  Index 0 of the packed vector is the loss."""
        if self._metric_fold is None:
            keys = ("loss",) + tuple(k for k in metrics if k != "loss")

            def fold(acc, ok, m):
                packed = jnp.stack([m[k].astype(jnp.float32) for k in keys])
                return acc + packed, ok & jnp.all(jnp.isfinite(packed))

            self._metric_fold = jax.jit(fold)
            self._metric_nkeys = len(keys)
        if acc is None:
            acc = jnp.zeros(self._metric_nkeys, jnp.float32)
            ok = jnp.asarray(True)
        return self._metric_fold(acc, ok, metrics)

    def _decode(self, log_probs, lengths):
        return decode_log_probs(self.config, log_probs, lengths)

    def evaluate(self, batches: Iterable[dict], state: TrainState,
                 use_beam: bool = True):
        """Returns ``(avg_loss, avg_wer, avg_cer, per_speaker)``."""
        refs1, hyps1, refs2, hyps2 = [], [], [], []
        total, n = 0.0, 0
        for batch in batches:
            num_real = int(batch.get("num_real", batch["audio"].shape[0]))
            placed = self._place(batch)
            metrics, out = self.eval_step(state, placed)
            total += float((float(metrics["ctc1"]) + float(metrics["ctc2"])) / 2)
            n += 1
            if use_beam:
                ids1, len1 = self._decode(out["log_probs1"], out["input_lengths1"])
                ids2, len2 = self._decode(out["log_probs2"], out["input_lengths2"])
            else:
                ids1, len1 = out["greedy1"], out["greedy1_len"]
                ids2, len2 = out["greedy2"], out["greedy2_len"]
            # Multi-process: jit outputs are globally sharded; each process
            # decodes the rows it fed in (metrics aggregate below).
            from ..parallel import local_batch_rows

            ids1, len1 = local_batch_rows(ids1), local_batch_rows(len1)
            ids2, len2 = local_batch_rows(ids2), local_batch_rows(len2)
            t1, l1 = np.asarray(batch["text1"]), np.asarray(batch["text1_lengths"])
            t2, l2 = np.asarray(batch["text2"]), np.asarray(batch["text2_lengths"])
            for b in range(num_real):
                hyps1.append(self.tokenizer.decode(ids1[b, : len1[b]].tolist()))
                refs1.append(self.tokenizer.decode(t1[b, : l1[b]].tolist()))
                hyps2.append(self.tokenizer.decode(ids2[b, : len2[b]].tolist()))
                refs2.append(self.tokenizer.decode(t2[b, : l2[b]].tolist()))
        from ..ops.metrics import cer_counts, rate_from_counts, wer_counts
        from ..text.korean import jamo_counts

        # Additive error counts: exact corpus rates under multi-host eval
        # (each process scored its local rows; counts sum across processes).
        counts = np.array([
            *wer_counts(refs1, hyps1), *wer_counts(refs2, hyps2),
            *cer_counts(refs1 + refs2, hyps1 + hyps2),
            *jamo_counts(refs1 + refs2, hyps1 + hyps2),
            total, n,
        ], np.float64)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            counts = np.asarray(multihost_utils.process_allgather(counts)
                                ).sum(axis=0)
        wer1 = rate_from_counts(counts[0], counts[1])
        wer2 = rate_from_counts(counts[2], counts[3])
        cer_all = rate_from_counts(counts[4], counts[5])
        jer_all = rate_from_counts(counts[6], counts[7])
        avg_loss = counts[8] / max(counts[9], 1)
        avg_wer = (wer1 + wer2) / 2
        return avg_loss, avg_wer, cer_all, {"wer1": wer1, "wer2": wer2, "jer": jer_all}

    def fit(
        self,
        state: TrainState,
        train_factory: Callable[[], Iterable[dict]],
        val_factory: Callable[[], Iterable[dict]],
        log_fn: Callable[[str], None] = print,
        start_epoch: int = 1,
    ):
        """Full training driver: epochs, eval, rolling checkpoints, early stop
        (reference main.py:158-200 surface).  ``start_epoch > 1`` appends to
        existing CSV logs instead of truncating them (the reference truncated
        on every rerun, losing history — main.py:154-157)."""
        tcfg = self.config.train
        resume = start_epoch > 1
        ckpts = CheckpointManager(tcfg.checkpoint_dir,
                                  async_io=tcfg.async_checkpoint,
                                  layout=tcfg.checkpoint_layout)
        train_log = CsvLogger(f"{tcfg.checkpoint_dir}/train_log.csv", ["epoch", "loss"],
                              resume=resume)
        eval_log = CsvLogger(
            f"{tcfg.checkpoint_dir}/eval_log.csv",
            ["epoch", "eval_loss", "wer1", "wer2", "average_wer", "cer", "jer"],
            resume=resume,
        )
        tb = TensorBoardLogger(tcfg.tensorboard_dir)
        # Early-stop state survives resume: a resumed run continues the
        # patience count from the best.json sidecar instead of restarting it
        # (otherwise a run that stalls right before its patience limit could
        # be resumed forever without ever stopping).
        best_loss, no_improve = (
            ckpts.early_stop_state() if resume else (float("inf"), 0))
        from .preempt import GracefulShutdown

        with GracefulShutdown(enable=tcfg.handle_signals) as stop:
            for epoch in range(start_epoch, tcfg.max_epochs + 1):
                state, train_loss, throughput = self.train_epoch(
                    train_factory(), log_fn=log_fn, state=state, stop=stop
                )
                if stop.requested:
                    # Preempted mid-epoch: persist a consistent post-step
                    # snapshot as epoch-1 so resume redoes this epoch, then
                    # exit cleanly (SIGTERM grace-period protocol).
                    # The manager's writer materializes (file layout) or
                    # saves per-process shards (sharded layout) itself.
                    ckpts.save_now({"state": state, "epoch": epoch - 1})
                    log_fn(f"preempted: saved {ckpts.last} mid-epoch {epoch} "
                           f"(resume will redo the epoch)")
                    break
                eval_loss, eval_wer, eval_cer, per = self.evaluate(
                    val_factory(), state)
                log_fn(
                    f"[epoch {epoch}] train_loss={train_loss:.4f} eval_loss={eval_loss:.4f} "
                    f"wer={eval_wer:.3f} cer={eval_cer:.3f} utt/s={throughput['utterances_per_sec']:.2f}"
                )
                tb.scalars(epoch, **{
                    "train/loss": train_loss, "eval/loss": eval_loss,
                    "eval/wer": eval_wer, "eval/cer": eval_cer,
                    "eval/jer": per["jer"],
                    "throughput/utt_per_sec": throughput["utterances_per_sec"],
                })
                train_log.log(epoch=epoch, loss=f"{train_loss:.4f}")
                eval_log.log(epoch=epoch, eval_loss=f"{eval_loss:.4f}",
                             wer1=f"{per['wer1']:.4f}", wer2=f"{per['wer2']:.4f}",
                             average_wer=f"{eval_wer:.4f}", cer=f"{eval_cer:.4f}",
                             jer=f"{per['jer']:.4f}")
                # The manager snapshots device→host itself (on the writer
                # thread when async_checkpoint=true).
                ckpts.on_epoch_end({"state": state, "epoch": epoch},
                                   eval_loss, eval_wer)
                if eval_loss < best_loss:
                    best_loss = eval_loss
                    no_improve = 0
                else:
                    no_improve += 1
                ckpts.set_no_improve(no_improve)
                if no_improve >= tcfg.early_stop_patience:
                    log_fn(f"early stop after {no_improve} epochs "
                           f"without improvement")
                    break
        ckpts.wait()
        train_log.close()
        eval_log.close()
        tb.close()
        return state
