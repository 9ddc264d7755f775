"""CTC loss (forward algorithm under ``lax.scan``) and greedy decoding, on device.

Replaces the reference's cuDNN/ATen ``nn.CTCLoss(blank, zero_infinity=True)``
(reference model/decoder.py:12, model/trainer.py:25) and host-side greedy
collapse (reference model/trainer.py:168-177) with first-party JAX:

* the forward (log-alpha) recursion runs as a single ``lax.scan`` over time
  with static shapes, batched over ``[B]`` — one compile per bucket shape;
* per-sample ``input_lengths`` / ``label_lengths`` are handled by masking, not
  ragged tensors;
* ``zero_infinity`` semantics: impossible alignments (label too long for the
  input) produce loss 0 instead of inf;
* default reduction matches torch's ``'mean'``: per-sample loss divided by its
  label length, then averaged over the batch.

All loss math is float32 regardless of the model's activation dtype (bf16
training keeps reductions in f32 — SURVEY.md §2c mixed-precision row).
Gradients come from JAX autodiff through the scan, which XLA turns into the
standard beta recursion — no custom VJP needed for these sequence lengths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _interleave_blanks(labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """``[B, L]`` labels → ``[B, 2L+1]`` extended sequence ``b l1 b l2 ... b``."""
    B, L = labels.shape
    ext = jnp.full((B, 2 * L + 1), blank_id, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    reduction: str = "mean",
    zero_infinity: bool = True,
) -> jnp.ndarray:
    """CTC negative log-likelihood.

    Args:
      log_probs: ``[B, T, V]`` log-softmaxed scores.
      labels: ``[B, L]`` int labels, padded arbitrarily past ``label_lengths``.
      input_lengths: ``[B]`` valid frames per sample.
      label_lengths: ``[B]`` valid labels per sample.
    """
    log_probs = jnp.asarray(log_probs, jnp.float32)
    labels = jnp.asarray(labels, jnp.int32)
    input_lengths = jnp.asarray(input_lengths, jnp.int32)
    label_lengths = jnp.asarray(label_lengths, jnp.int32)

    B, T, V = log_probs.shape
    ext = _interleave_blanks(labels, blank_id)            # [B, S], S = 2L+1
    S = ext.shape[1]

    # A state may receive from s-2 only when it is a non-blank that differs
    # from the non-blank two slots back (standard CTC topology).
    ext_prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank_id)[:, :S]
    allow_skip = (ext != blank_id) & (ext != ext_prev2)   # [B, S]

    lp_t = jnp.transpose(log_probs, (1, 0, 2))            # [T, B, V] time-major

    def logaddexp3(a, b, c):
        m = jnp.maximum(jnp.maximum(a, b), c)
        m_safe = jnp.maximum(m, _NEG_INF)
        out = m_safe + jnp.log(
            jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
        )
        return jnp.where(m <= _NEG_INF, _NEG_INF, out)

    def shift1(x):
        return jnp.pad(x, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :S]

    def shift2(x):
        return jnp.pad(x, ((0, 0), (2, 0)), constant_values=_NEG_INF)[:, :S]

    # t = 0: paths may start at state 0 (blank) or state 1 (first label).
    emit0 = jnp.take_along_axis(lp_t[0], ext, axis=1)     # [B, S]
    start_mask = jnp.arange(S)[None, :] < 2
    alpha0 = jnp.where(start_mask, emit0, _NEG_INF)

    end_idx = 2 * label_lengths                            # blank after last label
    end_idx_prev = jnp.maximum(end_idx - 1, 0)

    def tail_ll(alpha):
        a_last = jnp.take_along_axis(alpha, end_idx[:, None], axis=1)[:, 0]
        a_prev = jnp.take_along_axis(alpha, end_idx_prev[:, None], axis=1)[:, 0]
        both = jnp.logaddexp(jnp.maximum(a_last, _NEG_INF), jnp.maximum(a_prev, _NEG_INF))
        return jnp.where(label_lengths > 0, both, a_last)

    final0 = jnp.where(input_lengths == 1, tail_ll(alpha0), _NEG_INF)

    def step(carry, lp):
        alpha, final, t = carry
        emit = jnp.take_along_axis(lp, ext, axis=1)
        a_stay = alpha
        a_prev = shift1(alpha)
        a_skip = jnp.where(allow_skip, shift2(alpha), _NEG_INF)
        alpha_new = logaddexp3(a_stay, a_prev, a_skip) + emit
        alpha_new = jnp.maximum(alpha_new, _NEG_INF)
        # Freeze alpha past each sample's length so `final` picks the right t.
        alive = (t < input_lengths)[:, None]
        alpha_new = jnp.where(alive, alpha_new, alpha)
        final = jnp.where(t == input_lengths - 1, tail_ll(alpha_new), final)
        return (alpha_new, final, t + 1), None

    (alpha, final_ll, _), _ = jax.lax.scan(
        step, (alpha0, final0, jnp.int32(1)), lp_t[1:]
    )

    loss = -final_ll
    if zero_infinity:
        loss = jnp.where(loss >= -_NEG_INF / 2, 0.0, loss)

    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    if reduction == "mean":
        return (loss / jnp.maximum(label_lengths, 1).astype(jnp.float32)).mean()
    raise ValueError(f"unknown reduction {reduction!r}")


def ctc_loss_from_logits(logits, labels, input_lengths, label_lengths, blank_id=0, **kw):
    """Convenience wrapper applying log_softmax in f32 first (the decoder head
    surface of reference model/decoder.py:24-25)."""
    log_probs = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    return ctc_loss(log_probs, labels, input_lengths, label_lengths, blank_id, **kw)


@functools.partial(jax.jit, static_argnames=("blank_id", "pad_id"))
def ctc_collapse(
    ids: jnp.ndarray,
    lengths: jnp.ndarray,
    blank_id: int,
    pad_id: int = -1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched on-device CTC collapse: drop repeats then blanks.

    The vmap-able equivalent of the host loop in reference
    model/trainer.py:168-177 (and the tail of beam_search.py:34-42).

    Args:
      ids: ``[B, T]`` int token ids (e.g. per-frame argmax).
      lengths: ``[B]`` valid frame counts.
    Returns:
      ``(collapsed [B, T] padded with pad_id, out_lengths [B])``.
    """
    ids = jnp.asarray(ids, jnp.int32)
    B, T = ids.shape
    prev = jnp.pad(ids, ((0, 0), (1, 0)), constant_values=-1)[:, :T]
    pos = jnp.arange(T)[None, :]
    keep = (ids != prev) & (ids != blank_id) & (pos < lengths[:, None])
    new_pos = jnp.cumsum(keep, axis=1) - 1
    scatter_idx = jnp.where(keep, new_pos, T)             # T → dropped
    out = jnp.full((B, T), pad_id, dtype=jnp.int32)
    b_idx = jnp.arange(B)[:, None] * jnp.ones((1, T), jnp.int32)
    out = out.at[b_idx, scatter_idx].set(ids, mode="drop")
    return out, keep.sum(axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("blank_id", "pad_id"))
def ctc_greedy_decode(
    log_probs: jnp.ndarray,
    lengths: jnp.ndarray,
    blank_id: int,
    pad_id: int = -1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy (best-path) decode: per-frame argmax + collapse, all on device.

    Jitted at the top level: called eagerly (serving path, infer.py) each op
    would otherwise dispatch separately — pathological over a tunneled device
    (round-1 decode.json showed greedy SLOWER than width-5 beam for exactly
    this reason)."""
    ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
    return ctc_collapse(ids, lengths, blank_id, pad_id)
