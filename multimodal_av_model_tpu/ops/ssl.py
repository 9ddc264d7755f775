"""wav2vec2-style self-supervised objective: masked-span InfoNCE.

The reference's audio features come from a pretrained wav2vec2 checkpoint
(reference model/encoder.py:83, 317M params) that cannot be shipped; the
framework pretrains its own encoder instead.  This module provides the
objective — the essential part of wav2vec 2.0 (arXiv:2006.11477) minus the
codebook quantizer: mask contiguous spans of the post-subsampler latents,
ask the context network to reconstruct each masked frame's clean latent,
scored by cosine InfoNCE against the other masked frames of the SAME sample
as distractors (static-shape: a full [T, T] similarity per sample with
invalid rows/columns masked, no sampling).

Span generation is plain NumPy on the host (one bool array per batch —
negligible), everything else jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_span_mask(
    batch: int,
    length: int,
    mask_prob: float = 0.065,
    span: int = 10,
    rng: np.random.Generator | None = None,
    min_masked: int = 2,
) -> np.ndarray:
    """wav2vec2-style span sampling: each position starts a ``span``-long mask
    with probability ``mask_prob``; guarantee at least ``min_masked`` starts."""
    rng = rng or np.random.default_rng()
    starts = rng.random((batch, length)) < mask_prob
    for b in range(batch):
        n = int(starts[b].sum())
        if n < min_masked:
            idx = rng.choice(length, size=min_masked - n, replace=False)
            starts[b, idx] = True
    mask = np.zeros((batch, length), bool)
    # span may exceed length (very short clips): spans just clip at the end.
    for offset in range(min(span, length)):
        end = length - offset if offset else length
        mask[:, offset:] |= starts[:, :end]
    return mask


def masked_infonce_loss(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    mask_spans: jnp.ndarray,
    frame_valid: jnp.ndarray,
    temperature: float = 0.1,
) -> jnp.ndarray:
    """InfoNCE over masked positions.

    Args:
      predictions: ``[B, T, D]`` context-network outputs (projected).
      targets: ``[B, T, D]`` clean latents (stop-gradient upstream).
      mask_spans: ``[B, T]`` bool, True at masked positions.
      frame_valid: ``[B, T]`` bool, True at real (non-pad) frames.

    For each masked valid position t: logits over all masked valid positions
    of the same sample (cosine similarity / τ); the true class is t itself.
    Returns the mean NLL over masked positions (f32).
    """
    preds = jnp.asarray(predictions, jnp.float32)
    tgts = jnp.asarray(targets, jnp.float32)
    preds = preds / jnp.maximum(jnp.linalg.norm(preds, axis=-1, keepdims=True), 1e-6)
    tgts = tgts / jnp.maximum(jnp.linalg.norm(tgts, axis=-1, keepdims=True), 1e-6)

    active = mask_spans & frame_valid                            # [B, T]
    sim = jnp.einsum("btd,bsd->bts", preds, tgts) / temperature  # [B, T, T]
    neg_inf = jnp.asarray(-1e30, jnp.float32)
    sim = jnp.where(active[:, None, :], sim, neg_inf)            # candidate cols
    log_probs = jax.nn.log_softmax(sim, axis=-1)
    diag = jnp.diagonal(log_probs, axis1=1, axis2=2)             # [B, T]
    per_pos = jnp.where(active, -diag, 0.0)
    denom = jnp.maximum(active.sum(), 1)
    return per_pos.sum() / denom
