"""Masked InfoNCE-style contrastive loss, static-shape jnp.

Semantics match reference contrastive.py:8-44 on already-projected features:
flatten ``[B, T, D]`` over time, drop padding (mask 3), L2-normalize, then

* align term (weight 1.0): anchors = overlap frames (mask 1) vs candidates =
  target-solo frames (mask 2); ``-log_softmax(anchor·candᵀ / τ)`` averaged
  over the full anchor×candidate matrix;
* suppress term (weight 0.3): same anchors vs other-solo frames (mask 0);
* a term is skipped when either of its sets is empty.

The reference materializes variable-size index subsets with ``torch.nonzero``
(host-sync, shape-dynamic).  Here the same matrix is computed over *all*
``B·T`` rows with invalid columns masked to -inf inside the softmax and
invalid rows excluded from the mean — identical values, fully static shapes,
jit/pjit-safe.  The similarity matrix is one ``[N, N]`` MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.mixing import MASK_OTHER_SOLO, MASK_OVERLAP, MASK_TARGET_SOLO

_NEG_INF = -1e30


def _masked_term(sim: jnp.ndarray, anchor_mask: jnp.ndarray, cand_mask: jnp.ndarray):
    """Mean over valid (anchor, candidate) cells of -log_softmax(sim) where the
    softmax normalizes over valid candidates only."""
    sim = jnp.where(cand_mask[None, :], sim, _NEG_INF)
    m = jnp.max(sim, axis=1, keepdims=True)
    m = jnp.maximum(m, _NEG_INF)  # all-invalid rows stay finite
    lse = m + jnp.log(jnp.sum(jnp.exp(sim - m), axis=1, keepdims=True))
    neg_logsm = lse - sim                                  # [N, N]
    cells = anchor_mask[:, None] & cand_mask[None, :]
    count = jnp.sum(cells)
    total = jnp.sum(jnp.where(cells, neg_logsm, 0.0))
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def contrastive_loss_with_mask(
    features: jnp.ndarray,
    mask: jnp.ndarray,
    temperature: float = 0.07,
    weight_pos_align: float = 1.0,
    weight_neg_suppress: float = 0.3,
) -> jnp.ndarray:
    """Args:
      features: ``[B, T, D]`` (or ``[N, D]``) frame features, already projected
        (the reference's lazy 128-d projection, model/trainer.py:105-106, lives
        in the model as a Dense layer).
      mask: matching ``[B, T]`` (or ``[N]``) int mask with codes 0/1/2/3.
    """
    feat = jnp.asarray(features, jnp.float32)
    if feat.ndim == 3:
        feat = feat.reshape(-1, feat.shape[-1])
    flat_mask = jnp.asarray(mask).reshape(-1)

    feat = feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True) + 1e-12)
    # Loss math stays f32: force full-precision MXU passes for the similarity
    # (JAX's default matmul precision is bf16-class on TPU).
    sim = (
        jnp.matmul(feat, feat.T, precision=jax.lax.Precision.HIGHEST)
        / temperature
    )

    anchors = flat_mask == MASK_OVERLAP
    positives = flat_mask == MASK_TARGET_SOLO
    negatives = flat_mask == MASK_OTHER_SOLO

    pos_loss = _masked_term(sim, anchors, positives)
    neg_loss = _masked_term(sim, anchors, negatives)
    return weight_pos_align * pos_loss + weight_neg_suppress * neg_loss
