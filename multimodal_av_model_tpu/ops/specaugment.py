"""SpecAugment: on-device time/frequency masking of log-mel features.

Production-ASR augmentation (Park et al., arXiv:1904.08779) the reference
lacks entirely — its only regularizers are dropout-free torch defaults and
the contrastive auxiliary loss.  Off by default (reference parity); enable
with ``model.audio.specaug_freq_masks`` / ``specaug_time_masks``.

Everything is jit-static: mask counts and maximum widths are Python ints;
the sampled starts/widths are traced scalars folded into boolean arange
comparisons — no dynamic shapes, no host sync.  Masked cells are filled
with the per-utterance mean of the VALID frames (masking to the mean keeps
the feature distribution centered; zero-filling shifts it, since log-mel
values are far from zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spec_augment(
    rng: jax.Array,
    mel: jax.Array,
    frame_valid: jax.Array | None = None,
    *,
    freq_masks: int = 2,
    freq_mask_width: int = 27,
    time_masks: int = 2,
    time_mask_frac: float = 0.05,
) -> jax.Array:
    """Apply SpecAugment to ``mel [B, T, F]``.

    Args:
      rng: PRNG key.
      mel: log-mel features ``[B, T, F]``.
      frame_valid: optional ``[B, T]`` bool; masked-region sampling and the
        fill statistic only consider valid frames, and padding frames are
        left untouched.
      freq_masks / freq_mask_width: number of frequency stripes per
        utterance and the max stripe width (bins).
      time_masks / time_mask_frac: number of time stripes and the max
        stripe length as a fraction of the utterance's VALID length
        (adaptive masking — fixed widths over-mask short utterances).

    Returns the augmented ``[B, T, F]`` array, same dtype as ``mel``.
    """
    B, T, F = mel.shape
    if frame_valid is None:
        frame_valid = jnp.ones((B, T), bool)
    valid_len = jnp.maximum(frame_valid.sum(axis=1), 1)            # [B]

    k_f, k_t = jax.random.split(rng)
    masked = jnp.zeros((B, T, F), bool)

    if freq_masks > 0 and freq_mask_width > 0:
        ks = jax.random.split(k_f, 2)
        width = jax.random.randint(ks[0], (B, freq_masks), 0,
                                   freq_mask_width + 1)             # [B, M]
        start = (jax.random.uniform(ks[1], (B, freq_masks))
                 * jnp.maximum(F - width, 1)).astype(jnp.int32)
        bins = jnp.arange(F)                                        # [F]
        hit = ((bins[None, None, :] >= start[..., None])
               & (bins[None, None, :] < (start + width)[..., None]))  # [B, M, F]
        masked = masked | hit.any(axis=1)[:, None, :]

    if time_masks > 0 and time_mask_frac > 0:
        ks = jax.random.split(k_t, 2)
        max_w = jnp.maximum(
            (valid_len.astype(jnp.float32) * time_mask_frac), 1.0
        )                                                           # [B]
        width = (jax.random.uniform(ks[0], (B, time_masks))
                 * (max_w[:, None] + 1.0)).astype(jnp.int32)
        start = (jax.random.uniform(ks[1], (B, time_masks))
                 * jnp.maximum(valid_len[:, None] - width, 1)
                 ).astype(jnp.int32)
        steps = jnp.arange(T)                                       # [T]
        hit = ((steps[None, None, :] >= start[..., None])
               & (steps[None, None, :] < (start + width)[..., None]))  # [B, M, T]
        masked = masked | hit.any(axis=1)[:, :, None]

    masked = masked & frame_valid[..., None]
    fill = (
        jnp.where(frame_valid[..., None], mel, 0.0).sum(axis=(1, 2))
        / jnp.maximum(valid_len * F, 1).astype(mel.dtype)
    )                                                               # [B]
    return jnp.where(masked, fill[:, None, None].astype(mel.dtype), mel)
