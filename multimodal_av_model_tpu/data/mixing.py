"""Two-speaker waveform mixing and per-speaker frame masks.

Semantics match reference dataset/multi_speaker_dataset.py:13-45 exactly:

* both utterances are zero-padded to the longer length, summed, then
  peak-normalized by ``max(|mixed|) + 1e-6``;
* per-speaker sample-rate masks use the code
  ``0`` = other speaker solo, ``1`` = overlap (both speaking),
  ``2`` = target speaker solo, ``3`` = batch padding
  (padding value 3 is applied by the collator, reference dataset/collate_fn.py:40,44).

Both a host (NumPy, per pair) and a device (jnp, batched+jit) implementation
are provided; the device path takes pre-padded fixed-shape inputs with
explicit lengths so it compiles once per bucket shape.
"""

from __future__ import annotations

import numpy as np

MASK_OTHER_SOLO = 0
MASK_OVERLAP = 1
MASK_TARGET_SOLO = 2
MASK_PAD = 3


def make_speaker_masks(len1: int, len2: int) -> tuple[np.ndarray, np.ndarray]:
    """Masks over ``max(len1, len2)`` raw samples for each speaker."""
    max_len = max(len1, len2)
    min_len = min(len1, len2)
    mask1 = np.zeros(max_len, dtype=np.int64)
    mask2 = np.zeros(max_len, dtype=np.int64)
    mask1[:min_len] = MASK_OVERLAP
    mask2[:min_len] = MASK_OVERLAP
    if len1 > len2:
        mask1[len2:len1] = MASK_TARGET_SOLO
    elif len2 > len1:
        mask2[len1:len2] = MASK_TARGET_SOLO
    return mask1, mask2


def mix_pair(a1: np.ndarray, a2: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mix two (possibly different-length) mono waveforms.

    Returns ``(mixed, mask1, mask2)`` with ``len == max(len(a1), len(a2))``.
    """
    len1, len2 = len(a1), len(a2)
    max_len = max(len1, len2)
    a1p = np.pad(np.asarray(a1, dtype=np.float32), (0, max_len - len1))
    a2p = np.pad(np.asarray(a2, dtype=np.float32), (0, max_len - len2))
    mixed = a1p + a2p
    mixed /= np.max(np.abs(mixed)) + 1e-6
    mask1, mask2 = make_speaker_masks(len1, len2)
    return mixed.astype(np.float32), mask1, mask2


def mix_pair_batched_device(audio1, audio2, len1, len2):
    """Batched on-device mixing for pre-padded inputs.

    Args:
      audio1, audio2: ``[B, S]`` float32, zero-padded past their lengths.
      len1, len2: ``[B]`` int32 true sample counts.

    Returns ``(mixed [B,S], mask1 [B,S], mask2 [B,S] int32, mix_len [B])``
    where positions past ``max(len1, len2)`` are marked ``MASK_PAD``.
    Pure jnp; safe under ``jit``/``vmap``/``pjit``.
    """
    import jax.numpy as jnp

    audio1 = jnp.asarray(audio1, jnp.float32)
    audio2 = jnp.asarray(audio2, jnp.float32)
    len1 = jnp.asarray(len1, jnp.int32)[:, None]
    len2 = jnp.asarray(len2, jnp.int32)[:, None]
    S = audio1.shape[-1]
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]

    in1 = pos < len1
    in2 = pos < len2
    mixed = jnp.where(in1, audio1, 0.0) + jnp.where(in2, audio2, 0.0)
    peak = jnp.max(jnp.abs(mixed), axis=-1, keepdims=True) + 1e-6
    mixed = mixed / peak

    overlap = in1 & in2
    mask1 = jnp.where(overlap, MASK_OVERLAP, jnp.where(in1, MASK_TARGET_SOLO, MASK_OTHER_SOLO))
    mask2 = jnp.where(overlap, MASK_OVERLAP, jnp.where(in2, MASK_TARGET_SOLO, MASK_OTHER_SOLO))
    mix_len = jnp.maximum(len1, len2)
    pad = pos >= mix_len
    mask1 = jnp.where(pad, MASK_PAD, mask1).astype(jnp.int32)
    mask2 = jnp.where(pad, MASK_PAD, mask2).astype(jnp.int32)
    return mixed, mask1, mask2, mix_len[:, 0]


def downsample_mask_nearest(mask: np.ndarray, target_len: int) -> np.ndarray:
    """Nearest-neighbour mask resampling to the encoder frame rate.

    Matches ``F.interpolate(mode='nearest')`` on a 1-D sequence
    (reference model/trainer.py:99-103): output index ``j`` reads input index
    ``floor(j * S / target_len)``.
    """
    mask = np.asarray(mask)
    S = mask.shape[-1]
    idx = np.floor(np.arange(target_len) * (S / target_len)).astype(np.int64)
    idx = np.minimum(idx, S - 1)
    return mask[..., idx]
