"""Cross-attention audio-visual fusion with static-shape masked frame logic.

Re-design of the reference fusion module (reference model/fusion_module.py:5-67)
whose hot path is ragged and host-synced: a per-sample Python loop drops audio
frames where the speaker mask is 0 or 3, re-pads, interpolates to the visual
length, runs audio→visual cross-attention, then a 2-layer BiLSTM.

Same math, TPU-native mechanics:

* frame dropping becomes a **stable argsort compaction** (kept frames move to
  the front, order preserved) — a gather, not a ragged filter, so shapes stay
  static under jit;
* the reference's interpolation grid spans the *batch max* kept length; that
  max is a traced scalar here (dynamic values are fine under jit — only
  shapes must be static), so linear/nearest resampling reproduces reference
  semantics exactly, including zero-padding smear for short samples;
* ``input_lengths`` = count of non-zero interpolated mask entries
  (reference model/fusion_module.py:66).

Divergences (corrected semantics, documented per SURVEY.md §7):
* the reference's unused ``cross_attn_visual`` is not replicated;
* cross-attention optionally masks padded *visual* keys (the reference
  attends to visual padding); pass ``visual_lengths=None`` for strict parity.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import FusionConfig
from ..data.mixing import MASK_OTHER_SOLO, MASK_PAD
from .layers import BiLSTM, Dtype, TransformerTemporalBlock


def compact_speech_frames(audio_feat, mask):
    """Move frames with mask ∉ {0, 3} to the front (stable), zero the rest.

    Returns ``(audio_c [B,Ta,D], mask_c [B,Ta], kept [B])``.
    """
    speech = (mask != MASK_OTHER_SOLO) & (mask != MASK_PAD)
    order = jnp.argsort(~speech, axis=1, stable=True)          # kept first
    audio_c = jnp.take_along_axis(audio_feat, order[..., None], axis=1)
    mask_c = jnp.take_along_axis(mask, order, axis=1)
    kept = speech.sum(axis=1).astype(jnp.int32)
    pos = jnp.arange(mask.shape[1], dtype=jnp.int32)[None, :]
    cvalid = pos < kept[:, None]
    audio_c = jnp.where(cvalid[..., None], audio_c, 0.0)
    mask_c = jnp.where(cvalid, mask_c, 0)
    return audio_c, mask_c, kept


def interp_linear_to(audio_c, t_in, T_v: int):
    """Linear resample ``audio_c[:, :t_in] → [:, T_v]`` with
    ``align_corners=True`` (reference model/fusion_module.py:51); ``t_in`` is a
    traced scalar (the batch-max kept length)."""
    t_in = jnp.maximum(t_in, 1)
    j = jnp.arange(T_v, dtype=jnp.float32)
    scale = (t_in - 1).astype(jnp.float32) / max(T_v - 1, 1)
    src = j * scale
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    frac = (src - lo).astype(audio_c.dtype)
    a_lo = jnp.take(audio_c, lo, axis=1)
    a_hi = jnp.take(audio_c, hi, axis=1)
    return a_lo + (a_hi - a_lo) * frac[None, :, None]


def interp_nearest_mask(mask_c, t_in, T_v: int):
    """Nearest resample of the compacted mask (reference :54: float-cast,
    nearest interpolate, back to long).  Integer index math is exact."""
    t_in = jnp.maximum(t_in, 1)
    j = jnp.arange(T_v, dtype=jnp.int32)
    idx = jnp.clip((j * t_in) // T_v, 0, t_in - 1)
    return jnp.take(mask_c, idx, axis=1)


class CrossAttentionFusion(nn.Module):
    config: FusionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        visual_feat,
        audio_feat,
        mask,
        visual_lengths=None,
        deterministic: bool = True,
    ):
        """Args:
          visual_feat: ``[B, T_v, D_v]``.
          audio_feat: ``[B, T_a, D_a]`` encoder-frame-rate audio features.
          mask: ``[B, T_a]`` int speaker mask at encoder frame rate
            (0 other-solo / 1 overlap / 2 target-solo / 3 pad).
          visual_lengths: optional ``[B]``; masks padded visual keys and the
            temporal model.  ``None`` → strict reference behaviour.
        Returns ``(fused [B, T_v, 2·fused_dim], input_lengths [B])``.
        """
        cfg = self.config
        B, T_v, _ = visual_feat.shape

        audio_c, mask_c, kept = compact_speech_frames(
            audio_feat.astype(self.dtype), mask
        )
        t_in = jnp.max(kept)                       # reference's padded T_a'
        a_i = interp_linear_to(audio_c, t_in, T_v)
        mask_i = interp_nearest_mask(mask_c, t_in, T_v)

        v = nn.Dense(cfg.fused_dim, dtype=self.dtype, name="visual_proj")(
            visual_feat.astype(self.dtype)
        )
        a = nn.Dense(cfg.fused_dim, dtype=self.dtype, name="audio_proj")(a_i)

        attn_mask = None
        if visual_lengths is not None:
            key_valid = jnp.arange(T_v)[None, :] < visual_lengths[:, None]
            attn_mask = key_valid[:, None, None, :]
        a2v = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dtype=self.dtype, name="cross_attn_audio",
        )(a, v, mask=attn_mask)

        fused = nn.Dense(cfg.fused_dim, dtype=self.dtype, name="fusion_proj")(a2v)

        if cfg.temporal_model == "bilstm":
            fused_seq = BiLSTM(
                cfg.fused_dim, cfg.temporal_layers, dtype=self.dtype,
                name="temporal_bilstm",
            )(fused, visual_lengths)
        elif cfg.temporal_model == "transformer":
            h = TransformerTemporalBlock(
                cfg.fused_dim, cfg.temporal_layers, cfg.transformer_heads,
                cfg.transformer_ffn_dim, dtype=self.dtype, name="temporal_tf",
            )(fused, visual_lengths, deterministic=deterministic)
            fused_seq = nn.Dense(2 * cfg.fused_dim, dtype=self.dtype,
                                 name="temporal_out")(h)
        else:
            raise ValueError(f"unknown temporal model {cfg.temporal_model!r}")

        input_lengths = (mask_i != 0).sum(axis=1).astype(jnp.int32)
        return fused_seq, input_lengths
