"""Legacy-v0 multimodal CTC model (capability parity with 이전 버전/).

Reference 이전 버전/multimodal_ctc_korean.py:8-55:
* ``LipEncoder``: per-frame 2×(Conv2d+ReLU+MaxPool2d) CNN → 2-layer BiGRU;
* ``AudioEncoder``: 2-layer BiGRU over 80-bin log-mel;
* ``MultimodalCTCKoreanModel``: shared lip encoder on both speakers, shared
  audio encoder on the mixture mel, concat fusion, one shared linear head →
  twin CTC logit streams ``(logits_A, logits_B)``.

This is BASELINE.json config 3's "multimodal_ctc_korean path" and the
simplest end-to-end AV slice.  Here frames are channels-last and the CNN runs
over the folded ``[B·T, H, W, C]`` batch.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import BiGRU, Dtype


class LipEncoder(nn.Module):
    hidden_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, lengths=None):
        """``[B, T, H, W, C] → [B, T, 2·hidden]``."""
        B, T, H, W, C = frames.shape
        x = frames.astype(self.dtype).reshape(B * T, H, W, C)
        x = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = x.reshape(B, T, -1)
        return BiGRU(self.hidden_dim, num_layers=2, dtype=self.dtype)(x, lengths)


class MelAudioEncoder(nn.Module):
    hidden_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel, lengths=None):
        """``[B, T, n_mels] → [B, T, 2·hidden]``."""
        return BiGRU(self.hidden_dim, num_layers=2, dtype=self.dtype)(
            mel.astype(self.dtype), lengths
        )


class MultimodalCTCKoreanModel(nn.Module):
    vocab_size: int
    hidden_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames_a, frames_b, mel, mel_lengths=None):
        """Returns twin logits ``(logits_A, logits_B)``, each ``[B, T, V]``.

        ``mel`` and the frame streams must share a common T (the legacy
        pipeline's collate stacks them un-aligned; we align to mel length by
        nearest-index gather of the lip features)."""
        lip = LipEncoder(self.hidden_dim, self.dtype, name="lip_encoder")
        feat_a = lip(frames_a)
        feat_b = lip(frames_b)
        audio = MelAudioEncoder(self.hidden_dim, self.dtype, name="audio_encoder")(
            mel, mel_lengths
        )
        T_mel = audio.shape[1]
        T_lip = feat_a.shape[1]
        if T_lip != T_mel:
            idx = jnp.clip((jnp.arange(T_mel) * T_lip) // T_mel, 0, T_lip - 1)
            feat_a = jnp.take(feat_a, idx, axis=1)
            feat_b = jnp.take(feat_b, idx, axis=1)
        head = nn.Dense(self.vocab_size, dtype=self.dtype, name="fc")
        logits_a = head(jnp.concatenate([feat_a, audio], axis=-1))
        logits_b = head(jnp.concatenate([feat_b, audio], axis=-1))
        return logits_a, logits_b
