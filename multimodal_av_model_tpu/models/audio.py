"""Audio encoder: log-mel frontend + Conformer stack with mid-layer taps.

First-party replacement for the reference's pretrained HF wav2vec2-large
(reference model/encoder.py:80-100; 317M frozen params + license-bound
weights).  Surface parity:

* input: raw 16 kHz waveform ``[B, S]`` + a boolean sample-level attention
  mask (the reference passes ``mask != 3``, model/trainer.py:91-95);
* output frame rate ≈ 50 Hz (mel hop 10 ms × conv subsample 2 — matching
  wav2vec2's 320× downsample);
* returns ``(last_hidden [B, T_enc, output_dim], middle_mean [B, T_enc,
  d_model])`` where ``middle_mean`` averages the configured middle layers —
  the analogue of the reference's ``mean(hidden_states[6:10])``
  (model/encoder.py:94-99) feeding the contrastive loss.

The architecture follows "End-to-end Audio-visual Speech Recognition with
Conformers" (arXiv:2102.06657): half-step FFN / MHSA / depthwise-conv module /
half-step FFN per block.  Everything is jit-static: padding is handled by an
additive attention mask derived from sample counts, never by ragged slicing.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import AudioEncoderConfig, AudioFrontendConfig
from ..ops.logmel import log_mel_spectrogram, num_frames
from .layers import Dtype, sinusoidal_positions


class FeedForwardModule(nn.Module):
    ffn_dim: int
    dropout: float
    dtype: Dtype

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype)(h)
        h = nn.swish(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(x.shape[-1], dtype=self.dtype)(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ConvModule(nn.Module):
    kernel_size: int
    dropout: float
    dtype: Dtype

    @nn.compact
    def __call__(self, x, valid, deterministic: bool = True):
        d = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(2 * d, dtype=self.dtype)(h)   # pointwise, GLU
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)
        h = jnp.where(valid[..., None], h, 0.0)    # padded frames stay silent
        h = nn.Conv(d, (self.kernel_size,), feature_group_count=d,
                    padding="SAME", dtype=self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(h)      # GN/BN-free: batch-size robust
        h = nn.swish(h)
        h = nn.Dense(d, dtype=self.dtype)(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ConformerBlock(nn.Module):
    num_heads: int
    ffn_dim: int
    conv_kernel_size: int
    dropout: float
    dtype: Dtype
    # Pluggable self-attention constructor (long-form context parallelism,
    # parallel/longform.py).  None → flax MHA.  Replacements must keep the
    # query/key/value/out projection layout so trained params interchange.
    attention_module: Any = None

    @nn.compact
    def __call__(self, x, valid, attn_mask, deterministic: bool = True):
        x = x + 0.5 * FeedForwardModule(self.ffn_dim, self.dropout, self.dtype)(
            x, deterministic
        )
        h = nn.LayerNorm(dtype=self.dtype)(x)
        attn_ctor = self.attention_module or nn.MultiHeadDotProductAttention
        h = attn_ctor(
            num_heads=self.num_heads,
            dtype=self.dtype,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name="self_attention",
        )(h, h, mask=attn_mask)
        x = x + h
        x = x + ConvModule(self.conv_kernel_size, self.dropout, self.dtype)(
            x, valid, deterministic
        )
        x = x + 0.5 * FeedForwardModule(self.ffn_dim, self.dropout, self.dtype)(
            x, deterministic
        )
        return nn.LayerNorm(dtype=self.dtype)(x)


class AudioEncoder(nn.Module):
    config: AudioEncoderConfig
    frontend: AudioFrontendConfig
    dtype: Dtype = jnp.float32
    attention_module: Any = None      # see ConformerBlock.attention_module

    @nn.compact
    def __call__(self, waveform, sample_mask=None, deterministic: bool = True,
                 mask_spans=None):
        """Args:
          waveform: ``[B, S]`` raw 16 kHz audio.
          sample_mask: ``[B, S]`` bool, True on valid samples (reference passes
            ``mask != 3``).  None → all valid.
          mask_spans: optional ``[B, T_enc]`` bool — wav2vec2-style masked
            prediction: masked positions are replaced by a learned embedding
            after the conv subsampler, and their pre-masking latents return as
            stop-gradient targets (the analogue of wav2vec2's quantized
            targets; reference model/encoder.py:83 consumes such a pretrained
            encoder, we train our own — ops/ssl.py).
        Returns ``(last_hidden, middle_mean, frame_valid, ssl_targets)``;
        ``ssl_targets`` is None unless ``mask_spans`` is given.
        """
        cfg, fe = self.config, self.frontend
        if cfg.middle_layers and max(cfg.middle_layers) >= cfg.num_layers:
            raise ValueError(
                f"middle_layers {cfg.middle_layers} out of range for "
                f"num_layers={cfg.num_layers}"
            )
        B, S = waveform.shape

        # Frontend (f32 features, then cast to compute dtype).  No gradient
        # flows through it (waveform is a data leaf), so the fused Pallas
        # kernel slots in without a custom VJP.  use_pallas=None → auto:
        # the fused kernel is the production default on TPU hardware.
        use_pallas = (
            fe.use_pallas if fe.use_pallas is not None
            else jax.default_backend() == "tpu"
        )
        if use_pallas:
            from ..ops.pallas.logmel_kernel import log_mel_spectrogram_pallas

            mel = jax.lax.stop_gradient(
                log_mel_spectrogram_pallas(
                    waveform, fe.sample_rate, fe.n_fft, fe.hop_length,
                    fe.win_length, fe.n_mels, fe.f_min, fe.f_max, fe.log_eps,
                    fe.center,
                )
            )
        else:
            mel = log_mel_spectrogram(
                waveform, fe.sample_rate, fe.n_fft, fe.hop_length, fe.win_length,
                fe.n_mels, fe.f_min, fe.f_max, fe.log_eps, fe.center,
            )                                        # [B, T_mel, n_mels]
        T_mel = mel.shape[1]

        # Frame validity from the sample mask: a mel frame is valid iff its
        # hop-anchor sample is valid.
        if sample_mask is None:
            frame_valid = jnp.ones((B, T_mel), bool)
        else:
            anchors = jnp.minimum(jnp.arange(T_mel) * fe.hop_length, S - 1)
            frame_valid = jnp.take(sample_mask, anchors, axis=1)

        # SpecAugment (train-time only, off by default — the reference has
        # no augmentation).  Uses the dropout rng stream; masked cells fill
        # with the utterance's valid-frame mean.
        if (not deterministic
                and (cfg.specaug_freq_masks > 0 or cfg.specaug_time_masks > 0)):
            from ..ops.specaugment import spec_augment

            mel = spec_augment(
                self.make_rng("dropout"), mel, frame_valid,
                freq_masks=cfg.specaug_freq_masks,
                freq_mask_width=cfg.specaug_freq_width,
                time_masks=cfg.specaug_time_masks,
                time_mask_frac=cfg.specaug_time_frac,
            )

        x = mel.astype(self.dtype)
        # Conv subsampling ×subsample_factor along time (50 Hz at factor 2).
        f = cfg.subsample_factor
        x = nn.Conv(cfg.d_model, (5,), strides=(f,), padding="SAME",
                    dtype=self.dtype, name="subsample")(x)
        x = nn.swish(x)
        T_enc = x.shape[1]
        frame_valid = frame_valid[:, ::f][:, :T_enc]

        ssl_targets = None
        if mask_spans is not None:
            # Targets = clean local latents (f32, no gradient); inputs at
            # masked positions become a learned embedding.
            ssl_targets = jax.lax.stop_gradient(x.astype(jnp.float32))
            mask_emb = self.param(
                "mask_embedding", nn.initializers.normal(0.1), (cfg.d_model,)
            )
            x = jnp.where(mask_spans[..., None], mask_emb.astype(self.dtype), x)

        x = x + sinusoidal_positions(T_enc, cfg.d_model).astype(self.dtype)[None]
        attn_mask = frame_valid[:, None, None, :] & frame_valid[:, None, :, None]

        hiddens = []
        for i in range(cfg.num_layers):
            x = ConformerBlock(
                cfg.num_heads, cfg.ffn_dim, cfg.conv_kernel_size, cfg.dropout,
                self.dtype, attention_module=self.attention_module,
                name=f"block{i}",
            )(x, frame_valid, attn_mask, deterministic)
            hiddens.append(x)

        middle = jnp.stack([hiddens[i] for i in cfg.middle_layers]).mean(axis=0)
        last = nn.Dense(cfg.output_dim, dtype=self.dtype, name="out_proj")(x)
        return last, middle, frame_valid, ssl_targets

    @staticmethod
    def output_length(cfg: AudioEncoderConfig, fe: AudioFrontendConfig, n_samples: int) -> int:
        """Static encoder frame count for ``n_samples`` input samples."""
        t_mel = num_frames(n_samples, fe.n_fft, fe.hop_length, fe.center)
        return -(-t_mel // cfg.subsample_factor)
