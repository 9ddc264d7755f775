"""Model assemblies: the flagship multi-speaker AV-CTC model plus the
single-modality configs from BASELINE.json (audio-only, video-only).

The flagship mirrors the reference's four-module assembly
(reference main.py:92-129: VisualEncoder + AudioEncoder +
CrossAttentionFusion + CTCDecoder + a shared contrastive projection,
model/trainer.py:105-106) as ONE flax module so the whole two-speaker forward
is a single jit/pjit region: visual encoder applied to both lip streams,
audio encoder applied twice to the same mixture with per-speaker masks
(reference model/trainer.py:88-95), fusion + decode per speaker.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .audio import AudioEncoder
from .decoder import CTCDecoder
from .fusion import CrossAttentionFusion
from .layers import Dtype
from .visual import VisualEncoder


def nchw_clip_to_channels_last(lips):
    """Collate layout ``[B, T, 1, H, W]`` (reference dataset layout) →
    channels-last ``[B, T, H, W, 1]`` for TPU convs."""
    return jnp.transpose(lips, (0, 1, 3, 4, 2))


def downsample_mask_to(mask, T_enc: int):
    """Sample-rate speaker mask → encoder frame rate, nearest
    (reference model/trainer.py:98-103).  Integer index math is exact."""
    S = mask.shape[-1]
    idx = jnp.clip((jnp.arange(T_enc) * S) // T_enc, 0, S - 1)
    return jnp.take(mask, idx, axis=-1)


class MultiSpeakerAVModel(nn.Module):
    """Two-speaker audio-visual CTC model with contrastive feature taps."""

    config: ModelConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        if cfg.visual.remat == "full":
            # Trade FLOPs for memory: recompute the trunk forward during
            # backprop instead of saving its (very large) activations.
            # static_argnums=(2,) marks ``train`` static (arg 0 is the module).
            vis_cls = nn.checkpoint(
                VisualEncoder, static_argnums=(2,),
                policy=jax.checkpoint_policies.nothing_saveable,
            )
        elif cfg.visual.remat in ("none", "frontend", "stage1"):
            # "frontend"/"stage1" are handled inside VisualEncoder itself
            # (only those sub-computations are checkpointed).
            vis_cls = VisualEncoder
        else:
            raise ValueError(f"unknown visual.remat {cfg.visual.remat!r}")
        self.visual_encoder = vis_cls(cfg.visual, self.dtype)
        self.audio_encoder = AudioEncoder(cfg.audio, cfg.frontend, self.dtype)
        self.fusion = CrossAttentionFusion(cfg.fusion, self.dtype)
        self.decoder = CTCDecoder(cfg.decoder, self.dtype)
        # Shared contrastive projection (reference model/trainer.py:105-106).
        self.contrastive_proj = nn.Dense(cfg.contrastive.projection_dim, dtype=jnp.float32)

    def __call__(self, lip1, lip2, audio, mask1, mask2,
                 lip1_len=None, lip2_len=None, train: bool = False,
                 stop_visual_grad: bool = False):
        """Args use the reference batch-dict layouts (dataset/collate_fn.py:46-63):
        lips ``[B, T, 1, H, W]``, audio ``[B, S]``, masks ``[B, S]``.

        Returns a dict of per-speaker outputs:
        ``log_probs{1,2} [B, T_v, V]``, ``input_lengths{1,2} [B]``,
        ``contrast{1,2} [B, T_enc, P]``, ``mask_ds{1,2} [B, T_enc]``.

        Both speakers run as ONE ``[2B]`` batch through every shared-weight
        module (the reference calls each module twice per step,
        model/trainer.py:88-95): halves the number of sequential scans
        (BiLSTM/CTC are serial in T) and doubles matmul arithmetic intensity.
        Per-sample norms (GroupNorm/LayerNorm) are exactly equivalent to two
        separate passes; train-mode BatchNorm computes statistics over the
        joint 2B batch instead of per speaker (documented divergence — eval
        mode uses running averages and is identical either way).  The fusion
        interpolation grid (reference fusion_module.py:50-52 uses the *batch
        max* kept length — already a batch-composition-dependent quirk) now
        spans the joint 2B max rather than each speaker's own max.
        """
        B = lip1.shape[0]
        lips = jnp.concatenate(
            [nchw_clip_to_channels_last(lip1), nchw_clip_to_channels_last(lip2)], 0
        )
        v = self.visual_encoder(lips, train)
        if stop_visual_grad:
            # Frozen-trunk training (the reference's production regime,
            # main.py:100-103): cutting the gradient here lets XLA dead-code
            # the ENTIRE visual backward — the trunk is ~94% of step FLOPs —
            # instead of computing grads the optimizer would zero anyway.
            v = jax.lax.stop_gradient(v)

        audio2 = jnp.concatenate([audio, audio], 0)
        masks = jnp.concatenate([mask1, mask2], 0)
        lens = None
        if lip1_len is not None or lip2_len is not None:
            T_v = lip1.shape[1]
            l1 = lip1_len if lip1_len is not None else jnp.full((B,), T_v, jnp.int32)
            l2 = lip2_len if lip2_len is not None else jnp.full((B,), T_v, jnp.int32)
            lens = jnp.concatenate([l1, l2], 0)

        if self.config.shared_audio_pass:
            # Both "passes" of the reference encode the SAME mixture under the
            # SAME attention mask (mask != 3; pad positions are shared between
            # speakers by construction — data/collate.py pads both masks with
            # 3 at the audio pad) — so encode ONCE and reuse.  Halves audio
            # encoder FLOPs fwd+bwd; exact in eval, and in training the only
            # divergence is that the speakers share one dropout draw
            # (config.py:ModelConfig.shared_audio_pass).  The union keeps the
            # pass symmetric in (mask1, mask2) and equals either mask whenever
            # the pad structure is shared (the collate invariant).
            last_1, middle_1, _, _ = self.audio_encoder(
                audio, sample_mask=((mask1 != 3) | (mask2 != 3)),
                deterministic=not train
            )
            last = jnp.concatenate([last_1, last_1], 0)
            middle = jnp.concatenate([middle_1, middle_1], 0)
        else:
            last, middle, _, _ = self.audio_encoder(
                audio2, sample_mask=(masks != 3), deterministic=not train
            )
        T_enc = last.shape[1]
        mask_ds = downsample_mask_to(masks, T_enc)
        contrast = self.contrastive_proj(middle.astype(jnp.float32))
        fused, input_lengths = self.fusion(
            v, last, mask_ds, visual_lengths=lens, deterministic=not train,
        )
        log_probs = self.decoder(fused)
        return {
            "log_probs1": log_probs[:B], "input_lengths1": input_lengths[:B],
            "contrast1": contrast[:B], "mask_ds1": mask_ds[:B],
            "log_probs2": log_probs[B:], "input_lengths2": input_lengths[B:],
            "contrast2": contrast[B:], "mask_ds2": mask_ds[B:],
        }


class AudioOnlyCTC(nn.Module):
    """BASELINE config 1: log-mel → Conformer → CTC head (CPU-runnable slice)."""

    config: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio, sample_mask=None, train: bool = False):
        last, _, frame_valid, _ = AudioEncoder(
            self.config.audio, self.config.frontend, self.dtype, name="audio_encoder"
        )(audio, sample_mask, deterministic=not train)
        log_probs = CTCDecoder(self.config.decoder, self.dtype, name="decoder")(last)
        input_lengths = frame_valid.sum(axis=1).astype(jnp.int32)
        return log_probs, input_lengths


class VisualOnlyCTC(nn.Module):
    """BASELINE config 2: lip ROI frames → visual encoder → CTC head."""

    config: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lips, lip_lengths=None, train: bool = False):
        feat = VisualEncoder(self.config.visual, self.dtype, name="visual_encoder")(
            nchw_clip_to_channels_last(lips), train
        )
        log_probs = CTCDecoder(self.config.decoder, self.dtype, name="decoder")(feat)
        if lip_lengths is None:
            lip_lengths = jnp.full((lips.shape[0],), lips.shape[1], jnp.int32)
        return log_probs, lip_lengths
