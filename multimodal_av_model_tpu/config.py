"""Typed configuration tree for the whole framework.

The reference has no config system — every knob is a hardcoded constant
scattered across files (reference main.py:69-90,111,142,160; model/trainer.py:14,35-38;
contrastive.py:4-6; utils/train_tokenizer.py:5).  Here they are collected into
one dataclass tree whose *defaults equal the reference values*, with
``from_flat_overrides`` providing dotted-path CLI overrides
(e.g. ``train.batch_size=16``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass
class AudioFrontendConfig:
    """STFT → log-mel frontend (revives reference 이전 버전/train_ctc_korea.py:38-40)."""

    sample_rate: int = 16000          # reference dataset/multi_speaker_dataset.py:15
    n_fft: int = 400                  # torchaudio MelSpectrogram default (25 ms @ 16 kHz)
    hop_length: int = 160             # 10 ms — 100 frames/sec
    win_length: int = 400
    n_mels: int = 80                  # reference 이전 버전/train_ctc_korea.py:39
    f_min: float = 0.0
    f_max: float | None = None        # None → sample_rate / 2
    log_eps: float = 1e-6
    center: bool = True               # torch.stft default used by torchaudio
    power: float = 2.0
    use_pallas: bool | None = None    # fused Pallas kernel: None = auto
                                      # (True on TPU, False elsewhere — the
                                      # production path uses the fused kernel
                                      # on hardware, jnp under the CPU test
                                      # mesh).  The frontend takes no gradient
                                      # (waveform is a leaf), so no custom VJP


@dataclass
class AudioEncoderConfig:
    """Log-mel Conformer replacing the reference's pretrained wav2vec2-large
    (reference model/encoder.py:80-100).  Produces ~50 Hz frames like wav2vec2's
    320x conv frontend, plus a mean of configurable middle layers mirroring the
    reference's ``hidden_states[6:10]`` mean (model/encoder.py:94-99)."""

    d_model: int = 512
    num_layers: int = 12
    num_heads: int = 8
    ffn_dim: int = 2048
    conv_kernel_size: int = 15
    dropout: float = 0.1
    subsample_factor: int = 2         # 100 Hz mel → 50 Hz encoder frames
    middle_layers: tuple[int, ...] = (6, 7, 8, 9)  # reference model/encoder.py:97
    output_dim: int = 1024            # matches wav2vec2-large hidden size surface
    max_len: int = 2048
    # SpecAugment on the log-mel (ops/specaugment.py) — train-time only,
    # OFF by default (reference parity; the reference has no augmentation).
    specaug_freq_masks: int = 0
    specaug_freq_width: int = 27
    specaug_time_masks: int = 0
    specaug_time_frac: float = 0.05


@dataclass
class VisualEncoderConfig:
    """LRW-style lipreading trunk (reference model/encoder.py:57-75):
    Conv3D(1→64, k(5,7,7), s(1,2,2)) + norm + PReLU + MaxPool3D(1,3,3)/(1,2,2)
    then a per-frame ResNet-18 folded over time."""

    frontend_channels: int = 64
    resnet_layers: tuple[int, ...] = (2, 2, 2, 2)
    resnet_channels: tuple[int, ...] = (64, 128, 256, 512)
    norm: str = "batch"               # "batch" (reference parity) or "group" (stateless)
    # Trunk activation (the reference's own relu_type option,
    # model/encoder.py:7-11): "prelu" (reference default) or "relu".  Each
    # PReLU carries a per-channel alpha whose gradient is one more full
    # f32 reduction pass over the feature map — "relu" drops 17 such passes
    # per step (perf measurement in docs/DESIGN.md §2).
    activation: str = "prelu"
    output_dim: int = 512             # reference model/encoder.py:67
    image_size: int = 96              # reference dataset/multi_speaker_dataset.py:51
    # Rematerialization of the visual trunk in the backward pass:
    # "none" lets XLA's auto-remat decide (profiling shows it spends ~30% of
    # a big-batch step recomputing under memory pressure); "frontend"
    # recomputes only the frontend conv/norm/pool (its [2B·T, 48, 48, C]
    # activations are the largest live tensors, its recompute the cheapest
    # — the right setting at batch ≥ 32, docs/DESIGN.md §2); "stage1" also
    # checkpoints the ResNet stage-1 blocks (measured dominated at this
    # trunk size; kept for deeper trunks); "full" recomputes the whole
    # trunk (memory relief only).
    remat: str = "none"


@dataclass
class FusionConfig:
    """Cross-attention fusion (reference model/fusion_module.py:5-67): project
    both modalities to ``fused_dim``, audio-queries-visual MHA (4 heads),
    fusion projection, then a temporal model producing ``2*fused_dim``."""

    fused_dim: int = 512              # reference main.py:111
    num_heads: int = 4                # reference model/fusion_module.py:14
    temporal_model: str = "bilstm"    # "bilstm" (reference parity) or "transformer"
    temporal_layers: int = 2          # reference model/fusion_module.py:24
    transformer_heads: int = 8
    transformer_ffn_dim: int = 2048


@dataclass
class ContrastiveConfig:
    """Masked InfoNCE-style contrastive loss (reference contrastive.py:4-6)."""

    temperature: float = 0.07
    weight_pos_align: float = 1.0
    weight_neg_suppress: float = 0.3
    projection_dim: int = 128         # reference model/trainer.py:106


@dataclass
class DecoderConfig:
    input_dim: int = 1024             # reference main.py:115
    vocab_size: int = 800             # assets/tokenizer800.vocab line count
    blank_id: int = 3                 # verified runtime value (SURVEY.md §2 row 5)


@dataclass
class DecodeConfig:
    beam_width: int = 5               # reference model/trainer.py:230
    # "prefix_beam" = true CTC prefix search (sums alignment mass per
    # transcript, ops/prefix_beam_search.py) — the PRODUCTION default: at
    # equal beam width/decode cost it measured CER 0.365 vs the reference
    # algorithm's 0.598 (benchmarks/decoder_quality.json; docs/DESIGN.md §6).
    # "reference_beam" = exact reference semantics (path beam, collapse at
    # the end; reference beam_search.py:2-42) — kept for parity tests.
    # "greedy" = argmax collapse.
    algorithm: str = "prefix_beam"
    prefix_top_k: int = 8             # emission pruning for prefix_beam
    # Shallow fusion (prefix_beam only): path to a bigram LM table saved by
    # text/ngram_lm.py (.npy, [V+1, V] log-probs).  Empty = no fusion.
    lm_path: str = ""
    lm_weight: float = 0.3            # α on log P_lm per emitted token
    length_bonus: float = 0.0         # β per emitted token (counters the
                                      # LM's short-transcript bias)
    # Streaming serving (streaming.py): emission granularity and how much
    # already-seen audio the encoder attends over per chunk.
    stream_chunk_seconds: float = 2.0
    stream_context_seconds: float = 8.0
    # Serve with per-channel int8 weights (ops/quantize.py): halves param
    # bytes vs bf16 (4x vs the reference's fp32 serving) at a measured-nil
    # CER delta (benchmarks/quantized_serving.json).  Applies to --infer,
    # --export and the AudioTranscriber path; training is never quantized.
    quantize: bool = False


@dataclass
class ModelConfig:
    frontend: AudioFrontendConfig = field(default_factory=AudioFrontendConfig)
    audio: AudioEncoderConfig = field(default_factory=AudioEncoderConfig)
    visual: VisualEncoderConfig = field(default_factory=VisualEncoderConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    contrastive: ContrastiveConfig = field(default_factory=ContrastiveConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    dtype: str = "bfloat16"           # activation dtype; params stay float32
    # The reference encodes the SAME mixture twice per step with per-speaker
    # attention masks (model/trainer.py:94-95) — but those masks are both
    # ``mask != 3`` and pad positions are shared, so the two passes compute
    # identical features.  True = encode once and reuse for both speakers
    # (exact in eval; in training the speakers share one dropout draw —
    # the reference's production audio encoder is frozen anyway,
    # main.py:105).  False = reference-shaped double pass.
    shared_audio_pass: bool = True


@dataclass
class DataConfig:
    json_folder: str = "input_texts"
    npy_dir: str = "npy"
    text_dir: str = "processed_dataset/text"
    wav_dir: str = "input_wav/input_wav"
    vocab_path: str = "assets/tokenizer800.vocab"
    sample_rate: int = 16000
    num_pairs_per_epoch: int = 10000  # reference main.py:80
    eval_pairs: int = 500             # reference main.py:82-86
    # Length-bucket boundaries in *video frames* (30 fps). All sequences are
    # padded up to a bucket edge so XLA sees a small set of static shapes
    # instead of one shape per batch (SURVEY.md §5 long-context row).
    video_buckets: tuple[int, ...] = (64, 128, 256, 448)
    audio_samples_per_video_frame: int = 534  # ceil(16000 / 30) rounded to even
    max_label_len: int = 128
    prefetch_depth: int = 2
    device_preprocess: bool = True    # preprocess raw media ON DEVICE (gray +
                                      # fused resize + mixing + masks in one
                                      # jit, data/device_pipeline.py) instead
                                      # of in host Python — the production
                                      # path; False = reference-style host
                                      # preprocessing (load_pair)
    seed: int = 42                    # reference main.py:67


@dataclass
class TrainConfig:
    batch_size: int = 8               # reference main.py:88
    eval_batch_size: int = 4          # reference main.py:89
    learning_rate: float = 1e-4       # reference model/trainer.py:35
    audio_learning_rate: float = 2e-5 # reference model/trainer.py:36
    lambda_contrastive: float = 0.1   # reference model/trainer.py:14
    contrastive_only: bool = False    # AV-alignment pretraining (BASELINE
                                      # config 4): optimize only the masked
                                      # contrastive loss — the stand-in for
                                      # wav2vec2's pretrained features
                                      # (SURVEY.md §7 hard-parts list)
    max_epochs: int = 50              # reference main.py:160
    early_stop_patience: int = 5      # reference main.py:142
    freeze_visual_trunk: bool = False # reference main.py:100-103 behaviour, opt-in
    visual_init_ckpt: str = ""        # path to a visual-only (--family=visual)
                                      # checkpoint; its visual_encoder subtree
                                      # grafts into the flagship at startup —
                                      # the reference's pretrained-visual-
                                      # encoder load (main.py:94-103).
                                      # Combine with freeze_visual_trunk.
    audio_init_ckpt: str = ""         # path to an SSL (--family=ssl)
                                      # checkpoint; its audio_encoder subtree
                                      # grafts into the flagship — the
                                      # reference's pretrained-wav2vec2 load
                                      # (model/encoder.py:83).  Combine with
                                      # audio_trainable_layers for the partial
                                      # unfreeze (reference main.py:26-31).
    ssl_mask_prob: float = 0.065      # wav2vec2-style span-mask start prob
    ssl_mask_span: int = 10           # span length in encoder frames
    ssl_temperature: float = 0.1      # masked-InfoNCE temperature
    audio_trainable_layers: tuple[int, ...] | None = None
                                      # None → whole audio encoder trains at
                                      # audio_learning_rate; a tuple freezes
                                      # everything in the audio encoder EXCEPT
                                      # those conformer blocks (the reference's
                                      # unfreeze_middle_layers(6..9),
                                      # main.py:26-31,105-106)
    # Learning-rate schedule (the reference runs constant-LR Adam only):
    # "constant" (parity), "warmup_cosine" (linear warmup → cosine decay to
    # lr·lr_min_ratio over decay_steps), or "noam" (transformer inverse-sqrt
    # with peak = the group LR at warmup_steps).  Each optimizer group's
    # schedule scales from ITS base LR, so the 1e-4/2e-5 split is preserved.
    lr_schedule: str = "constant"
    warmup_steps: int = 1000
    decay_steps: int = 50000
    lr_min_ratio: float = 0.0
    grad_accum_steps: int = 1         # >1 → optax.MultiSteps gradient
                                      # accumulation: k micro-batches average
                                      # into one optimizer update (large
                                      # effective batch on one chip)
    grad_clip_norm: float | None = None
    check_finite: bool = True         # raise on NaN/inf metrics instead of
                                      # training on silently (the reference
                                      # swallows batch errors,
                                      # model/trainer.py:162-164)
    async_dispatch: bool = True       # never block the step loop on a
                                      # metrics readback: fold metrics into
                                      # device-side running sums and sync
                                      # only at log points / epoch end
                                      # (check_finite granularity widens to
                                      # per-sync; it still raises before
                                      # any checkpoint is written)
    checkpoint_dir: str = "checkpoints"
    checkpoint_layout: str = "file"   # "file" = single msgpack per
                                      # checkpoint (gathers every leaf to
                                      # host); "sharded" = gather-free
                                      # per-process shard directories for
                                      # FSDP/TP/multi-host state — restores
                                      # under ANY target sharding
                                      # (train/sharded_checkpoints.py)
    async_checkpoint: bool = False    # write epoch checkpoints on a
                                      # background thread (overlap D2H +
                                      # serialization + disk with the next
                                      # epoch); fit() drains at exit
    handle_signals: bool = True       # SIGTERM/SIGINT during fit → finish
                                      # the in-flight step, save last.ckpt,
                                      # return cleanly (preemptible-pool
                                      # eviction protocol); resume redoes
                                      # the interrupted epoch
    tensorboard_dir: str = ""         # non-empty → per-epoch TensorBoard
                                      # scalars (tensorboardX, no-op if the
                                      # package is absent)
    log_every: int = 100              # reference model/trainer.py:125
    keep_checkpoints: int = 3


@dataclass
class MeshConfig:
    """Device-mesh layout for pjit sharding.  ``data`` is the batch axis
    (gradient psum over ICI), ``model`` an optional tensor axis for wide
    layers.  The reference is single-device (SURVEY.md §2c); parallelism here
    is designed from scratch."""

    data_axis: int = -1               # -1 → all devices on the data axis
    model_axis: int = 1
    fsdp: bool = False                # ZeRO-style sharding of params + Adam
                                      # state over the data axis
                                      # (parallel/fsdp.py); for reference-
                                      # scale and larger audio towers where
                                      # replicated optimizer state overflows
                                      # HBM


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    compile_cache_dir: str = ""       # non-empty → persistent XLA
                                      # compilation cache for every CLI entry
                                      # point: relaunches, preemption-resumes
                                      # and serving restarts reuse compiled
                                      # step functions
                                      # (runtime/compile_cache.py).  Opt-in:
                                      # local PJRT backends support it, but
                                      # proxy/tunneled backends (like this
                                      # dev box's) stall on the cache probe
                                      # and persist nothing — see the module
                                      # docstring before enabling.


def _set_dotted(obj: Any, path: str, raw: str) -> None:
    parts = path.split(".")
    for p in parts[:-1]:
        obj = getattr(obj, p)
    name = parts[-1]
    if not hasattr(obj, name):
        raise AttributeError(f"unknown config field: {path}")
    current = getattr(obj, name)
    value: Any
    if isinstance(current, bool):
        value = raw.lower() in ("1", "true", "yes", "on")
    elif isinstance(current, int):
        value = int(raw)
    elif isinstance(current, float):
        value = float(raw)
    elif isinstance(current, tuple):
        value = tuple(int(x) for x in raw.strip("()").split(",") if x)
    elif current is None:
        if raw.lower() == "none":
            value = None
        elif raw.lower() in ("true", "false", "yes", "no", "on", "off"):
            value = raw.lower() in ("true", "yes", "on")
        elif raw.startswith("("):
            value = tuple(int(x) for x in raw.strip("()").split(",") if x)
        else:
            value = float(raw)
    else:
        value = raw
    setattr(obj, name, value)


def from_flat_overrides(overrides: Sequence[str], base: Config | None = None) -> Config:
    """Build a Config from ``key.path=value`` strings (the CLI surface)."""
    cfg = base if base is not None else Config()
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override must look like a.b.c=value, got {item!r}")
        path, raw = item.split("=", 1)
        _set_dotted(cfg, path.strip(), raw.strip())
    return cfg


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)
