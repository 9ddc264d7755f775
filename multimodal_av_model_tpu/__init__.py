"""multimodal_av_model_tpu — TPU-native audio-visual multi-speaker Korean ASR framework.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of the
reference repo ``limeorange1102/multimodal-av-model`` (a PyTorch/CUDA research
codebase for "cocktail-party lipreading": two speakers' utterances are mixed
into one waveform and each speaker's lip-ROI video stream is used to pull
*their* transcript out of the mixture, trained with CTC + a masked contrastive
loss).

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

    text/       tokenization (char-level tokenizer800 semantics, Korean syllable vocab)
    data/       manifests, pair sampling, mixing + speaker masks, bucketing collation,
                prefetching host pipeline
    ops/        pure-JAX + Pallas compute primitives: log-mel frontend, CTC
                forward-backward, on-device beam search, bilinear resize,
                contrastive loss, WER/CER metrics
    models/     flax modules: VisualEncoder (3D front + per-frame ResNet-18),
                AudioEncoder (log-mel Conformer with mid-layer feature taps),
                CrossAttentionFusion, CTC decoder head, legacy v0 GRU model
    parallel/   jax.sharding Mesh construction + named shardings (dp/tp axes)
    train/      jitted train/eval steps, optax multi-group optimizer,
                Orbax checkpointing, CSV/stdout metric writers
    runtime/    host-side native (C++) data ops with pure-Python fallbacks
"""

__version__ = "0.1.0"
