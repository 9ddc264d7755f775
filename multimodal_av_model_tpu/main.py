"""Train/eval entry point — the ``python main.py`` surface of the reference
(reference main.py:66-203), re-built on the TPU-native stack.

Pipeline: tokenizer → manifest → 90/5/5 split → pair samplers → bucketed
prefetched batches → flagship ``MultiSpeakerAVModel`` → jitted train/eval
loop with rolling checkpoints and early stopping.

Differences from the reference surface (all documented in SURVEY.md §7):
* configuration is a typed tree with ``key.path=value`` CLI overrides instead
  of hardcoded constants (including the reference's Colab paths);
* ``--synthetic`` trains on generated data — the bundled corpus ships
  metadata JSON only (SURVEY.md §6), so this is the runnable-out-of-the-box
  mode;
* resume restores the full pytree (params + optimizer + epoch); the
  reference silently skipped the audio encoder and optimizer
  (reference main.py:57-64).
"""

from __future__ import annotations

import os
import sys

import numpy as np


def build_data(cfg, tokenizer, synthetic: bool, device_put: bool = True):
    from .data import (
        FilePairSource,
        FixedPairSampler,
        RandomPairSampler,
        SyntheticPairSource,
        generate_fixed_pairs,
    )
    from .data.collate import make_bucket_specs
    from .data.manifest import build_data_list, train_val_test_split
    from .data.pipeline import PrefetchingLoader, bucketed_batches

    specs = make_bucket_specs(
        cfg.data.video_buckets, cfg.data.audio_samples_per_video_frame,
        cfg.data.max_label_len,
    )

    if synthetic:
        src = SyntheticPairSource(tokenizer, seed=cfg.data.seed)
        def train_factory():
            it = (src.load_pair() for _ in range(cfg.data.num_pairs_per_epoch))
            return PrefetchingLoader(
                lambda: bucketed_batches(it, specs, cfg.train.batch_size),
                depth=cfg.data.prefetch_depth,
                device_put=device_put,  # overlap host->device transfer with compute
            )
        val_src = SyntheticPairSource(tokenizer, seed=cfg.data.seed + 1)
        def val_factory():
            it = (val_src.load_pair() for _ in range(cfg.data.eval_pairs))
            return PrefetchingLoader(
                lambda: bucketed_batches(it, specs, cfg.train.eval_batch_size),
                depth=cfg.data.prefetch_depth,
                device_put=device_put,
            )
        return train_factory, val_factory

    entries, skipped = build_data_list(
        cfg.data.json_folder, cfg.data.npy_dir, cfg.data.text_dir, cfg.data.wav_dir
    )
    if skipped:
        print(f"manifest: skipped {len(skipped)} sentences with missing artifacts")
    if len(entries) < 2:
        raise SystemExit(
            "no usable data found (the bundled corpus is metadata-only); "
            "run with --synthetic or point data.* config at a prepared dataset"
        )
    train_set, val_set, _test_set = train_val_test_split(entries, seed=cfg.data.seed)
    source = FilePairSource(tokenizer, cfg.data.sample_rate)
    # On-device preprocessing (production default): the host only decodes +
    # collates raw media; gray/resize/mixing/masks run fused on device
    # (data/device_pipeline.py).  Host path = reference-style load_pair.
    on_device = cfg.data.device_preprocess
    load_fn = source.load_pair_raw if on_device else source.load_pair
    train_sampler = RandomPairSampler(
        train_set, load_fn, cfg.data.num_pairs_per_epoch, seed=cfg.data.seed
    )
    val_pairs = generate_fixed_pairs(val_set, cfg.data.eval_pairs, seed=cfg.data.seed)
    val_sampler = FixedPairSampler(val_pairs, load_fn)

    def make_factory(sampler, batch_size):
        if on_device:
            from .data.collate import collate_pairs_raw
            from .data.device_pipeline import device_preprocessed_batches

            def factory():
                loader = PrefetchingLoader(
                    lambda: bucketed_batches(iter(sampler), specs, batch_size,
                                             collate_fn=collate_pairs_raw),
                    depth=cfg.data.prefetch_depth,
                    device_put=False,   # raw arrays transfer inside the jit call
                )
                return device_preprocessed_batches(loader)
            return factory

        def factory():
            return PrefetchingLoader(
                lambda: bucketed_batches(iter(sampler), specs, batch_size),
                depth=cfg.data.prefetch_depth,
                device_put=device_put,
            )
        return factory

    return (make_factory(train_sampler, cfg.train.batch_size),
            make_factory(val_sampler, cfg.train.eval_batch_size))


def run_infer(cfg, tokenizer, synthetic: bool, export_dir: str = "") -> None:
    """Serving entry (`--infer`): checkpoint → per-utterance transcripts on
    the eval split (or synthetic pairs).  The reference has no inference
    surface at all — decoding exists only inside its eval loop
    (reference model/trainer.py:179-252).  With ``--export=<dir>``, the
    full serving computation (forward + on-device decode) is additionally
    packaged as a deployment artifact (StableHLO blob + params + vocab
    [+ LM], loadable via ``ExportedTranscriber`` with no model code)."""
    import jax

    from .infer import Transcriber

    _, val_factory = build_data(cfg, tokenizer, synthetic, device_put=False)
    ckpt = os.path.join(cfg.train.checkpoint_dir, "best_wer.ckpt")
    if not os.path.isfile(ckpt):
        ckpt = os.path.join(cfg.train.checkpoint_dir, "last.ckpt")
    if not os.path.isfile(ckpt):
        raise SystemExit(f"no checkpoint under {cfg.train.checkpoint_dir}")

    dtype = {"bfloat16": jax.numpy.bfloat16, "float32": jax.numpy.float32}[cfg.model.dtype]
    first = next(iter(val_factory()))
    transcriber = Transcriber.from_checkpoint(cfg, tokenizer, ckpt, first,
                                              dtype=dtype,
                                              quantize=cfg.decode.quantize)
    if cfg.decode.quantize:
        from .ops.quantize import tree_bytes

        qb = tree_bytes(transcriber.qvariables) + tree_bytes(transcriber.scales)
        print(f"int8 weight-only serving: {qb / 1e6:.1f} MB of parameters")
    if export_dir:
        from .infer import export_transcriber

        export_transcriber(transcriber, export_dir, first)
        print(f"exported serving artifact to {export_dir}")
    print(f"transcribing with {ckpt}")
    n = 0
    for batch in val_factory():
        texts = transcriber.transcribe(batch)
        num_real = int(batch.get("num_real", len(texts)))
        for t1, t2 in texts[:num_real]:
            print(f"[utt {n}] speaker1: {t1}")
            print(f"[utt {n}] speaker2: {t2}")
            n += 1
    print(f"transcribed {n} pairs")


def run_eval(cfg, tokenizer, synthetic: bool) -> None:
    """Metrics entry (`--eval`): checkpoint → eval-split loss/WER/CER report.

    The reference's only quality surface is ``trainer.evaluate`` buried in
    the train loop (reference model/trainer.py:179-252, avg WER printed at
    epoch end); this exposes it standalone, with CER (the project's north
    star — jiwer's space-split WER is word-level on char vocab) and both
    greedy and beam decodes.  Prints one JSON line, so it scripts."""
    import json

    import jax

    from .models import MultiSpeakerAVModel
    from .train import MultiSpeakerTrainer
    from .train.checkpoints import restore_checkpoint

    _, val_factory = build_data(cfg, tokenizer, synthetic, device_put=False)
    ckpt = os.path.join(cfg.train.checkpoint_dir, "best_wer.ckpt")
    if not os.path.isfile(ckpt):
        ckpt = os.path.join(cfg.train.checkpoint_dir, "last.ckpt")
    if not os.path.isfile(ckpt):
        raise SystemExit(f"no checkpoint under {cfg.train.checkpoint_dir}")

    dtype = {"bfloat16": jax.numpy.bfloat16, "float32": jax.numpy.float32}[cfg.model.dtype]
    model = MultiSpeakerAVModel(cfg.model, dtype=dtype)
    trainer = MultiSpeakerTrainer(cfg, model, tokenizer)
    first = next(iter(val_factory()))
    state = trainer.init_state(cfg.data.seed, first)
    # Template restore (never by leaf order) into the live TrainState.
    payload = restore_checkpoint(
        ckpt, template={"state": jax.device_get(state), "epoch": 0})
    state = payload["state"].replace(rng=state.rng)

    report = {"checkpoint": ckpt, "epoch": int(payload.get("epoch", 0)),
              "decode": {}}
    for name, use_beam in (("greedy", False),
                           (cfg.decode.algorithm, True)):
        loss, wer, cer, per_speaker = trainer.evaluate(
            val_factory(), state, use_beam=use_beam)
        # Loss is per-pass: with --synthetic the val factory re-draws pairs,
        # so each decode scores its own draw (real-data val sets are fixed).
        report["decode"][name] = {"eval_loss": round(float(loss), 4),
                                  "wer": round(float(wer), 4),
                                  "cer": round(float(cer), 4)}
        print(f"[eval] {name}: loss={loss:.4f} wer={wer:.4f} cer={cer:.4f}",
              flush=True)
    print(json.dumps(report))


def run_stream_av(cfg, tokenizer, spec: str) -> None:
    """Streaming TWO-SPEAKER AV transcription
    (`--stream=lips1.avi,lips2.avi,mix.wav`): first-party container decode
    (data/avi.py) → lip preprocessing → chunked flagship forward with
    carried per-speaker decode state (streaming.StreamingAVTranscriber).
    Loads a flagship checkpoint from ``train.checkpoint_dir``."""
    import jax

    from .data.audio_io import read_wav, resample
    from .data.avi import read_avi
    from .data.pipeline import preprocess_lip_clip_host
    from .models import MultiSpeakerAVModel
    from .streaming import StreamingAVTranscriber
    from .train.checkpoints import restore_checkpoint

    paths = [p for p in spec.split(",") if p]
    if len(paths) != 3:
        raise SystemExit("--stream AV mode takes lips1.avi,lips2.avi,mix.wav")
    lips_path1, lips_path2, wav_path = paths

    ckpt = os.path.join(cfg.train.checkpoint_dir, "best_wer.ckpt")
    if not os.path.isfile(ckpt):
        ckpt = os.path.join(cfg.train.checkpoint_dir, "last.ckpt")
    if not os.path.isfile(ckpt):
        raise SystemExit(f"no checkpoint under {cfg.train.checkpoint_dir}")

    dtype = {"bfloat16": jax.numpy.bfloat16, "float32": jax.numpy.float32}[cfg.model.dtype]
    # decode.stream_*_seconds set the chunk/context like the audio path,
    # converted to video frames (~30 fps at the shipped 534 samples/frame).
    spf = cfg.data.audio_samples_per_video_frame
    fps = cfg.data.sample_rate / spf
    s = StreamingAVTranscriber(
        cfg, tokenizer, None, dtype=dtype,
        chunk_frames=max(1, round(cfg.decode.stream_chunk_seconds * fps)),
        context_frames=max(1, round(cfg.decode.stream_context_seconds * fps)))

    # Template restore at the streaming window shape (by name, never order).
    from flax import serialization

    model = MultiSpeakerAVModel(cfg.model, dtype=dtype)
    F = s.context_frames + s.chunk_frames
    S = F * spf
    z_lip = jax.numpy.zeros((1, F, 1, s.lip_size, s.lip_size))
    z_a = jax.numpy.zeros((1, S))
    z_m = jax.numpy.full((1, S), 2, jax.numpy.int32)
    z_l = jax.numpy.full((1,), F, jax.numpy.int32)
    template = jax.jit(model.init)(
        jax.random.PRNGKey(0), z_lip, z_lip, z_a, z_m, z_m, z_l, z_l)
    payload = restore_checkpoint(ckpt)
    state = payload.get("state", payload)
    params = state.get("params", state)
    variables = {"params": serialization.from_state_dict(
        template["params"], params)}
    stats = state.get("batch_stats")
    if stats and "batch_stats" in template:
        variables["batch_stats"] = serialization.from_state_dict(
            template["batch_stats"], stats)
    elif "batch_stats" in template:
        variables["batch_stats"] = template["batch_stats"]
    s.variables = variables

    frames1, _fps1 = read_avi(lips_path1)
    frames2, _fps2 = read_avi(lips_path2)
    lips1 = preprocess_lip_clip_host(frames1, s.lip_size)
    lips2 = preprocess_lip_clip_host(frames2, s.lip_size)
    audio, sr = read_wav(wav_path)
    if sr != cfg.data.sample_rate:
        audio = resample(audio, sr, cfg.data.sample_rate)

    spf = cfg.data.audio_samples_per_video_frame
    block_f = s.chunk_frames
    n_f = min(lips1.shape[0], lips2.shape[0], len(audio) // spf)
    print(f"streaming AV {lips_path1}+{lips_path2}+{wav_path} "
          f"({n_f} frames) with {ckpt}, chunk={block_f} frames")
    for i in range(0, n_f, block_f):
        j = min(i + block_f, n_f)
        t1, t2 = s.feed(lips1[i:j], lips2[i:j], audio[i * spf : j * spf])
        if t1:
            print(f"[speaker1] {t1}", flush=True)
        if t2:
            print(f"[speaker2] {t2}", flush=True)
    t1, t2 = s.flush()
    if t1:
        print(f"[speaker1] {t1}", flush=True)
    if t2:
        print(f"[speaker2] {t2}", flush=True)


def run_stream(cfg, tokenizer, wav_path: str) -> None:
    """Long-form serving (`--stream=file.wav`): chunked audio-only
    transcription at ONE static compiled shape (streaming.py) — unbounded
    input never recompiles and latency is bounded by the chunk length.
    `--stream=a.wav,b.wav,...` runs the files as CONCURRENT streams through
    a batched ``StreamingPool`` (one `[n, window]` forward per tick).
    `--stream=lips1.avi,lips2.avi,mix.wav` streams the two-speaker AV
    flagship instead (run_stream_av).  Loads an audio-family checkpoint
    (``--family=audio`` training) from ``train.checkpoint_dir``."""
    if any(p.lower().endswith(".avi") for p in wav_path.split(",")):
        return run_stream_av(cfg, tokenizer, wav_path)
    import jax

    from .data.audio_io import read_wav, resample
    from .models import AudioOnlyCTC
    from .streaming import StreamingAudioTranscriber, StreamingPool
    from .train.checkpoints import restore_checkpoint

    ckpt = os.path.join(cfg.train.checkpoint_dir, "best_wer.ckpt")
    if not os.path.isfile(ckpt):
        ckpt = os.path.join(cfg.train.checkpoint_dir, "last.ckpt")
    if not os.path.isfile(ckpt):
        raise SystemExit(f"no checkpoint under {cfg.train.checkpoint_dir}")

    dtype = {"bfloat16": jax.numpy.bfloat16, "float32": jax.numpy.float32}[cfg.model.dtype]
    paths = [p for p in wav_path.split(",") if p]
    if len(paths) > 1:
        s = StreamingPool(
            cfg, tokenizer, None, dtype=dtype, max_streams=len(paths),
            chunk_seconds=cfg.decode.stream_chunk_seconds,
            context_seconds=cfg.decode.stream_context_seconds,
            quantize=cfg.decode.quantize,
        )
    else:
        s = StreamingAudioTranscriber(
            cfg, tokenizer, None, dtype=dtype,
            chunk_seconds=cfg.decode.stream_chunk_seconds,
            context_seconds=cfg.decode.stream_context_seconds,
            quantize=cfg.decode.quantize,
        )

    # Template restore: init params at the streaming window shape, then load
    # the checkpoint leaves over the template's structure.
    model = AudioOnlyCTC(cfg.model, dtype=dtype)
    template = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jax.numpy.zeros((1, s.window_samples), jax.numpy.float32),
        jax.numpy.ones((1, s.window_samples), bool),
    )
    from flax import serialization

    payload = restore_checkpoint(ckpt)
    state = payload.get("state", payload)        # wrapped or bare checkpoints
    params = state.get("params", state)
    # Restore BY NAME into the template (not by flattened leaf order, which
    # silently mispairs if traversal order ever differs).
    s.variables = {"params": serialization.from_state_dict(
        template["params"], params)}
    if cfg.decode.quantize:
        s.quantize_weights()

    def load(path):
        audio, sr = read_wav(path)
        if sr != cfg.data.sample_rate:
            audio = resample(audio, sr, cfg.data.sample_rate)
        return audio

    block = s.chunk_samples
    if len(paths) > 1:
        audios = [load(p) for p in paths]
        sids = [s.open() for _ in paths]
        print(f"streaming {len(paths)} concurrent files with {ckpt}, "
              f"chunk={block / cfg.data.sample_rate:.1f}s", flush=True)
        for i in range(0, max(a.shape[0] for a in audios), block):
            for sid, audio in zip(sids, audios):
                if i < audio.shape[0]:
                    piece = s.feed(sid, audio[i : i + block])
                    if piece:
                        print(f"[{paths[sid]}] {piece}", flush=True)
        for sid, path in zip(sids, paths):
            tail = s.flush(sid)
            if tail:
                print(f"[{path}] {tail}", flush=True)
        return

    audio = load(wav_path)
    print(f"streaming {wav_path} ({audio.shape[0] / cfg.data.sample_rate:.1f} s) "
          f"with {ckpt}, chunk={s.chunk_samples / cfg.data.sample_rate:.1f}s")
    for i in range(0, audio.shape[0], block):
        piece = s.feed(audio[i : i + block])
        if piece:
            print(piece, flush=True)
    tail = s.flush()
    if tail:
        print(tail, flush=True)


def run_ssl_pretrain(cfg, tokenizer, synthetic: bool) -> None:
    """Self-supervised audio-encoder pretraining (the wav2vec2 replacement,
    train/ssl_pretrain.py): masked-span InfoNCE over mixture audio.  The
    checkpoint's audio_encoder subtree grafts into the flagship via
    ``train.audio_init_ckpt``."""
    import jax

    from .train.checkpoints import CheckpointManager, save_checkpoint
    from .train.ssl_pretrain import MaskedAudioPretrainer

    train_factory, _ = build_data(cfg, tokenizer, synthetic, device_put=False)
    ssl = MaskedAudioPretrainer(
        cfg, mask_prob=cfg.train.ssl_mask_prob, span=cfg.train.ssl_mask_span,
        temperature=cfg.train.ssl_temperature,
    )
    state = ssl.init_state(cfg.data.seed, next(iter(train_factory())))
    ckpts = CheckpointManager(cfg.train.checkpoint_dir)
    # Full-state resume (params + opt_state + dropout key): an interrupted
    # pretrain continues with intact Adam moments and a fresh-per-step
    # dropout stream instead of silently restarting the optimizer.
    def snapshot(s):
        return {k: jax.device_get(s[k]) for k in ("params", "opt_state", "key")}

    resumed = ckpts.try_resume(template={"state": snapshot(state), "epoch": 0})
    start_epoch = 1
    if resumed is not None:
        start_epoch = int(resumed["epoch"]) + 1
        print(f"resuming ssl from {ckpts.last} at epoch {start_epoch}")
        state = dict(resumed["state"])
    from .train.preempt import GracefulShutdown

    with GracefulShutdown(enable=cfg.train.handle_signals) as stop:
        for epoch in range(start_epoch, cfg.train.max_epochs + 1):
            # Span schedule is a pure function of (seed, epoch) so a resumed
            # run replays the masks it would have drawn uninterrupted.
            state = ssl.fit(
                state, train_factory(), log_every=cfg.train.log_every,
                span_rng=np.random.default_rng(cfg.data.seed * 1009 + epoch),
                stop=stop)
            if stop.requested:
                # Preempted mid-epoch: full-state snapshot as epoch-1 so the
                # standard resume redoes this epoch with intact Adam moments.
                save_checkpoint(ckpts.last,
                                {"state": snapshot(state), "epoch": epoch - 1})
                print(f"preempted: saved {ckpts.last} mid-epoch {epoch} "
                      f"(resume will redo the epoch)")
                break
            print(f"[ssl epoch {epoch}] infonce={state['last_loss']:.4f}")
            save_checkpoint(ckpts.last, {"state": snapshot(state), "epoch": epoch})


def build_single_modality_data(cfg, tokenizer, family: str, synthetic: bool):
    """(train_factory, val_factory) over the single-stream batch schema
    ``{inputs, meta, labels, label_lengths}`` for the audio/visual families
    — shared by training (run_single_modality) and the standalone
    ``--eval``/``--infer`` surfaces."""
    from .train.single_modality import (
        synthetic_audio_batches,
        synthetic_visual_batches,
        utterance_batches,
    )

    if synthetic:
        syn = synthetic_audio_batches if family == "audio" else synthetic_visual_batches
        n_train = max(1, cfg.data.num_pairs_per_epoch // cfg.train.batch_size)
        n_val = max(1, cfg.data.eval_pairs // cfg.train.eval_batch_size)
        train_factory = lambda: syn(tokenizer, cfg.train.batch_size, n_train,
                                    seed=cfg.data.seed)
        val_factory = lambda: syn(tokenizer, cfg.train.eval_batch_size, n_val,
                                  seed=cfg.data.seed + 1)
        return train_factory, val_factory

    from .data.manifest import build_data_list, train_val_test_split

    entries, _ = build_data_list(cfg.data.json_folder, cfg.data.npy_dir,
                                 cfg.data.text_dir, cfg.data.wav_dir)
    if not entries:
        raise SystemExit("no usable data; use --synthetic")
    train_set, val_set, _ = train_val_test_split(entries, seed=cfg.data.seed)
    train_factory = lambda: utterance_batches(
        train_set, tokenizer, family, cfg.train.batch_size,
        cfg.data.sample_rate)
    val_factory = lambda: utterance_batches(
        val_set, tokenizer, family, cfg.train.eval_batch_size,
        cfg.data.sample_rate, drop_last=False)
    return train_factory, val_factory


def _restore_single_modality(cfg, tokenizer, family: str, first_batch):
    """Build the family trainer and template-restore its checkpoint
    (best_wer, falling back to last) — the single-modality analogue of the
    flagship restore in run_eval/run_infer."""
    import jax

    from .train.checkpoints import restore_checkpoint
    from .train.single_modality import make_audio_trainer, make_visual_trainer

    make = make_audio_trainer if family == "audio" else make_visual_trainer
    trainer = make(cfg, tokenizer)
    ckpt = os.path.join(cfg.train.checkpoint_dir, "best_wer.ckpt")
    if not os.path.isfile(ckpt):
        ckpt = os.path.join(cfg.train.checkpoint_dir, "last.ckpt")
    if not os.path.isfile(ckpt):
        raise SystemExit(f"no checkpoint under {cfg.train.checkpoint_dir}")
    state = trainer.init_state(cfg.data.seed, first_batch)
    payload = restore_checkpoint(
        ckpt, template={"state": jax.device_get(state), "epoch": 0})
    return trainer, dict(payload["state"]), ckpt, int(payload.get("epoch", 0))


def run_eval_single_modality(cfg, tokenizer, family: str, synthetic: bool) -> None:
    """``--eval --family=audio|visual``: standalone scoring of a
    single-modality checkpoint — greedy + production decode
    (config.decode.algorithm, LM fusion included), one JSON line.  Same
    surface as the flagship run_eval; closes the gap where SSL→finetune
    products could only be scored through private benchmark harnesses."""
    import json

    _, val_factory = build_single_modality_data(cfg, tokenizer, family, synthetic)
    first = next(iter(val_factory()))
    trainer, state, ckpt, epoch = _restore_single_modality(
        cfg, tokenizer, family, first)
    report = {"checkpoint": ckpt, "family": family, "epoch": epoch, "decode": {}}
    for name, use_beam in (("greedy", False), (cfg.decode.algorithm, True)):
        loss, wer_, cer_ = trainer.evaluate(val_factory(), state, use_beam=use_beam)
        report["decode"][name] = {"eval_loss": round(float(loss), 4),
                                  "wer": round(float(wer_), 4),
                                  "cer": round(float(cer_), 4)}
        print(f"[eval {family}] {name}: loss={loss:.4f} wer={wer_:.4f} "
              f"cer={cer_:.4f}", flush=True)
    print(json.dumps(report))


def run_infer_single_modality(cfg, tokenizer, family: str, synthetic: bool) -> None:
    """``--infer --family=audio|visual``: checkpoint → per-utterance
    transcripts with the production decode (config.decode.algorithm)."""
    from .train.trainer import decode_log_probs

    _, val_factory = build_single_modality_data(cfg, tokenizer, family, synthetic)
    first = next(iter(val_factory()))
    trainer, state, ckpt, _ = _restore_single_modality(
        cfg, tokenizer, family, first)
    print(f"transcribing ({family}) with {ckpt}")
    n = 0
    for batch in val_factory():
        lp, il = trainer.eval_forward(state["params"], state["batch_stats"],
                                      batch["inputs"], batch["meta"])
        ids, lens = decode_log_probs(cfg, lp, il)
        ids, lens = np.asarray(ids), np.asarray(lens)
        num_real = int(batch.get("num_real", ids.shape[0]))
        for b in range(num_real):
            print(f"[utt {n}] {tokenizer.decode(ids[b, : lens[b]].tolist())}")
            n += 1
    print(f"transcribed {n} utterances")


def run_single_modality(cfg, tokenizer, family: str, synthetic: bool) -> None:
    """Audio-only / video-only CTC training (BASELINE configs 1-2)."""
    from .train.single_modality import make_audio_trainer, make_visual_trainer

    make = make_audio_trainer if family == "audio" else make_visual_trainer
    trainer = make(cfg, tokenizer)
    train_factory, val_factory = build_single_modality_data(
        cfg, tokenizer, family, synthetic)

    from .train.checkpoints import CheckpointManager

    import jax

    state = trainer.init_state(cfg.data.seed, next(iter(train_factory())))
    ckpts = CheckpointManager(cfg.train.checkpoint_dir,
                              layout=cfg.train.checkpoint_layout)
    if cfg.train.checkpoint_layout == "sharded":
        template = {"state": state, "epoch": 0}
    else:
        template = {"state": jax.device_get(state), "epoch": 0}
    resumed = ckpts.try_resume(template=template)
    start_epoch = 1
    if resumed is not None:
        start_epoch = int(resumed["epoch"]) + 1
        print(f"resuming from {ckpts.last} at epoch {start_epoch}")
        state = resumed["state"]
    trainer.fit(state, train_factory, val_factory, start_epoch=start_epoch)


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    synthetic = "--synthetic" in argv
    infer = "--infer" in argv
    evaluate = "--eval" in argv
    argv = [a for a in argv if a not in ("--synthetic", "--infer", "--eval")]
    family = "av"
    stream_wav = None
    export_dir = ""
    for a in list(argv):
        if a.startswith("--family="):
            family = a.split("=", 1)[1]
            argv.remove(a)
        elif a.startswith("--stream="):
            stream_wav = a.split("=", 1)[1]
            argv.remove(a)
        elif a.startswith("--export="):
            export_dir = a.split("=", 1)[1]
            argv.remove(a)
    if family not in ("av", "audio", "visual", "ssl"):
        raise SystemExit(f"--family must be av|audio|visual|ssl, got {family}")

    from .config import from_flat_overrides
    from .models import MultiSpeakerAVModel
    from .text import CharTokenizer
    from .train import MultiSpeakerTrainer
    from .train.checkpoints import CheckpointManager

    cfg = from_flat_overrides(argv)
    np.random.seed(cfg.data.seed)

    # Persistent XLA compilation cache (opt-in, compile_cache_dir=<dir>):
    # relaunches, preemption-resumes, and serving restarts reuse compiled
    # step functions.  Must run before any jit trace below; see
    # runtime/compile_cache.py for why this is not default-on.
    if cfg.compile_cache_dir:
        from .runtime.compile_cache import enable_compile_cache

        enable_compile_cache(cfg.compile_cache_dir)

    vocab = cfg.data.vocab_path
    if not os.path.exists(vocab):
        vocab = os.path.join(os.path.dirname(__file__), "..", "assets", "tokenizer800.vocab")
    tokenizer = CharTokenizer(vocab)
    cfg.model.decoder.vocab_size = tokenizer.vocab_size

    if stream_wav is not None:
        run_stream(cfg, tokenizer, stream_wav)
        return
    if evaluate:
        if family == "ssl":
            raise SystemExit("--eval scores decoder-bearing families "
                             "(av|audio|visual); finetune an SSL checkpoint "
                             "first (train.audio_init_ckpt)")
        if family == "av":
            run_eval(cfg, tokenizer, synthetic)
        else:
            run_eval_single_modality(cfg, tokenizer, family, synthetic)
        return
    if infer:
        if family == "ssl":
            raise SystemExit("--infer serves decoder-bearing families "
                             "(av|audio|visual)")
        if family == "av":
            run_infer(cfg, tokenizer, synthetic, export_dir)
        else:
            run_infer_single_modality(cfg, tokenizer, family, synthetic)
        return
    if family == "ssl":
        run_ssl_pretrain(cfg, tokenizer, synthetic)
        return
    if family != "av":
        run_single_modality(cfg, tokenizer, family, synthetic)
        return

    import jax

    dtype = {"bfloat16": jax.numpy.bfloat16, "float32": jax.numpy.float32}[cfg.model.dtype]
    model = MultiSpeakerAVModel(cfg.model, dtype=dtype)
    frozen = ("visual_encoder",) if cfg.train.freeze_visual_trunk else ()

    # Multi-host: no-op unless the cluster env vars are set
    # (parallel/multihost.py); afterwards jax.devices() spans all hosts.
    from .parallel.multihost import initialize_distributed, make_hybrid_mesh

    multiprocess = initialize_distributed()
    mesh = None
    if len(jax.devices()) > 1:
        if multiprocess:
            # Keep tensor-parallel groups inside each host's ICI domain.
            mesh = make_hybrid_mesh(model_parallel=cfg.mesh.model_axis)
        else:
            from .parallel import make_mesh

            mesh = make_mesh(model_parallel=cfg.mesh.model_axis)
        print(f"mesh: {mesh}")
    if multiprocess:
        # Per-host input scale-out: each process loads only ITS shard of the
        # global batch; shard_batch assembles the global array from the
        # process-local rows (jax.make_array_from_process_local_data).
        from .parallel.multihost import process_local_batch_size

        cfg.train.batch_size = process_local_batch_size(cfg.train.batch_size)
        cfg.train.eval_batch_size = process_local_batch_size(cfg.train.eval_batch_size)
        print(f"process {jax.process_index()}: local batch "
              f"{cfg.train.batch_size} (train) / {cfg.train.eval_batch_size} (eval)")

    trainer = MultiSpeakerTrainer(cfg, model, tokenizer, frozen_prefixes=frozen,
                                  mesh=mesh, fsdp=mesh is not None and cfg.mesh.fsdp)

    # With a mesh the trainer re-places batches with their mesh sharding;
    # a plain device_put in the prefetcher would be a wasted transfer.
    train_factory, val_factory = build_data(cfg, tokenizer, synthetic,
                                            device_put=mesh is None)

    first_batch = next(iter(train_factory()))
    state = trainer.init_state(cfg.data.seed, first_batch)

    if cfg.train.visual_init_ckpt:
        # Pretrained-visual-trunk workflow (reference main.py:94-103): graft
        # the visual encoder from a --family=visual checkpoint, typically with
        # train.freeze_visual_trunk=true.  A later resume overrides the graft
        # (the reference restores the full last-checkpoint too, main.py:146).
        from .train.checkpoints import graft_subtree, restore_checkpoint

        src = restore_checkpoint(cfg.train.visual_init_ckpt)
        src_state = src.get("state", src)
        new_params = graft_subtree(jax.device_get(state.params),
                                   src_state["params"], ["visual_encoder"])
        updates = {"params": new_params}
        src_stats = src_state.get("batch_stats") or {}
        live_stats = jax.device_get(state.batch_stats)
        if src_stats.get("visual_encoder") and live_stats:
            updates["batch_stats"] = graft_subtree(
                live_stats, src_stats, ["visual_encoder"])
        state = state.replace(**updates)
        print(f"grafted visual encoder from {cfg.train.visual_init_ckpt}")

    if cfg.train.audio_init_ckpt:
        # Pretrained-audio-encoder workflow (the reference's wav2vec2 load,
        # model/encoder.py:83): graft from an SSL (--family=ssl) checkpoint,
        # typically with train.audio_trainable_layers for the partial
        # unfreeze (reference main.py:26-31).
        from .train.checkpoints import graft_subtree, restore_checkpoint
        from .train.ssl_pretrain import flagship_audio_params

        src = restore_checkpoint(cfg.train.audio_init_ckpt)
        src_state = src.get("state", src)
        new_params = graft_subtree(
            jax.device_get(state.params),
            {"audio_encoder": flagship_audio_params(src_state["params"])},
            ["audio_encoder"],
        )
        state = state.replace(params=new_params)
        print(f"grafted audio encoder from {cfg.train.audio_init_ckpt}")

    ckpts = CheckpointManager(cfg.train.checkpoint_dir,
                              layout=cfg.train.checkpoint_layout)
    # Template-restore keeps optax/flax pytree structure intact.  The
    # sharded layout restores straight into the live state's shardings (no
    # host gather), so its template is the device state itself.
    if cfg.train.checkpoint_layout == "sharded":
        template = {"state": state, "epoch": 0}
    else:
        template = {"state": jax.device_get(state), "epoch": 0}
    resumed = ckpts.try_resume(template=template)
    start_epoch = 1
    if resumed is not None:
        start_epoch = int(resumed["epoch"]) + 1
        print(f"resuming from {ckpts.last} at epoch {start_epoch}")
        # Template restore returned a structured TrainState; keep the fresh
        # state's live rng but adopt everything else.
        state = resumed["state"].replace(rng=state.rng)

    trainer.fit(state, train_factory, val_factory, start_epoch=start_epoch)


if __name__ == "__main__":
    main()
