"""Streaming / long-form audio transcription with bounded latency.

The reference has no serving surface at all (decoding lives inside
``trainer.evaluate``, reference model/trainer.py:179-252) and its pipeline
pads every utterance to the batch max — unusable for a live feed or an
hour-long recording.  ``infer.AudioTranscriber`` fixes batch serving; this
module fixes *unbounded* input:

* ONE static compiled shape per runner — ``[1, context + chunk]`` samples —
  so a live stream never recompiles and latency is bounded by the chunk
  length, not the recording length;
* each chunk is encoded together with ``context_seconds`` of already-seen
  audio (the Conformer attends over a realistic left window), but only the
  NEW chunk's frames are emitted;
* CTC greedy collapse carries the last raw token across the chunk boundary,
  so a token spanning two chunks merges exactly as it would in one
  full-utterance pass (the collapse is an exact streaming algorithm; the
  encoder's truncated attention context is the standard streaming-ASR
  approximation and is documented per-call via ``context_seconds``);
* ``algorithm="prefix_beam"`` (the production decode default) streams the
  full CTC *prefix* beam — with optional bigram-LM shallow fusion — by
  carrying the beam state ``(prefixes, p_b, p_nb)`` across chunks
  (``ops/prefix_beam_search.prefix_beam_stream_step``): feeding chunks is
  mathematically identical to one offline beam pass over the emitted frames.
  Text is emitted as soon as it is COMMITTED (shared by every live beam), so
  streamed output never retracts; ``flush`` emits the best beam's tail.

Frame/sample alignment: one encoder frame per ``hop_length ×
subsample_factor`` samples (320 at the defaults = 50 Hz).  Chunk and context
lengths snap to that multiple so emission boundaries land exactly on frame
anchors (``models/audio.py`` anchors mel frame ``t`` at sample ``t·hop``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .models import AudioOnlyCTC


def _snap(n: int, multiple: int) -> int:
    return max(multiple, (n // multiple) * multiple)


class _PrefixBeamStream:
    """Carried CTC prefix-beam state over one stream of emitted frames.

    Owns the ``(prefixes, lens, p_b, p_nb)`` state and the commit logic:
    ``advance`` consumes the NEW frames of a decode window and returns the
    newly COMMITTED tokens (prefix shared by every live beam — stream output
    never retracts); ``tail`` returns the best beam's uncommitted remainder
    (emitted at flush).  Used by the audio transcriber (one instance) and
    the AV transcriber (one per speaker)."""

    def __init__(self, decode_cfg, blank: int, n_frames: int,
                 capacity: int, lm=None):
        self._dcfg = decode_cfg
        self._blank = blank
        self._n_frames = n_frames           # static per-advance frame count
        self._capacity = capacity
        self._lm = lm
        self.state = None
        self.committed = 0

    def advance(self, log_probs, start: int, end: int) -> list[int]:
        from .ops.prefix_beam_search import (
            _NEG_INF,
            prefix_beam_state_init,
            prefix_beam_stream_step,
        )

        dcfg = self._dcfg
        if self.state is None:
            self.state = prefix_beam_state_init(dcfg.beam_width,
                                                self._capacity)
        # Static [n_frames, V] slice: pad rows past `length` are identity.
        lp_new = jax.lax.dynamic_slice_in_dim(log_probs, start,
                                              self._n_frames, 0)
        self.state = prefix_beam_stream_step(
            self.state, lp_new, end - start,
            top_k=dcfg.prefix_top_k, blank_id=self._blank,
            lm=self._lm,
            lm_weight=dcfg.lm_weight if self._lm is not None else 0.0,
            length_bonus=dcfg.length_bonus if self._lm is not None else 0.0)

        prefixes, lens, pb, pnb = (np.asarray(a) for a in self.state)
        total = np.logaddexp(np.maximum(pb, _NEG_INF), np.maximum(pnb, _NEG_INF))
        live = total > _NEG_INF / 2
        live[0] = True                               # best beam always counts
        # Committed = longest common prefix of all live beams.
        commit = int(lens[live].min())
        top = prefixes[0]
        for i in np.where(live)[0]:
            if commit == 0:
                break
            agree = prefixes[i, :commit] == top[:commit]
            commit = int(np.argmin(agree)) if not agree.all() else commit
        out = [int(t) for t in top[self.committed : commit]]
        self.committed = commit

        # Capacity management: shift committed tokens out of the buffer when
        # the next chunk could overflow it (committed tokens are common to
        # every live beam, so the shift preserves beam identity).
        W, C = prefixes.shape
        if self.committed and int(lens.max()) > C - 2 * self._n_frames:
            k = self.committed
            shifted = np.full_like(prefixes, -1)
            shifted[:, : C - k] = prefixes[:, k:]
            self.state = (
                jnp.asarray(shifted),
                jnp.asarray(np.maximum(lens - k, 0)),
                jnp.asarray(pb), jnp.asarray(pnb),
            )
            self.committed = 0
        return out

    def tail(self) -> list[int]:
        """The best beam's uncommitted tokens (drained at flush)."""
        if self.state is None:
            return []
        prefixes, lens, _pb, _pnb = (np.asarray(a) for a in self.state)
        return [int(t) for t in prefixes[0, self.committed : lens[0]]]


@dataclasses.dataclass
class StreamingAudioTranscriber:
    """Incremental audio-only CTC transcription (BASELINE config 1 model).

    Usage::

        s = StreamingAudioTranscriber(cfg, tok, variables,
                                      chunk_seconds=2.0, context_seconds=8.0)
        for block in microphone():        # arbitrary-sized float32 blocks
            print(s.feed(block), end="")  # newly emitted text, maybe ""
        print(s.flush())                  # drain the tail

    ``forward_fn(variables, window, sample_mask) -> log_probs [1, T, V]``
    is injectable for testing; the default applies ``AudioOnlyCTC``.
    """

    config: Config
    tokenizer: Any
    variables: Any
    chunk_seconds: float = 2.0
    context_seconds: float = 8.0
    dtype: Any = None
    forward_fn: Callable | None = None
    # Decode algorithm: None → config.decode.algorithm.  "prefix_beam"
    # streams the beam (carried state, committed-token emission); anything
    # else falls back to exact greedy collapse.
    algorithm: str | None = None
    beam_capacity: int = 512            # transcript tokens per stream segment
    quantize: bool = False              # int8 weight-only serving (ops/quantize.py)
    quantize_min_size: int = 4096

    def __post_init__(self):
        fe = self.config.model.frontend
        acfg = self.config.model.audio
        sr = fe.sample_rate
        self._samples_per_frame = fe.hop_length * acfg.subsample_factor
        self._chunk = _snap(int(self.chunk_seconds * sr), self._samples_per_frame)
        self._ctx = _snap(int(self.context_seconds * sr), self._samples_per_frame)
        self._window = self._ctx + self._chunk
        if self.algorithm is None:
            self.algorithm = self.config.decode.algorithm
        self._beam = self.algorithm == "prefix_beam"
        self._lm = None
        if self._beam and self.config.decode.lm_path:
            from .infer import _fusion_lm

            self._lm = _fusion_lm(self.config)

        if self.forward_fn is None:
            dtype = self.dtype or jnp.bfloat16
            model = AudioOnlyCTC(self.config.model, dtype=dtype)

            if self.quantize:
                from .ops.quantize import dequantize_variables

                def forward(variables, window, sample_mask):
                    v = dequantize_variables(*variables, dtype)
                    log_probs, _ = model.apply(v, window, sample_mask)
                    return log_probs
            else:
                def forward(variables, window, sample_mask):
                    log_probs, _ = model.apply(variables, window, sample_mask)
                    return log_probs

            self.forward_fn = forward
        self._forward = jax.jit(self.forward_fn)
        if self.quantize and self.variables is not None:
            self.quantize_weights()

        self.reset()

    def quantize_weights(self) -> None:
        """Convert ``variables`` to the int8 form the quantized forward
        expects (ops/quantize.py).  Called automatically when the
        constructor receives variables; call manually after assigning
        ``variables`` post-construction (the ``run_stream`` restore path)."""
        from .ops.quantize import quantize_variables

        self.variables = quantize_variables(self.variables,
                                            self.quantize_min_size)

    # -- state ----------------------------------------------------------------

    def reset(self) -> None:
        """Forget all buffered audio and decoder state."""
        self._buffer = np.zeros((0,), np.float32)   # not-yet-emitted samples
        self._context = np.zeros((0,), np.float32)  # already-emitted tail
        self._prev_raw = self.config.model.decoder.blank_id
        self._ids: list[int] = []
        self._beam_stream = (_PrefixBeamStream(
            self.config.decode, self.config.model.decoder.blank_id,
            self._chunk // self._samples_per_frame, self.beam_capacity,
            self._lm) if self._beam else None)

    @property
    def window_samples(self) -> int:
        return self._window

    @property
    def chunk_samples(self) -> int:
        return self._chunk

    # -- streaming ------------------------------------------------------------

    def feed(self, samples: np.ndarray) -> str:
        """Append audio; decode every complete chunk; return the new text."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buffer = np.concatenate([self._buffer, samples])
        emitted: list[int] = []
        while self._buffer.shape[0] >= self._chunk:
            chunk, self._buffer = (self._buffer[: self._chunk],
                                   self._buffer[self._chunk:])
            emitted.extend(self._decode_window(chunk, self._chunk))
        return self._emit(emitted)

    def flush(self) -> str:
        """Decode the buffered tail (zero-padded, mask-excluded) and reset."""
        emitted: list[int] = []
        n = self._buffer.shape[0]
        if n:
            chunk = np.pad(self._buffer, (0, self._chunk - n))
            emitted.extend(self._decode_window(chunk, n))
        if self._beam_stream is not None:
            # Emit the best beam's uncommitted tail.
            emitted.extend(self._beam_stream.tail())
        text = self._emit(emitted)
        self.reset()
        return text

    @property
    def text(self) -> str:
        """Everything emitted since the last ``reset``/``flush``."""
        return self.tokenizer.decode(self._ids)

    # -- internals --------------------------------------------------------------

    def _decode_window(self, chunk: np.ndarray, valid: int) -> list[int]:
        """Run the model over [context | chunk] and greedy-collapse the new
        frames; ``valid`` ≤ chunk length marks real (non-pad) samples."""
        ctx = self._context
        pad = self._ctx - ctx.shape[0]
        window = np.concatenate([np.zeros((pad,), np.float32), ctx, chunk])
        mask = np.ones((1, self._window), bool)
        mask[0, :pad] = False
        mask[0, self._ctx + valid:] = False

        log_probs = self._forward(self.variables, window[None], jnp.asarray(mask))

        spf = self._samples_per_frame
        start = self._ctx // spf                       # first NEW frame
        end = (self._ctx + valid + spf - 1) // spf     # past-the-end frame
        blank = self.config.model.decoder.blank_id

        if self._beam:
            out = self._beam_stream.advance(log_probs[0], start, end)
        else:
            raw = np.asarray(jnp.argmax(log_probs[0], axis=-1))
            out = []
            prev = self._prev_raw
            for tok in raw[start:end]:
                tok = int(tok)
                if tok != prev and tok != blank:
                    out.append(tok)
                prev = tok
            self._prev_raw = prev

        # Slide the context window: keep the last ctx samples of real audio.
        tail = np.concatenate([ctx, chunk[:valid]])
        self._context = tail[-self._ctx:] if self._ctx else tail[:0]
        return out

    def _emit(self, ids: list[int]) -> str:
        self._ids.extend(ids)
        return self.tokenizer.decode(ids) if ids else ""


@dataclasses.dataclass
class StreamingAVTranscriber:
    """Streaming TWO-SPEAKER audio-visual transcription on the flagship.

    The cocktail-party model itself is streamable: ``MultiSpeakerAVModel``
    emits per-speaker log-probs anchored one-to-one to VISUAL frames
    (fusion interpolates audio onto the lip timeline, models/av_model.py),
    so the audio transcriber's recipe applies directly with the frame clock
    moved from encoder frames (50 Hz) to video frames (30 fps):

    * ONE static compiled shape — lips ``[1, ctx+chunk frames, 1, H, W]``
      per speaker, audio ``[1, (ctx+chunk)·spf]`` — fed with
      ``context_frames`` of already-seen media plus the new chunk; only the
      NEW frames' log-probs are emitted;
    * per-speaker greedy collapse carries the last raw token across chunks
      (exact streaming collapse), or ``algorithm="prefix_beam"`` carries a
      full per-speaker prefix-beam (committed-token emission, LM fusion) —
      the same ``_PrefixBeamStream`` state machine as the audio path;
    * speaker masks: live feeds have no oracle overlap labels (the
      training masks come from corpus timestamps), so both speakers default
      to "target present" (mask 2) over real samples and pad (3) elsewhere —
      the flagship's separation then rests on the lip streams, which is the
      model's actual mechanism.  ``mask_fn(n_valid_samples) -> (m1, m2)``
      injects diarizer-provided masks when available.

    Usage::

        s = StreamingAVTranscriber(cfg, tok, variables)
        for lips1, lips2, audio in camera_and_mic():   # any block sizes
            t1, t2 = s.feed(lips1, lips2, audio)
        t1, t2 = s.flush()
    """

    config: Config
    tokenizer: Any
    variables: Any
    chunk_frames: int = 30              # 1 s of video at 30 fps
    context_frames: int = 120           # 4 s of already-seen media
    lip_size: int = 96
    dtype: Any = None
    forward_fn: Callable | None = None  # injectable for tests
    algorithm: str | None = None
    beam_capacity: int = 512
    mask_fn: Callable | None = None

    def __post_init__(self):
        self._spf = self.config.data.audio_samples_per_video_frame
        self._win_f = self.context_frames + self.chunk_frames
        self._win_s = self._win_f * self._spf
        if self.algorithm is None:
            self.algorithm = self.config.decode.algorithm
        self._beam = self.algorithm == "prefix_beam"
        self._lm = None
        if self._beam and self.config.decode.lm_path:
            from .infer import _fusion_lm

            self._lm = _fusion_lm(self.config)

        if self.forward_fn is None:
            from .models import MultiSpeakerAVModel

            dtype = self.dtype or jnp.bfloat16
            model = MultiSpeakerAVModel(self.config.model, dtype=dtype)

            def forward(variables, lip1, lip2, audio, m1, m2, len1, len2):
                out = model.apply(variables, lip1, lip2, audio, m1, m2,
                                  len1, len2)
                return out["log_probs1"], out["log_probs2"]

            self.forward_fn = forward
        self._forward = jax.jit(self.forward_fn)
        self.reset()

    # -- state ------------------------------------------------------------------

    def reset(self) -> None:
        H = self.lip_size
        self._lip_buf = [np.zeros((0, 1, H, H), np.float32) for _ in range(2)]
        self._lip_ctx = [np.zeros((0, 1, H, H), np.float32) for _ in range(2)]
        self._audio_buf = np.zeros((0,), np.float32)
        self._audio_ctx = np.zeros((0,), np.float32)
        blank = self.config.model.decoder.blank_id
        self._prev_raw = [blank, blank]
        self._ids: list[list[int]] = [[], []]
        self._beams = ([_PrefixBeamStream(self.config.decode, blank,
                                          self.chunk_frames,
                                          self.beam_capacity, self._lm)
                        for _ in range(2)] if self._beam else None)

    @property
    def chunk_samples(self) -> int:
        return self.chunk_frames * self._spf

    # -- streaming ----------------------------------------------------------------

    def feed(self, lips1, lips2, audio) -> tuple[str, str]:
        """Append synchronized media (lips ``[T,1,H,W]`` float32 in [0,1],
        audio ``[T·spf]``); decode every complete chunk; return each
        speaker's newly emitted text."""
        self._lip_buf[0] = np.concatenate(
            [self._lip_buf[0], np.asarray(lips1, np.float32)])
        self._lip_buf[1] = np.concatenate(
            [self._lip_buf[1], np.asarray(lips2, np.float32)])
        self._audio_buf = np.concatenate(
            [self._audio_buf, np.asarray(audio, np.float32).reshape(-1)])
        emitted: list[list[int]] = [[], []]
        while (min(b.shape[0] for b in self._lip_buf) >= self.chunk_frames
               and self._audio_buf.shape[0] >= self.chunk_samples):
            out = self._decode_window(self.chunk_frames)
            emitted[0].extend(out[0])
            emitted[1].extend(out[1])
        return self._emit(emitted)

    def flush(self) -> tuple[str, str]:
        """Decode the buffered tail, drain beam tails, reset."""
        emitted: list[list[int]] = [[], []]
        n_f = min(min(b.shape[0] for b in self._lip_buf),
                  -(-self._audio_buf.shape[0] // self._spf))
        if n_f:
            out = self._decode_window(n_f)
            emitted[0].extend(out[0])
            emitted[1].extend(out[1])
        if self._beams is not None:
            for s in range(2):
                emitted[s].extend(self._beams[s].tail())
        text = self._emit(emitted)
        self.reset()
        return text

    def text(self, speaker: int) -> str:
        return self.tokenizer.decode(self._ids[speaker])

    # -- internals ----------------------------------------------------------------

    def _decode_window(self, valid_f: int) -> tuple[list[int], list[int]]:
        H = self.lip_size
        ctx_f = self._lip_ctx[0].shape[0]
        lips, new_ctx = [], []
        for s in range(2):
            chunk = self._lip_buf[s][: valid_f]
            self._lip_buf[s] = self._lip_buf[s][valid_f:]
            if chunk.shape[0] < valid_f:           # flush past audio tail
                chunk = np.concatenate(
                    [chunk, np.zeros((valid_f - chunk.shape[0], 1, H, H),
                                     np.float32)])
            win = np.zeros((1, self._win_f, 1, H, H), np.float32)
            win[0, :ctx_f] = self._lip_ctx[s]
            win[0, ctx_f : ctx_f + valid_f] = chunk
            lips.append(win)
            tail = np.concatenate([self._lip_ctx[s], chunk])
            new_ctx.append(tail[-self.context_frames:]
                           if self.context_frames else tail[:0])

        valid_s = valid_f * self._spf
        a_chunk = self._audio_buf[: valid_s]
        self._audio_buf = self._audio_buf[valid_s:]
        if a_chunk.shape[0] < valid_s:
            a_chunk = np.pad(a_chunk, (0, valid_s - a_chunk.shape[0]))
        ctx_s = self._audio_ctx.shape[0]
        audio = np.zeros((1, self._win_s), np.float32)
        audio[0, :ctx_s] = self._audio_ctx
        audio[0, ctx_s : ctx_s + valid_s] = a_chunk
        a_tail = np.concatenate([self._audio_ctx, a_chunk])
        ctx_samples = self.context_frames * self._spf
        self._audio_ctx = (a_tail[-ctx_samples:] if ctx_samples
                           else a_tail[:0])

        n_valid_s = ctx_s + valid_s
        if self.mask_fn is not None:
            m1, m2 = self.mask_fn(n_valid_s)
            m1 = np.pad(np.asarray(m1, np.int32)[:self._win_s],
                        (0, max(0, self._win_s - n_valid_s)),
                        constant_values=3)[None]
            m2 = np.pad(np.asarray(m2, np.int32)[:self._win_s],
                        (0, max(0, self._win_s - n_valid_s)),
                        constant_values=3)[None]
        else:
            base = np.full((1, self._win_s), 3, np.int32)
            base[0, :n_valid_s] = 2
            m1 = m2 = base
        lens = np.full((1,), ctx_f + valid_f, np.int32)

        lp1, lp2 = self._forward(self.variables, lips[0], lips[1], audio,
                                 m1, m2, lens, lens)
        self._lip_ctx = new_ctx

        start, end = ctx_f, ctx_f + valid_f
        blank = self.config.model.decoder.blank_id
        out: list[list[int]] = []
        for s, lp in enumerate((lp1, lp2)):
            if self._beams is not None:
                out.append(self._beams[s].advance(lp[0], start, end))
                continue
            raw = np.asarray(jnp.argmax(lp[0], axis=-1))
            toks, prev = [], self._prev_raw[s]
            for tok in raw[start:end]:
                tok = int(tok)
                if tok != prev and tok != blank:
                    toks.append(tok)
                prev = tok
            self._prev_raw[s] = prev
            out.append(toks)
        return out[0], out[1]

    def _emit(self, emitted: list[list[int]]) -> tuple[str, str]:
        texts = []
        for s in range(2):
            self._ids[s].extend(emitted[s])
            texts.append(self.tokenizer.decode(emitted[s])
                         if emitted[s] else "")
        return texts[0], texts[1]


@dataclasses.dataclass
class StreamingPool:
    """N concurrent live streams sharing ONE static device batch.

    ``StreamingAudioTranscriber`` serves one stream per ``[1, window]``
    compile; a transcription service with many simultaneous callers would
    pay N forwards for N streams.  This pool runs up to ``max_streams``
    independent streams through a single ``[max_streams, window]`` jitted
    forward — real-time feeds produce chunks at the same rate, so their
    decode ticks coincide and batch for free (TPU serving economics, same
    argument as ``serve.DynamicBatcher``).

    Per-stream semantics are EXACTLY the single-stream transcriber's greedy
    path (same window/context/mask construction, same cross-chunk collapse
    carry — verified equal in tests/test_streaming_pool.py); streams only
    share the forward, never state.  Emission is greedy: the per-stream
    carried-beam decode stays a single-stream feature (its state advance is
    sequential per stream; batching it would serialize the pool).

        pool = StreamingPool(cfg, tok, variables, max_streams=8)
        a, b = pool.open(), pool.open()
        pool.feed(a, mic_a_block); pool.feed(b, mic_b_block)
        ...
        print(pool.flush(a))        # stream a ends; slot is reusable
    """

    config: Config
    tokenizer: Any
    variables: Any
    max_streams: int = 8
    chunk_seconds: float = 2.0
    context_seconds: float = 8.0
    dtype: Any = None
    quantize: bool = False              # int8 weight-only (ops/quantize.py)
    quantize_min_size: int = 4096

    def __post_init__(self):
        fe = self.config.model.frontend
        acfg = self.config.model.audio
        sr = fe.sample_rate
        self._spf = fe.hop_length * acfg.subsample_factor
        self._chunk = _snap(int(self.chunk_seconds * sr), self._spf)
        self._ctx = _snap(int(self.context_seconds * sr), self._spf)
        self._window = self._ctx + self._chunk

        dtype = self.dtype or jnp.bfloat16
        model = AudioOnlyCTC(self.config.model, dtype=dtype)
        if self.quantize:
            from .ops.quantize import (
                dequantize_variables, quantize_variables,
            )

            if self.variables is not None:
                self.variables = quantize_variables(self.variables,
                                                    self.quantize_min_size)

            def forward_ids(variables, windows, masks):
                v = dequantize_variables(*variables, dtype)
                log_probs, _ = model.apply(v, windows, masks)
                return jnp.argmax(log_probs, axis=-1)
        else:
            def forward_ids(variables, windows, masks):
                log_probs, _ = model.apply(variables, windows, masks)
                return jnp.argmax(log_probs, axis=-1)

        # argmax on device: the pool reads back [B, frames] int32, not
        # [B, frames, V] log-probs.
        self._forward_ids = jax.jit(forward_ids)
        B = self.max_streams
        self._active = [False] * B
        self._buffer = [None] * B
        self._context = [None] * B
        self._prev_raw = [0] * B
        self._pending: list[list[int]] = [[] for _ in range(B)]
        self._texts: list[list[int]] = [[] for _ in range(B)]

    @property
    def window_samples(self) -> int:
        return self._window

    @property
    def chunk_samples(self) -> int:
        return self._chunk

    def quantize_weights(self) -> None:
        """int8-convert ``variables`` after a post-construction restore
        (mirrors ``StreamingAudioTranscriber.quantize_weights``)."""
        from .ops.quantize import quantize_variables

        self.variables = quantize_variables(self.variables,
                                            self.quantize_min_size)

    # -- stream lifecycle ------------------------------------------------------

    def open(self) -> int:
        """Claim a free slot; returns the stream id."""
        for sid in range(self.max_streams):
            if not self._active[sid]:
                self._active[sid] = True
                self._buffer[sid] = np.zeros((0,), np.float32)
                self._context[sid] = np.zeros((0,), np.float32)
                self._prev_raw[sid] = self.config.model.decoder.blank_id
                self._pending[sid] = []
                self._texts[sid] = []
                return sid
        raise RuntimeError(f"all {self.max_streams} stream slots busy")

    def close(self, sid: int) -> None:
        self._active[sid] = False

    @property
    def active_streams(self) -> int:
        return sum(self._active)

    # -- feeding ---------------------------------------------------------------

    def feed(self, sid: int, samples) -> str:
        """Append audio to stream ``sid``; batch-decode every stream that has
        a complete chunk ready; return ``sid``'s newly emitted text."""
        if not self._active[sid]:
            raise ValueError(f"stream {sid} is not open")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buffer[sid] = np.concatenate([self._buffer[sid], samples])
        while self._buffer[sid].shape[0] >= self._chunk:
            self._step()
        return self._drain(sid)

    def flush(self, sid: int) -> str:
        """Decode ``sid``'s buffered tail, return all remaining text, free
        the slot."""
        while self._active[sid] and self._buffer[sid].shape[0] >= self._chunk:
            self._step()
        n = self._buffer[sid].shape[0]
        if n:
            self._step(flush_sid=sid)
        text = self._drain(sid)
        self.close(sid)
        return text

    def text(self, sid: int) -> str:
        """Everything emitted on ``sid`` since ``open``."""
        return self.tokenizer.decode(self._texts[sid])

    # -- internals -------------------------------------------------------------

    def _drain(self, sid: int) -> str:
        out, self._pending[sid] = self._pending[sid], []
        return self.tokenizer.decode(out) if out else ""

    def _step(self, flush_sid: int | None = None) -> None:
        """One batched decode tick: every active stream with a full chunk
        (plus ``flush_sid``'s partial tail) advances one chunk together."""
        B, W = self.max_streams, self._window
        windows = np.zeros((B, W), np.float32)
        masks = np.zeros((B, W), bool)
        ready: list[tuple[int, int]] = []            # (sid, valid_samples)
        for sid in range(B):
            if not self._active[sid]:
                continue
            buffered = self._buffer[sid].shape[0]
            if buffered >= self._chunk:
                valid = self._chunk
            elif sid == flush_sid and buffered:
                valid = buffered
            else:
                continue
            chunk = np.pad(self._buffer[sid][:valid],
                           (0, self._chunk - valid))
            self._buffer[sid] = self._buffer[sid][valid:]
            ctx = self._context[sid]
            pad = self._ctx - ctx.shape[0]
            windows[sid] = np.concatenate(
                [np.zeros((pad,), np.float32), ctx, chunk])
            masks[sid, pad : self._ctx + valid] = True
            tail = np.concatenate([ctx, chunk[:valid]])
            self._context[sid] = (tail[-self._ctx:] if self._ctx
                                  else tail[:0])
            ready.append((sid, valid))
        if not ready:
            return

        raw = np.asarray(self._forward_ids(self.variables, windows,
                                           jnp.asarray(masks)))
        blank = self.config.model.decoder.blank_id
        start = self._ctx // self._spf
        for sid, valid in ready:
            end = (self._ctx + valid + self._spf - 1) // self._spf
            prev = self._prev_raw[sid]
            for tok in raw[sid, start:end]:
                tok = int(tok)
                if tok != prev and tok != blank:
                    self._pending[sid].append(tok)
                    self._texts[sid].append(tok)
                prev = tok
            self._prev_raw[sid] = prev
