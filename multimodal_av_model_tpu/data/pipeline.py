"""Host data pipeline: pair loading, bucketed batching, background prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` worker processes
(reference main.py:88-90) with a thread-prefetched, length-bucketed pipeline:
samples are produced on the host, grouped per bucket into fixed static
shapes (``collate.BucketSpec``), and handed to the device ahead of the train
step so the TPU never stalls on Python (SURVEY.md §2c host-device row).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Sequence

import numpy as np

from .audio_io import WavCache
from .collate import BucketSpec, collate_pairs, pick_bucket
from .mixing import mix_pair


def _resize_bilinear_np(images: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """cv2 INTER_LINEAR-compatible resize over the trailing two axes (host
    NumPy mirror of ops/resize.py — same half-pixel-center formula)."""
    in_h, in_w = images.shape[-2], images.shape[-1]

    def weights(out_size, in_size):
        src = np.clip((np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5, 0, in_size - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, in_size - 1)
        return lo, hi, (src - lo).astype(np.float32)

    ylo, yhi, yf = weights(out_h, in_h)
    xlo, xhi, xf = weights(out_w, in_w)
    rows = images[..., ylo, :] + (images[..., yhi, :] - images[..., ylo, :]) * yf[:, None]
    return rows[..., xlo] + (rows[..., xhi] - rows[..., xlo]) * xf


def preprocess_lip_clip_host(lip: np.ndarray, out_size: int = 96) -> np.ndarray:
    """``[T, H, W, C] uint8`` → ``[T, 1, out, out] float32`` (grayscale mean,
    resize, /255) — host mirror of reference dataset/multi_speaker_dataset.py:49-59.
    Uses the native resize kernel (runtime/hostops.cpp) when available."""
    lip = np.asarray(lip, np.float32)
    if lip.ndim == 4:
        lip = lip.mean(axis=-1)
    try:
        from ..runtime import native

        if native.have_native():
            resized = native.resize_bilinear(lip, out_size, out_size)
        else:
            resized = _resize_bilinear_np(lip, out_size, out_size)
    except ImportError:
        resized = _resize_bilinear_np(lip, out_size, out_size)
    return (resized / 255.0).astype(np.float32)[:, None, :, :]


class FilePairSource:
    """Builds per-pair sample dicts from manifest entries — the host
    equivalent of reference ``MultiSpeakerDataset.load_pair``
    (dataset/multi_speaker_dataset.py:13-84), with source-wav caching so the
    5-minute files are decoded once, not per sample."""

    def __init__(self, tokenizer, sample_rate: int = 16000, lip_size: int = 96):
        self.tokenizer = tokenizer
        self.lip_size = lip_size
        self._wavs = WavCache(target_sr=sample_rate)

    def _label(self, entry) -> np.ndarray:
        text = getattr(entry, "sentence_text", "") or ""
        if not text:
            with open(entry["text_path"], "r", encoding="utf-8") as f:
                text = f.read().strip()
        return np.asarray(self.tokenizer.encode(text), dtype=np.int64)

    def load_pair(self, s1, s2) -> dict:
        a1 = self._wavs.load_segment(s1["audio_path"], s1["start_time"], s1["end_time"])
        a2 = self._wavs.load_segment(s2["audio_path"], s2["start_time"], s2["end_time"])
        mixed, mask1, mask2 = mix_pair(a1, a2)

        lip1 = preprocess_lip_clip_host(np.load(s1["lip_path"]), self.lip_size)
        lip2 = preprocess_lip_clip_host(np.load(s2["lip_path"]), self.lip_size)
        if lip1.shape[0] == 0 or lip2.shape[0] == 0:
            raise RuntimeError("empty lip clip")

        return {
            "audio": mixed,
            "mask1": mask1,
            "mask2": mask2,
            "lip1": lip1,
            "label1": self._label(s1),
            "lip1_len": lip1.shape[0],
            "lip2": lip2,
            "label2": self._label(s2),
            "lip2_len": lip2.shape[0],
        }

    def load_pair_raw(self, s1, s2) -> dict:
        """Raw variant for the on-device preprocessing path: per-speaker
        waveforms and unprocessed lip frames; mixing/masking/gray/resize all
        happen on device (data/device_pipeline.py).  Host work = decode only."""
        a1 = self._wavs.load_segment(s1["audio_path"], s1["start_time"], s1["end_time"])
        a2 = self._wavs.load_segment(s2["audio_path"], s2["start_time"], s2["end_time"])

        def raw_lips(path):
            lips = np.load(path)
            if lips.ndim == 3:                    # grayscale [T, H, W]
                lips = lips[..., None]
            if lips.shape[0] == 0:
                raise RuntimeError("empty lip clip")
            return lips

        lip1, lip2 = raw_lips(s1["lip_path"]), raw_lips(s2["lip_path"])
        return {
            "audio1": a1,
            "audio2": a2,
            "lip1_raw": lip1,
            "label1": self._label(s1),
            "lip1_len": lip1.shape[0],
            "lip2_raw": lip2,
            "label2": self._label(s2),
            "lip2_len": lip2.shape[0],
        }


class SyntheticPairSource:
    """Deterministic synthetic pairs with realistic shapes — used by tests,
    benchmarks, and overfit-one-batch integration runs (the bundled corpus
    ships metadata only; media is not in the repo — SURVEY.md §6)."""

    def __init__(
        self,
        tokenizer,
        seed: int = 0,
        video_frames: tuple[int, int] = (24, 64),
        fps: int = 30,
        sample_rate: int = 16000,
        lip_size: int = 96,
        label_len: tuple[int, int] = (5, 25),
    ):
        self.tokenizer = tokenizer
        self.rng = np.random.default_rng(seed)
        self.video_frames = video_frames
        self.fps = fps
        self.sample_rate = sample_rate
        self.lip_size = lip_size
        self.label_len = label_len

    def _one_utterance(self):
        T = int(self.rng.integers(*self.video_frames))
        n_samples = int(T / self.fps * self.sample_rate)
        audio = self.rng.standard_normal(n_samples).astype(np.float32) * 0.1
        lip = self.rng.uniform(0, 1, size=(T, 1, self.lip_size, self.lip_size)).astype(np.float32)
        L = int(self.rng.integers(*self.label_len))
        # Valid non-special token ids (past the 5 specials of tokenizer800).
        label = self.rng.integers(5, self.tokenizer.vocab_size, size=L).astype(np.int64)
        return audio, lip, label

    def load_pair(self, *_args) -> dict:
        a1, lip1, label1 = self._one_utterance()
        a2, lip2, label2 = self._one_utterance()
        mixed, mask1, mask2 = mix_pair(a1, a2)
        return {
            "audio": mixed,
            "mask1": mask1,
            "mask2": mask2,
            "lip1": lip1,
            "label1": label1,
            "lip1_len": lip1.shape[0],
            "lip2": lip2,
            "label2": label2,
            "lip2_len": lip2.shape[0],
        }


def bucketed_batches(
    sample_iter: Iterable[dict],
    specs: Sequence[BucketSpec],
    batch_size: int,
    drop_last: bool = False,
    collate_fn: Callable = collate_pairs,
) -> Iterator[dict]:
    """Group samples by bucket and emit fixed-shape batches.

    Each sample joins the smallest bucket that fits its video/audio length;
    a batch is emitted when its bucket fills.  Leftovers flush at the end
    (padded to full batch by repeating the last sample, keeping shapes static)
    unless ``drop_last``.  ``collate_fn`` selects the layout (processed
    ``collate_pairs`` or raw ``collate_pairs_raw``).
    """

    def lengths(sample):
        if "audio" in sample:
            return sample["lip1_len"], len(sample["audio"])
        return sample["lip1_len"], max(len(sample["audio1"]), len(sample["audio2"]))

    pending: dict[BucketSpec, list[dict]] = {s: [] for s in specs}
    for sample in sample_iter:
        spec = pick_bucket(specs, *lengths(sample))
        pending[spec].append(sample)
        if len(pending[spec]) == batch_size:
            yield collate_fn(pending[spec], spec)
            pending[spec] = []
    if not drop_last:
        for spec, samples in pending.items():
            if samples:
                n_real = len(samples)
                while len(samples) < batch_size:
                    samples.append(samples[-1])
                batch = collate_fn(samples, spec)
                batch["num_real"] = np.int32(n_real)
                # Padding rows carry zero loss weight (train + eval) so the
                # duplicated sample is not over-weighted.
                batch["valid"][n_real:] = 0.0
                yield batch


class PrefetchingLoader:
    """Runs a batch-iterator factory on a background thread with a bounded
    queue, optionally placing batches on device while the previous step
    computes (double buffering)."""

    _DONE = object()

    def __init__(
        self,
        batch_factory: Callable[[], Iterable[dict]],
        depth: int = 2,
        device_put: bool = False,
    ):
        self.batch_factory = batch_factory
        self.depth = depth
        self.device_put = device_put

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        err: list[BaseException] = []

        def worker():
            try:
                for batch in self.batch_factory():
                    if self.device_put:
                        import jax

                        batch = jax.device_put(batch)
                    q.put(batch)
            except BaseException as e:  # surface worker errors on the consumer
                err.append(e)
            finally:
                q.put(self._DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._DONE:
                if err:
                    raise err[0]
                return
            yield item
