"""Legacy-v0 training path: twin-CTC multimodal model over log-mel + frames.

Capability parity with reference 이전 버전/train_ctc_korea.py:82-109: shared
lip encoder on both speakers + shared mel BiGRU encoder, concat fusion,
shared linear head, ``loss = CTC_A + CTC_B`` with blank 0 (the Korean
syllable vocab's blank, 이전 버전/utils/korean_vocab_utils.py:31), Adam 1e-4,
10 epochs.  Re-designed as one jitted step; the mel frontend is our
first-party log-mel (the reference used torchaudio's MelSpectrogram —
이전 버전/train_ctc_korea.py:38-40; note it fed *raw* mel power, we log-
compress, SURVEY.md §7 step 2).

Also provides the legacy on-disk dataset reader (``sample_*/`` directories
with ``frames_A/``, ``frames_B/``, ``mixed.wav``, ``gt_A.txt``, ``gt_B.txt``
— reference 이전 버전/train_ctc_korea.py:22-54).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import AudioFrontendConfig
from ..models.legacy import MultimodalCTCKoreanModel
from ..ops.ctc import ctc_loss
from ..ops.logmel import log_mel_spectrogram
from ..text.korean import KoreanSyllableVocab


def load_legacy_sample(sample_dir: str, vocab: KoreanSyllableVocab,
                       frontend: AudioFrontendConfig | None = None,
                       image_size: int = 96) -> dict:
    """One ``sample_*`` directory → arrays (legacy __getitem__ semantics)."""
    from ..data.audio_io import load_audio
    from ..data.pipeline import _resize_bilinear_np

    frontend = frontend or AudioFrontendConfig()

    def load_frames(folder):
        names = sorted(os.listdir(folder))
        frames = []
        for n in names:
            arr = np.load(os.path.join(folder, n)) if n.endswith(".npy") else None
            if arr is None:
                try:
                    import cv2

                    arr = cv2.imread(os.path.join(folder, n))[:, :, ::-1]
                except ImportError:
                    raise RuntimeError("non-npy frames need cv2")
            frames.append(np.asarray(arr, np.float32))
        clip = np.stack(frames)                       # [T, H, W, C]
        chw = np.moveaxis(clip, -1, 1)                # [T, C, H, W]
        resized = _resize_bilinear_np(chw, image_size, image_size)
        return np.moveaxis(resized, 1, -1) / 255.0    # [T, h, w, C]

    audio = load_audio(os.path.join(sample_dir, "mixed.wav"), frontend.sample_rate)
    mel = np.asarray(log_mel_spectrogram(
        audio, frontend.sample_rate, frontend.n_fft, frontend.hop_length,
        frontend.win_length, frontend.n_mels,
    ))
    with open(os.path.join(sample_dir, "gt_A.txt"), encoding="utf-8") as f:
        label_a = vocab.text_to_indices(f.read().strip())
    with open(os.path.join(sample_dir, "gt_B.txt"), encoding="utf-8") as f:
        label_b = vocab.text_to_indices(f.read().strip())
    return {
        "frames_A": load_frames(os.path.join(sample_dir, "frames_A")),
        "frames_B": load_frames(os.path.join(sample_dir, "frames_B")),
        "mel": mel,
        "label_A": np.asarray(label_a, np.int32),
        "label_B": np.asarray(label_b, np.int32),
    }


def scan_legacy_root(root_dir: str) -> list[str]:
    return sorted(
        os.path.join(root_dir, d)
        for d in os.listdir(root_dir)
        if d.startswith("sample_")
    )


@dataclasses.dataclass
class LegacyTrainer:
    """Jitted twin-CTC training for the legacy model."""

    vocab_size: int
    hidden_dim: int = 256
    learning_rate: float = 1e-4           # reference 이전 버전/train_ctc_korea.py:88
    blank_id: int = 0                     # korean_vocab_utils blank
    dtype: Any = jnp.float32

    def __post_init__(self):
        self.model = MultimodalCTCKoreanModel(self.vocab_size, self.hidden_dim, self.dtype)
        self.tx = optax.adam(self.learning_rate)
        self._step = None

    def init(self, rng: int, batch: dict):
        variables = jax.jit(self.model.init)(
            jax.random.PRNGKey(rng),
            jnp.asarray(batch["frames_A"]), jnp.asarray(batch["frames_B"]),
            jnp.asarray(batch["mel"]),
        )
        params = variables["params"]
        return params, self.tx.init(params)

    def loss_fn(self, params, batch):
        logits_a, logits_b = self.model.apply(
            {"params": params},
            batch["frames_A"], batch["frames_B"], batch["mel"],
        )
        log_a = jax.nn.log_softmax(logits_a.astype(jnp.float32), axis=-1)
        log_b = jax.nn.log_softmax(logits_b.astype(jnp.float32), axis=-1)
        loss_a = ctc_loss(log_a, batch["label_A"], batch["mel_lengths"],
                          batch["len_A"], self.blank_id)
        loss_b = ctc_loss(log_b, batch["label_B"], batch["mel_lengths"],
                          batch["len_B"], self.blank_id)
        return loss_a + loss_b            # reference :101

    @property
    def step(self):
        if self._step is None:
            def train_step(params, opt_state, batch):
                loss, grads = jax.value_and_grad(self.loss_fn)(params, batch)
                updates, opt_state = self.tx.update(grads, opt_state)
                return optax.apply_updates(params, updates), opt_state, loss

            self._step = jax.jit(train_step, donate_argnums=(0, 1))
        return self._step

    def fit(self, params, opt_state, batches: Iterable[dict], epochs: int = 10,
            log_fn=print):
        for epoch in range(1, epochs + 1):
            total, n = 0.0, 0
            for batch in batches:
                params, opt_state, loss = self.step(params, opt_state, batch)
                total += float(loss)
                n += 1
            log_fn(f"[Epoch {epoch}] Loss: {total:.4f}")
        return params, opt_state
