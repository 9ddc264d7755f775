"""Self-supervised audio-encoder pretraining (the wav2vec2 replacement).

The reference downloads ``kresnik/wav2vec2-large-xlsr-korean`` and freezes it
(reference model/encoder.py:81-87); this framework *trains* its encoder with
the same class of objective instead: masked-span InfoNCE over the mixture
waveforms (ops/ssl.py) — no labels, no lip video, pure audio SSL.  The
pretrained ``audio_encoder`` subtree grafts directly into the flagship
(train/checkpoints.py:graft_subtree) just like the reference grafts the HF
checkpoint.

Contrast with ``train.contrastive_only`` (BASELINE config 4): that is the
reference's *auxiliary* masked speaker-contrastive loss run alone; this is a
real SSL objective.  benchmarks/pretrain_ablation.py compares the two
against from-scratch training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..config import Config, ModelConfig
from ..models.audio import AudioEncoder
from ..ops.ssl import make_span_mask, masked_infonce_loss


class MaskedAudioPretrainModel(nn.Module):
    """AudioEncoder + prediction head for masked-latent InfoNCE.

    The encoder submodule is named ``audio_encoder`` so its params are
    checkpoint-compatible with the flagship's subtree (graft target)."""

    config: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio, sample_mask, mask_spans, train: bool = False):
        last, _, frame_valid, targets = AudioEncoder(
            self.config.audio, self.config.frontend, self.dtype,
            name="audio_encoder",
        )(audio, sample_mask, deterministic=not train, mask_spans=mask_spans)
        preds = nn.Dense(self.config.audio.d_model, dtype=jnp.float32,
                         name="ssl_head")(last.astype(jnp.float32))
        return preds, targets, frame_valid


def flagship_audio_params(ssl_params: dict) -> dict:
    """The pretrained ``audio_encoder`` subtree, ready to graft into the
    flagship: drops the SSL-only ``mask_embedding`` param (the flagship's
    encoder never masks inputs)."""
    audio = dict(ssl_params["audio_encoder"])
    audio.pop("mask_embedding", None)
    return audio


@dataclasses.dataclass
class MaskedAudioPretrainer:
    """Jitted SSL pretraining loop over mixture-audio batches."""

    config: Config
    mask_prob: float = 0.065
    span: int = 10
    temperature: float = 0.1
    dtype: Any = jnp.float32

    def __post_init__(self):
        self.model = MaskedAudioPretrainModel(self.config.model, self.dtype)
        self._tx = optax.adam(self.config.train.learning_rate)
        self._step = None

    def enc_frames(self, n_samples: int) -> int:
        return AudioEncoder.output_length(
            self.config.model.audio, self.config.model.frontend, n_samples)

    def init_state(self, rng: int, batch: dict) -> dict:
        audio = np.asarray(batch["audio"])
        spans = np.zeros((audio.shape[0], self.enc_frames(audio.shape[1])), bool)
        spans[:, :2] = True  # arbitrary non-empty mask for init tracing
        init_key, state_key = jax.random.split(jax.random.PRNGKey(rng))
        variables = jax.jit(self.model.init)(
            init_key, audio, np.asarray(batch["mask1"]) != 3, spans
        )
        params = variables["params"]
        # "key" (the jax dropout key) is part of the state so it checkpoints
        # and advances per step — every step sees a DIFFERENT dropout mask.
        return {"params": params, "opt_state": self._tx.init(params),
                "key": state_key}

    @property
    def train_step(self):
        if self._step is None:
            def step(params, opt_state, key, audio, sample_mask, spans):
                key, drop_key = jax.random.split(key)

                def loss_fn(p):
                    preds, targets, frame_valid = self.model.apply(
                        {"params": p}, audio, sample_mask, spans, train=True,
                        rngs={"dropout": drop_key},
                    )
                    return masked_infonce_loss(preds, targets, spans,
                                               frame_valid, self.temperature)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self._tx.update(grads, opt_state)
                return optax.apply_updates(params, updates), opt_state, key, loss

            self._step = jax.jit(step, donate_argnums=(0, 1, 2))
        return self._step

    def fit(self, state: dict, batches: Iterable[dict], log_every: int = 100,
            log_fn=print, span_rng: np.random.Generator | None = None,
            stop=None):
        """One pass over ``batches``.  ``span_rng`` draws the mask spans —
        pass a generator seeded per epoch so a resumed run replays the same
        span schedule it would have seen uninterrupted.  ``stop`` (a
        ``preempt.GracefulShutdown``) is polled per step so a SIGTERM breaks
        at a checkpointable boundary."""
        params, opt_state = state["params"], state["opt_state"]
        key = state["key"]
        if span_rng is None:
            span_rng = np.random.default_rng(0)
        loss = None
        for i, batch in enumerate(batches):
            if stop is not None and stop.requested:
                break
            audio = np.asarray(batch["audio"])
            sample_mask = np.asarray(batch["mask1"]) != 3
            spans = make_span_mask(
                audio.shape[0], self.enc_frames(audio.shape[1]),
                self.mask_prob, self.span, span_rng,
            )
            params, opt_state, key, loss = self.train_step(
                params, opt_state, key, audio, sample_mask, spans)
            if i % log_every == 0:
                log_fn(f"[ssl {i}] infonce={float(loss):.4f}")
        return {"params": params, "opt_state": opt_state, "key": key,
                "last_loss": float(loss) if loss is not None else None}
