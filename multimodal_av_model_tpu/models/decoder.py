"""CTC decoder head: linear projection to vocab + log-softmax.

Surface of reference model/decoder.py:6-35 (Linear 1024→vocab, log_softmax;
loss vs. log-prob output switched by whether targets are given).  The loss
itself lives in ops/ctc.py; the head always computes log-probs in f32 so CTC
and decoding are numerically safe even when the trunk runs bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import DecoderConfig
from .layers import Dtype


class CTCDecoder(nn.Module):
    config: DecoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """``[B, T, D] → [B, T, V]`` log-probabilities (f32)."""
        logits = nn.Dense(self.config.vocab_size, dtype=self.dtype, name="head")(x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
