"""Long-form context parallelism: the Conformer with time sharded over the mesh.

The reference never sees utterances past ~15 s (SURVEY.md §5), but a
production deployment transcribing whole recordings needs sequences that
exceed one chip's memory.  This module plugs the exact sequence-parallel
attention kernels (parallel/sequence.py: ring / gather-KV, ICI collectives,
online softmax) into the standard ``AudioEncoder`` via its pluggable
attention slot — with the SAME parameter layout as flax MHA, so weights
trained with full attention serve long-form unchanged.

Position-wise work (LayerNorm, FFN, pointwise convs) shards over time for
free under GSPMD; the depthwise conv's halos are inserted by XLA's SPMD
partitioner; only attention needs the explicit collective strategy.

CAVEAT: the CP attention computes FULL (unmasked) attention — it is meant
for one long, pad-free stream per row.  Padded/bucketed batches should use
the standard encoder.
"""

from __future__ import annotations

import functools
from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from ..models.audio import AudioEncoder
from .sequence import gather_kv_attention_batched, ring_attention_batched


class CPSelfAttention(nn.Module):
    """Drop-in self-attention with time sharded over ``seq_axis``.

    Parameter layout matches ``nn.MultiHeadDotProductAttention`` exactly
    (query/key/value DenseGeneral → [d, H, hd]; out → [H, hd, d]), so the
    flagship's trained attention weights load directly."""

    num_heads: int
    mesh: Mesh
    seq_axis: str = "data"
    impl: str = "ring"                # "ring" (constant K/V memory) | "gather"
    dtype: Any = jnp.float32
    dropout_rate: float = 0.0         # ctor-compat with MHA; inference-only path
    deterministic: bool = True

    @nn.compact
    def __call__(self, inputs_q, inputs_kv, mask=None):
        del mask  # full attention over the stream (see module CAVEAT)
        d = inputs_q.shape[-1]
        if d % self.num_heads:
            raise ValueError(f"d_model {d} not divisible by {self.num_heads} heads")
        head_dim = d // self.num_heads
        proj = functools.partial(
            nn.DenseGeneral, features=(self.num_heads, head_dim), dtype=self.dtype
        )
        q = proj(name="query")(inputs_q)
        k = proj(name="key")(inputs_kv)
        v = proj(name="value")(inputs_kv)
        attend = (ring_attention_batched if self.impl == "ring"
                  else gather_kv_attention_batched)
        out = attend(q, k, v, self.mesh, self.seq_axis)
        return nn.DenseGeneral(features=d, axis=(-2, -1), dtype=self.dtype,
                               name="out")(out)


def make_cp_audio_encoder(
    model_cfg,
    mesh: Mesh,
    seq_axis: str = "data",
    impl: str = "ring",
    dtype: Any = jnp.float32,
) -> AudioEncoder:
    """The standard AudioEncoder with CP attention — applies the SAME params
    as the full-attention encoder (``variables['params']['audio_encoder']``
    from the flagship, or a --family=ssl checkpoint)."""
    attn = functools.partial(CPSelfAttention, mesh=mesh, seq_axis=seq_axis,
                             impl=impl)
    return AudioEncoder(model_cfg.audio, model_cfg.frontend, dtype,
                        attention_module=attn)
