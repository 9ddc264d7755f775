"""Shared flax building blocks: PReLU, norms, recurrent cells, positional encodings.

Design rules (TPU-first):
* channels-last layouts everywhere (XLA's native conv layout on TPU);
* activations in a configurable ``dtype`` (bf16 by default), params f32;
* recurrences via ``nn.scan`` over time — serial, but T ≤ ~450 here; a masked
  transformer alternative is provided where the reference used an RNN.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class PReLU(nn.Module):
    """Per-channel PReLU (torch ``nn.PReLU(num_parameters=C)`` semantics,
    init 0.25) — the activation used throughout the reference's visual trunk
    (reference model/encoder.py:11,64)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda *_: jnp.full((x.shape[-1],), 0.25, jnp.float32), ()
        )
        alpha = alpha.astype(self.dtype)
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def make_norm(kind: str, dtype: Dtype, use_running_average: bool | None = None):
    """Feature-axis norm factory: 'batch' (reference parity) or 'group'
    (stateless; preferable at tiny per-device batch)."""
    if kind == "batch":
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
        )
    if kind == "group":
        # Group size adapts at call time via a thin wrapper so tiny test
        # configs (8-channel stages) still norm correctly.
        class _AdaptiveGroupNorm(nn.Module):
            dtype_: Dtype

            @nn.compact
            def __call__(self, x):
                c = x.shape[-1]
                gs = 16 if c % 16 == 0 else (8 if c % 8 == 0 else (4 if c % 4 == 0 else 1))
                return nn.GroupNorm(num_groups=None, group_size=gs, dtype=self.dtype_)(x)

        return _AdaptiveGroupNorm(dtype_=dtype)
    raise ValueError(f"unknown norm kind {kind!r}")


def sinusoidal_positions(max_len: int, dim: int) -> jnp.ndarray:
    """Standard sinusoidal position table ``[max_len, dim]`` (f32)."""
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-jnp.log(10000.0) / dim)
    )
    pe = jnp.zeros((max_len, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


class LSTMLayer(nn.Module):
    """Unidirectional LSTM over time via ``nn.scan`` (optionally reversed).

    Padding frames are handled by masking: carry state freezes past each
    sample's length so reversed passes see the same effective sequence the
    reference's (pad-aware-by-luck) ``nn.LSTM`` sees on right-padded input.
    """

    hidden_size: int
    reverse: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths=None):
        B, T, _ = x.shape
        cell = nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype)
        carry = cell.initialize_carry(jax.random.PRNGKey(0), (B, self.hidden_size))

        if lengths is None:
            valid = jnp.ones((B, T), bool)
        else:
            valid = jnp.arange(T)[None, :] < lengths[:, None]

        xs = jnp.moveaxis(x, 1, 0)                 # [T, B, D]
        vs = jnp.moveaxis(valid, 1, 0)             # [T, B]
        if self.reverse:
            xs, vs = xs[::-1], vs[::-1]

        scan = nn.scan(
            lambda cell, carry, inp: self._step(cell, carry, inp),
            variable_broadcast="params",
            split_rngs={"params": False},
        )
        _, ys = scan(cell, carry, (xs, vs))
        if self.reverse:
            ys = ys[::-1]
        return jnp.moveaxis(ys, 0, 1)              # [B, T, H]

    @staticmethod
    def _step(cell, carry, inp):
        x_t, v_t = inp
        new_carry, y = cell(carry, x_t)
        keep = v_t[:, None]
        carry = jax.tree.map(lambda n, o: jnp.where(keep, n, o), new_carry, carry)
        y = jnp.where(keep, y, 0.0)
        return carry, y


class _BiLSTMStep(nn.Module):
    """One time step of a bidirectional LSTM layer: the forward cell (reading
    ``t``) and backward cell (reading ``T-1-t``) advance in the SAME scan —
    they are independent recurrences, so fusing them halves the number of
    serial scan steps vs two separate scans (LSTM serialization is a
    measurable slice of the train step on TPU)."""

    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, inp):
        fc, bc = carry
        xf, vf, xb, vb = inp
        new_fc, yf = nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype,
                                          name="fwd")(fc, xf)
        new_bc, yb = nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype,
                                          name="bwd")(bc, xb)
        keep_f = vf[:, None]
        keep_b = vb[:, None]
        fc = jax.tree.map(lambda n, o: jnp.where(keep_f, n, o), new_fc, fc)
        bc = jax.tree.map(lambda n, o: jnp.where(keep_b, n, o), new_bc, bc)
        return (fc, bc), (jnp.where(keep_f, yf, 0.0), jnp.where(keep_b, yb, 0.0))


class BiLSTM(nn.Module):
    """Stacked bidirectional LSTM: ``[B, T, D] → [B, T, 2·hidden]``.

    Capability-equivalent of the reference fusion temporal model
    (reference model/fusion_module.py:21-27: 2-layer bidirectional
    ``nn.LSTM(fused_dim → fused_dim)``).  Each layer runs both directions in
    one ``nn.scan`` (see ``_BiLSTMStep``)."""

    hidden_size: int
    num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths=None):
        B, T, _ = x.shape
        if lengths is None:
            valid = jnp.ones((B, T), bool)
        else:
            valid = jnp.arange(T)[None, :] < lengths[:, None]
        vs = jnp.moveaxis(valid, 1, 0)                  # [T, B]

        cell = nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype)
        for i in range(self.num_layers):
            xs = jnp.moveaxis(x, 1, 0)                  # [T, B, D]
            carry0 = (
                cell.initialize_carry(jax.random.PRNGKey(0), (B, self.hidden_size)),
                cell.initialize_carry(jax.random.PRNGKey(0), (B, self.hidden_size)),
            )
            scanned = nn.scan(
                _BiLSTMStep,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )(self.hidden_size, self.dtype, name=f"layer{i}")
            _, (yf, yb) = scanned(carry0, (xs, vs, xs[::-1], vs[::-1]))
            x = jnp.concatenate([yf, yb[::-1]], axis=-1)  # [T, B, 2H]
            x = jnp.moveaxis(x, 0, 1)
        return x


class GRULayer(nn.Module):
    """Unidirectional GRU via ``nn.scan`` (legacy-v0 models use BiGRUs,
    reference 이전 버전/multimodal_ctc_korean.py:20,32)."""

    hidden_size: int
    reverse: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths=None):
        B, T, _ = x.shape
        cell = nn.GRUCell(self.hidden_size, dtype=self.dtype)
        carry = cell.initialize_carry(jax.random.PRNGKey(0), (B, self.hidden_size))
        if lengths is None:
            valid = jnp.ones((B, T), bool)
        else:
            valid = jnp.arange(T)[None, :] < lengths[:, None]
        xs = jnp.moveaxis(x, 1, 0)
        vs = jnp.moveaxis(valid, 1, 0)
        if self.reverse:
            xs, vs = xs[::-1], vs[::-1]

        def step(cell, carry, inp):
            x_t, v_t = inp
            new_carry, y = cell(carry, x_t)
            keep = v_t[:, None]
            carry = jax.tree.map(lambda n, o: jnp.where(keep, n, o), new_carry, carry)
            return carry, jnp.where(keep, y, 0.0)

        scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False})
        _, ys = scan(cell, carry, (xs, vs))
        if self.reverse:
            ys = ys[::-1]
        return jnp.moveaxis(ys, 0, 1)


class BiGRU(nn.Module):
    hidden_size: int
    num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths=None):
        for i in range(self.num_layers):
            fwd = GRULayer(self.hidden_size, dtype=self.dtype, name=f"fwd{i}")(x, lengths)
            bwd = GRULayer(self.hidden_size, reverse=True, dtype=self.dtype, name=f"bwd{i}")(
                x, lengths
            )
            x = jnp.concatenate([fwd, bwd], axis=-1)
        return x


class TransformerTemporalBlock(nn.Module):
    """Masked self-attention temporal model — the parallel-friendly alternative
    to the fusion BiLSTM (selected by ``FusionConfig.temporal_model``;
    equivalence argument in SURVEY.md §7 step 7)."""

    d_model: int
    num_layers: int = 2
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths=None, deterministic: bool = True):
        B, T, _ = x.shape
        if lengths is None:
            attn_mask = None
        else:
            valid = jnp.arange(T)[None, :] < lengths[:, None]          # [B, T]
            attn_mask = valid[:, None, None, :] & valid[:, None, :, None]
        pe = sinusoidal_positions(T, x.shape[-1]).astype(self.dtype)
        x = x + pe[None]
        for _ in range(self.num_layers):
            h = nn.LayerNorm(dtype=self.dtype)(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype, deterministic=deterministic,
                dropout_rate=self.dropout,
            )(h, h, mask=attn_mask)
            x = x + h
            h = nn.LayerNorm(dtype=self.dtype)(x)
            h = nn.Dense(self.ffn_dim, dtype=self.dtype)(h)
            h = nn.gelu(h)
            h = nn.Dense(x.shape[-1], dtype=self.dtype)(h)
            x = x + h
        return nn.LayerNorm(dtype=self.dtype)(x)


def length_mask(lengths: jnp.ndarray, T: int) -> jnp.ndarray:
    """``[B] → [B, T]`` boolean validity mask."""
    return jnp.arange(T)[None, :] < lengths[:, None]
