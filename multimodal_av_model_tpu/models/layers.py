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


def make_act(kind: str, dtype: Dtype):
    """Trunk activation factory (the reference's relu_type option,
    model/encoder.py:7-11): 'prelu' (parity default) or 'relu' (no learnable
    alpha → no per-channel alpha-grad reduction pass; see DESIGN.md §2)."""
    if kind == "prelu":
        return PReLU(dtype=dtype)
    if kind == "relu":
        return nn.relu
    raise ValueError(f"unknown activation kind {kind!r}")


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


class _GateKernel(nn.Module):
    """One gate projection's parameters (flax ``DenseParams`` layout:
    ``kernel`` [+ ``bias``]) — declared, not applied; the layer consumes the
    concatenated kernels directly."""

    features: int
    use_bias: bool
    recurrent: bool

    @nn.compact
    def __call__(self, in_dim: int):
        init = (nn.initializers.orthogonal() if self.recurrent
                else nn.linear.default_kernel_init)
        k = self.param("kernel", init, (in_dim, self.features), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros_init(),
                        (self.features,), jnp.float32)
             if self.use_bias else None)
        return k, b


class _LSTMDirectionParams(nn.Module):
    """Parameters of one LSTM direction, byte-compatible with flax
    ``OptimizedLSTMCell`` (children ``ii..io``: input kernels, no bias;
    ``hi..ho``: recurrent kernels + biases; gate order i, f, g, o)."""

    hidden: int

    @nn.compact
    def __call__(self, in_dim: int):
        kis, khs, bhs = [], [], []
        for c in "ifgo":
            ki, _ = _GateKernel(self.hidden, False, False, name=f"i{c}")(in_dim)
            kh, bh = _GateKernel(self.hidden, True, True, name=f"h{c}")(self.hidden)
            kis.append(ki)
            khs.append(kh)
            bhs.append(bh)
        return (jnp.concatenate(kis, -1), jnp.concatenate(khs, -1),
                jnp.concatenate(bhs, -1))


def _lstm_gates(z, h, kh, bh, hidden: int):
    """One LSTM step given precomputed input projections ``z`` ([B, 4H],
    gate order i,f,g,o — flax ``OptimizedLSTMCell`` semantics)."""
    gates = z + (h @ kh + bh)
    i, f, g, o = (gates[:, k * hidden : (k + 1) * hidden] for k in range(4))
    return nn.sigmoid(i), nn.sigmoid(f), nn.tanh(g), nn.sigmoid(o)


class _FusedBiLSTMLayer(nn.Module):
    """One bidirectional LSTM layer with HOISTED input projections.

    Two step-level optimizations (LSTM serialization is a measurable slice
    of the train step on TPU — ~26 ms of a 400 ms batch-32 step):

    * both directions advance in the SAME scan (independent recurrences —
      halves the serial step count vs two scans);
    * the input projections ``x @ W_i`` for all t run as ONE big MXU matmul
      before the scan, so each serial step does a single [B,H]×[H,4H]
      matmul instead of two.  Bitwise-identical math: flax's cell computes
      ``(h@Wh + bh) + x@Wi`` per gate; hoisting only moves the x-term's
      evaluation time.

    Padding frames freeze the carry and zero the output (masking semantics
    of the pre-hoist implementation, verified in tests/test_bilstm.py).
    """

    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid):
        B, T, D = x.shape
        H = self.hidden_size
        ki_f, kh_f, bh_f = _LSTMDirectionParams(H, name="fwd")(D)
        ki_b, kh_b, bh_b = _LSTMDirectionParams(H, name="bwd")(D)
        dt = self.dtype
        x = x.astype(dt)
        ki_f, kh_f, bh_f = ki_f.astype(dt), kh_f.astype(dt), bh_f.astype(dt)
        ki_b, kh_b, bh_b = ki_b.astype(dt), kh_b.astype(dt), bh_b.astype(dt)

        zf = jnp.moveaxis(x @ ki_f, 1, 0)               # [T, B, 4H]
        zb = jnp.moveaxis(x @ ki_b, 1, 0)[::-1]
        vs = jnp.moveaxis(valid, 1, 0)                  # [T, B]

        zeros = jnp.zeros((B, H), dt)
        carry0 = ((zeros, zeros), (zeros, zeros))       # ((cf, hf), (cb, hb))

        def step(carry, inp):
            (cf, hf), (cb, hb) = carry
            zf_t, vf_t, zb_t, vb_t = inp
            i, f, g, o = _lstm_gates(zf_t, hf, kh_f, bh_f, H)
            ncf = f * cf + i * g
            nhf = o * nn.tanh(ncf)
            i, f, g, o = _lstm_gates(zb_t, hb, kh_b, bh_b, H)
            ncb = f * cb + i * g
            nhb = o * nn.tanh(ncb)
            kf = vf_t[:, None]
            kb = vb_t[:, None]
            cf, hf = jnp.where(kf, ncf, cf), jnp.where(kf, nhf, hf)
            cb, hb = jnp.where(kb, ncb, cb), jnp.where(kb, nhb, hb)
            return (((cf, hf), (cb, hb)),
                    (jnp.where(kf, nhf, 0.0), jnp.where(kb, nhb, 0.0)))

        _, (yf, yb) = jax.lax.scan(step, carry0, (zf, vs, zb, vs[::-1]))
        y = jnp.concatenate([yf, yb[::-1]], axis=-1)    # [T, B, 2H]
        return jnp.moveaxis(y, 0, 1)


class BiLSTM(nn.Module):
    """Stacked bidirectional LSTM: ``[B, T, D] → [B, T, 2·hidden]``.

    Capability-equivalent of the reference fusion temporal model
    (reference model/fusion_module.py:21-27: 2-layer bidirectional
    ``nn.LSTM(fused_dim → fused_dim)``).  Each layer runs both directions in
    one scan with hoisted input projections (``_FusedBiLSTMLayer``); the
    parameter tree matches flax ``OptimizedLSTMCell`` layouts, so existing
    checkpoints restore unchanged."""

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
        for i in range(self.num_layers):
            x = _FusedBiLSTMLayer(self.hidden_size, self.dtype,
                                  name=f"layer{i}")(x, valid)
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
