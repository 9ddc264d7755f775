"""Sequence-parallel (context-parallel) attention over the device mesh.

The reference never needs CP — utterances are ≤ ~15 s (SURVEY.md §5
long-context row) — but the survey marks this as the designed-for extension
point: if long-form audio/video ever exceeds one chip's memory, shard TIME
across the mesh and keep attention exact with ICI collectives.

Two exact full-attention strategies, both `shard_map`-based:

* ``gather_kv_attention`` — Q stays time-sharded; K/V are ``all_gather``-ed
  over the sequence axis, each device computes its Q-slice's rows.  One
  collective, minimal code; right when T·D (K/V) fits per device.
* ``ring_attention`` — K/V blocks rotate around the ring with
  ``jax.lax.ppermute`` while running max/sum-corrected softmax accumulation
  (flash-attention style online softmax across blocks); peak memory per
  device is one K/V block.  Right when even gathered K/V would not fit.

Both are numerically exact (verified against unsharded attention on the
virtual 8-device mesh in tests/test_sequence_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _attend(q, k, v, scale):
    logits = jnp.einsum("thd,shd->hts", q, k) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("hts,shd->thd", probs, v)


def gather_kv_attention(q, k, v, mesh: Mesh, seq_axis: str = "data"):
    """Exact attention with time sharded over ``seq_axis``.

    Args: ``q, k, v: [T, H, D]`` (already projected, single sample).
    """
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)

    def local(q_blk, k_blk, v_blk):
        k_full = jax.lax.all_gather(k_blk, seq_axis, axis=0, tiled=True)
        v_full = jax.lax.all_gather(v_blk, seq_axis, axis=0, tiled=True)
        return _attend(q_blk, k_full, v_full, scale)

    spec = P(seq_axis, None, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def ring_attention(q, k, v, mesh: Mesh, seq_axis: str = "data"):
    """Exact attention with K/V blocks rotating around the ring (ppermute) and
    online-softmax accumulation — constant per-device K/V memory."""
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    n = mesh.shape[seq_axis]

    def local(q_blk, k_blk, v_blk):
        T, H, D = q_blk.shape
        qf = q_blk.astype(jnp.float32)

        def step(carry, _):
            k_cur, v_cur, m, l, acc = carry
            logits = jnp.einsum("thd,shd->hts", qf, k_cur.astype(jnp.float32)) * scale
            blk_max = logits.max(axis=-1)                      # [H, T]
            new_m = jnp.maximum(m, blk_max)
            correction = jnp.exp(m - new_m)                    # [H, T]
            p = jnp.exp(logits - new_m[..., None])             # [H, T, S]
            l = l * correction + p.sum(axis=-1)
            acc = acc * correction.transpose(1, 0)[..., None] + jnp.einsum(
                "hts,shd->thd", p, v_cur.astype(jnp.float32)
            )
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_next = jax.lax.ppermute(k_cur, seq_axis, perm)
            v_next = jax.lax.ppermute(v_cur, seq_axis, perm)
            return (k_next, v_next, new_m, l, acc), None

        # Mark the accumulators device-varying so the scan carry type matches
        # after the ppermute makes K/V varying.
        def varying(x):
            if hasattr(jax.lax, "pcast"):
                return jax.lax.pcast(x, (seq_axis,), to="varying")
            return jax.lax.pvary(x, (seq_axis,))

        m0 = varying(jnp.full((H, T), -jnp.inf, jnp.float32))
        l0 = varying(jnp.zeros((H, T), jnp.float32))
        acc0 = varying(jnp.zeros((T, H, D), jnp.float32))
        (k_f, v_f, m, l, acc), _ = jax.lax.scan(
            step, (k_blk, v_blk, m0, l0, acc0), None, length=n
        )
        out = acc / l.transpose(1, 0)[..., None]
        return out.astype(q_blk.dtype)

    spec = P(seq_axis, None, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def reference_attention(q, k, v):
    """Unsharded oracle."""
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
    return _attend(q, k, v, scale)


# -- batched variants ([B, T, H, D]) — what model code consumes ---------------


def _attend_batched(q, k, v, scale):
    logits = jnp.einsum("bthd,bshd->bhts", q, k) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def gather_kv_attention_batched(q, k, v, mesh: Mesh, seq_axis: str = "data"):
    """Exact attention, time sharded over ``seq_axis``: ``[B, T, H, D]``."""
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)

    def local(q_blk, k_blk, v_blk):
        k_full = jax.lax.all_gather(k_blk, seq_axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_blk, seq_axis, axis=1, tiled=True)
        return _attend_batched(q_blk, k_full, v_full, scale)

    spec = P(None, seq_axis, None, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def ring_attention_batched(q, k, v, mesh: Mesh, seq_axis: str = "data"):
    """Exact ring attention over ``[B, T, H, D]`` — K/V blocks rotate with
    ``ppermute``, flash-style online-softmax accumulation, constant per-device
    K/V memory."""
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    n = mesh.shape[seq_axis]

    def local(q_blk, k_blk, v_blk):
        B, T, H, D = q_blk.shape
        qf = q_blk.astype(jnp.float32)

        def step(carry, _):
            k_cur, v_cur, m, l, acc = carry
            logits = jnp.einsum("bthd,bshd->bhts", qf,
                                k_cur.astype(jnp.float32)) * scale
            blk_max = logits.max(axis=-1)                      # [B, H, T]
            new_m = jnp.maximum(m, blk_max)
            correction = jnp.exp(m - new_m)                    # [B, H, T]
            p = jnp.exp(logits - new_m[..., None])             # [B, H, T, S]
            l = l * correction + p.sum(axis=-1)
            acc = acc * correction.transpose(0, 2, 1)[..., None] + jnp.einsum(
                "bhts,bshd->bthd", p, v_cur.astype(jnp.float32)
            )
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_next = jax.lax.ppermute(k_cur, seq_axis, perm)
            v_next = jax.lax.ppermute(v_cur, seq_axis, perm)
            return (k_next, v_next, new_m, l, acc), None

        def varying(x):
            if hasattr(jax.lax, "pcast"):
                return jax.lax.pcast(x, (seq_axis,), to="varying")
            return jax.lax.pvary(x, (seq_axis,))

        m0 = varying(jnp.full((B, H, T), -jnp.inf, jnp.float32))
        l0 = varying(jnp.zeros((B, H, T), jnp.float32))
        acc0 = varying(jnp.zeros((B, T, H, D), jnp.float32))
        (_, _, m, l, acc), _ = jax.lax.scan(
            step, (k_blk, v_blk, m0, l0, acc0), None, length=n
        )
        out = acc / l.transpose(0, 2, 1)[..., None]
        return out.astype(q_blk.dtype)

    spec = P(None, seq_axis, None, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)
