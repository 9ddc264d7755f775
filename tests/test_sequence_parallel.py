"""Sequence-parallel attention (gather-KV and ring/ppermute variants) must be
exact vs unsharded attention, on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_av_model_tpu.parallel import make_mesh
from multimodal_av_model_tpu.parallel.sequence import (
    gather_kv_attention,
    reference_attention,
    ring_attention,
)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    T, H, D = 64, 4, 16   # T divisible by the 8-device mesh
    q = jnp.asarray(rng.standard_normal((T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((T, H, D)).astype(np.float32))
    return q, k, v


def test_gather_kv_matches_reference(qkv):
    q, k, v = qkv
    mesh = make_mesh(n_devices=8)
    out = gather_kv_attention(q, k, v, mesh)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ring_attention_matches_reference(qkv):
    q, k, v = qkv
    mesh = make_mesh(n_devices=8)
    out = ring_attention(q, k, v, mesh)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ring_attention_bf16_inputs(qkv):
    q, k, v = (x.astype(jnp.bfloat16) for x in qkv)
    mesh = make_mesh(n_devices=8)
    out = ring_attention(q, k, v, mesh)
    ref = reference_attention(
        *(x.astype(jnp.float32) for x in qkv)
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )
