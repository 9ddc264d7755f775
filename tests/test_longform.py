"""Long-form context parallelism: the CP Conformer (time sharded over the
mesh, ring / gather-KV attention) must match the full-attention encoder
bit-for-tolerance with the SAME parameters (SURVEY.md §5 long-context row —
the designed-for extension point, now integrated)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_av_model_tpu.models.audio import AudioEncoder
from multimodal_av_model_tpu.parallel import make_mesh
from multimodal_av_model_tpu.parallel.longform import make_cp_audio_encoder
from multimodal_av_model_tpu.parallel.sequence import (
    reference_attention,
    ring_attention_batched,
)
from test_models import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = AudioEncoder(cfg.model.audio, cfg.model.frontend)
    B = 2
    # S chosen so T_enc = 12 divides the 4-way sequence axis.
    S = 3520
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), audio)["params"]
    last, middle, valid, _ = model.apply({"params": params}, audio)
    assert last.shape[1] % 4 == 0, "test shapes must divide the mesh"
    return cfg, params, audio, (np.asarray(last), np.asarray(middle))


def test_ring_attention_batched_matches_oracle():
    rng = np.random.default_rng(1)
    B, T, H, D = 2, 16, 2, 8
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
               for _ in range(3))
    mesh = make_mesh(n_devices=4)
    out = ring_attention_batched(q, k, v, mesh, seq_axis="data")
    ref = np.stack([np.asarray(reference_attention(q[b], k[b], v[b]))
                    for b in range(B)])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("impl", ["ring", "gather"])
def test_cp_encoder_matches_full_attention(setup, impl):
    cfg, params, audio, (ref_last, ref_middle) = setup
    mesh = make_mesh(n_devices=4)
    cp_enc = make_cp_audio_encoder(cfg.model, mesh, seq_axis="data", impl=impl)
    # SAME params: the CP attention keeps MHA's projection layout.
    last, middle, _, _ = cp_enc.apply({"params": params}, audio)
    np.testing.assert_allclose(np.asarray(last), ref_last, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(middle), ref_middle, atol=2e-4, rtol=1e-4)
