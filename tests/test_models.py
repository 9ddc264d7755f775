"""Model shape/jit tests with small configs (every module must trace under
jax.jit at bucketed static shapes — SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_av_model_tpu.config import Config
from multimodal_av_model_tpu.models import (
    AudioOnlyCTC,
    MultimodalCTCKoreanModel,
    MultiSpeakerAVModel,
    VisualEncoder,
    VisualOnlyCTC,
)


def tiny_config() -> Config:
    cfg = Config()
    cfg.model.audio.d_model = 32
    cfg.model.audio.num_layers = 3
    cfg.model.audio.num_heads = 2
    cfg.model.audio.ffn_dim = 64
    cfg.model.audio.conv_kernel_size = 7
    cfg.model.audio.middle_layers = (1, 2)
    cfg.model.audio.output_dim = 48
    cfg.model.visual.frontend_channels = 8
    cfg.model.visual.resnet_layers = (1, 1, 1, 1)
    cfg.model.visual.resnet_channels = (8, 12, 16, 24)
    cfg.model.visual.output_dim = 24
    cfg.model.visual.norm = "group"
    cfg.model.fusion.fused_dim = 16
    cfg.model.fusion.num_heads = 2
    cfg.model.decoder.input_dim = 32
    cfg.model.decoder.vocab_size = 20
    cfg.model.contrastive.projection_dim = 8
    return cfg


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


def test_visual_encoder_preserves_time(cfg):
    B, T = 2, 6
    lips = jnp.zeros((B, T, 24, 24, 1))
    model = VisualEncoder(cfg.model.visual)
    params = model.init(jax.random.PRNGKey(0), lips)
    out = model.apply(params, lips)
    assert out.shape == (B, T, cfg.model.visual.output_dim)


def test_audio_only_ctc_shapes_and_jit(cfg):
    B, S = 2, 3200  # 0.2 s
    audio = jnp.zeros((B, S))
    model = AudioOnlyCTC(cfg.model)
    params = model.init(jax.random.PRNGKey(0), audio)
    lp, lengths = jax.jit(lambda p, a: model.apply(p, a))(params, audio)
    T_enc = lp.shape[1]
    assert lp.shape == (B, T_enc, cfg.model.decoder.vocab_size)
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-4)
    assert (np.asarray(lengths) == T_enc).all()


def test_audio_mask_limits_lengths(cfg):
    B, S = 2, 3200
    audio = jnp.zeros((B, S))
    mask = jnp.arange(S)[None, :] < jnp.asarray([S, S // 2])[:, None]
    model = AudioOnlyCTC(cfg.model)
    params = model.init(jax.random.PRNGKey(0), audio)
    _, lengths = model.apply(params, audio, sample_mask=mask)
    lengths = np.asarray(lengths)
    assert lengths[1] < lengths[0]


def test_visual_only_ctc(cfg):
    B, T = 2, 5
    lips = jnp.zeros((B, T, 1, 24, 24))
    model = VisualOnlyCTC(cfg.model)
    params = model.init(jax.random.PRNGKey(0), lips)
    lp, lengths = model.apply(params, lips, jnp.asarray([5, 3]))
    assert lp.shape == (B, T, cfg.model.decoder.vocab_size)
    assert np.asarray(lengths).tolist() == [5, 3]


def test_multispeaker_av_model_full_forward(cfg):
    rng = np.random.default_rng(0)
    B, T, S = 2, 4, 3200
    lip1 = jnp.asarray(rng.uniform(size=(B, T, 1, 24, 24)).astype(np.float32))
    lip2 = jnp.asarray(rng.uniform(size=(B, T, 1, 24, 24)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32))
    mask1 = jnp.asarray(rng.integers(0, 4, size=(B, S)))
    mask2 = jnp.asarray(rng.integers(0, 4, size=(B, S)))
    lens = jnp.asarray([T, T - 1])

    model = MultiSpeakerAVModel(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0), lip1, lip2, audio, mask1, mask2, lens, lens
    )
    out = jax.jit(model.apply)(params, lip1, lip2, audio, mask1, mask2, lens, lens)
    V = cfg.model.decoder.vocab_size
    assert out["log_probs1"].shape == (B, T, V)
    assert out["log_probs2"].shape == (B, T, V)
    assert out["contrast1"].shape[-1] == cfg.model.contrastive.projection_dim
    assert out["mask_ds1"].shape == out["contrast1"].shape[:2]
    assert (np.asarray(out["input_lengths1"]) <= T).all()
    for k in ("log_probs1", "log_probs2", "contrast1", "contrast2"):
        assert np.isfinite(np.asarray(out[k])).all()


def test_legacy_model_twin_logits(cfg):
    B, T, Tm, V = 2, 4, 9, 30
    frames = jnp.zeros((B, T, 24, 24, 3))
    mel = jnp.zeros((B, Tm, 80))
    model = MultimodalCTCKoreanModel(vocab_size=V, hidden_dim=16)
    params = model.init(jax.random.PRNGKey(0), frames, frames, mel)
    la, lb = model.apply(params, frames, frames, mel)
    assert la.shape == (B, Tm, V) and lb.shape == (B, Tm, V)
    # Shared head + shared encoders on identical streams → identical logits.
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)


def test_bf16_forward_is_finite(cfg):
    B, S = 1, 3200
    model = AudioOnlyCTC(cfg.model, dtype=jnp.bfloat16)
    audio = jnp.zeros((B, S))
    params = model.init(jax.random.PRNGKey(0), audio)
    lp, _ = model.apply(params, audio)
    assert lp.dtype == jnp.float32  # head forces f32 log-probs
    assert np.isfinite(np.asarray(lp)).all()


def test_multispeaker_swap_symmetry(cfg):
    """Swapping (lip1, mask1) with (lip2, mask2) must exactly swap the
    per-speaker outputs (shared weights, batched-speaker forward)."""
    rng = np.random.default_rng(3)
    B, T, S = 2, 4, 3200
    lip1 = jnp.asarray(rng.uniform(size=(B, T, 1, 24, 24)).astype(np.float32))
    lip2 = jnp.asarray(rng.uniform(size=(B, T, 1, 24, 24)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32))
    mask1 = jnp.asarray(rng.integers(0, 4, size=(B, S)))
    mask2 = jnp.asarray(rng.integers(0, 4, size=(B, S)))
    lens = jnp.asarray([T, T - 1])

    model = MultiSpeakerAVModel(cfg.model)
    params = model.init(jax.random.PRNGKey(0), lip1, lip2, audio, mask1, mask2, lens, lens)
    a = model.apply(params, lip1, lip2, audio, mask1, mask2, lens, lens)
    b = model.apply(params, lip2, lip1, audio, mask2, mask1, lens, lens)
    np.testing.assert_allclose(np.asarray(a["log_probs1"]), np.asarray(b["log_probs2"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["log_probs2"]), np.asarray(b["log_probs1"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a["input_lengths1"]),
                                  np.asarray(b["input_lengths2"]))
