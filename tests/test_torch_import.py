"""Reference-checkpoint import: torch state_dicts → our param tree, verified
by forward parity against the reference modules themselves (random-init torch
modules run as oracles; reference main.py:48-55 checkpoint layout)."""

from __future__ import annotations

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodal_av_model_tpu.compat import (  # noqa: E402
    convert_decoder_state_dict,
    convert_fusion_state_dict,
    convert_visual_state_dict,
    import_reference_checkpoint,
)
from multimodal_av_model_tpu.config import (  # noqa: E402
    DecoderConfig,
    FusionConfig,
    VisualEncoderConfig,
)


def _import_reference_modules(reference_path):
    """Import the reference model classes with their dead torchvision import
    and the HF download stubbed out (same gating as benchmarks/parity_ab.py)."""
    _tv = types.ModuleType("torchvision")
    _tv.models = types.ModuleType("torchvision.models")
    sys.modules.setdefault("torchvision", _tv)
    sys.modules.setdefault("torchvision.models", _tv.models)
    _hf = types.ModuleType("transformers")

    class _NoHF:
        @staticmethod
        def from_pretrained(*a, **k):
            raise RuntimeError("no network access")

    _hf.Wav2Vec2Model = _NoHF
    sys.modules.setdefault("transformers", _hf)
    from model.decoder import CTCDecoder as RefCTCDecoder
    from model.encoder import VisualEncoder as RefVisualEncoder
    from model.fusion_module import CrossAttentionFusion as RefFusion

    return RefVisualEncoder, RefFusion, RefCTCDecoder


def _randomize_norm_state(module, gen):
    """Randomize BN affine + running stats and PReLU alphas so the parity
    check actually exercises those mappings (their defaults — scale 1,
    mean 0, alpha 0.25 — would make swapped fields pass silently)."""
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.weight.uniform_(0.5, 1.5, generator=gen)
                m.bias.uniform_(-0.3, 0.3, generator=gen)
                m.running_mean.uniform_(-0.2, 0.2, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)
            elif isinstance(m, torch.nn.PReLU):
                m.weight.uniform_(0.05, 0.5, generator=gen)


def test_visual_import_forward_parity(reference_path):
    RefVisualEncoder, _, _ = _import_reference_modules(reference_path)
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    ref = RefVisualEncoder(relu_type="prelu").eval()
    _randomize_norm_state(ref, gen)

    params, stats = convert_visual_state_dict(ref.state_dict())

    from multimodal_av_model_tpu.models.visual import VisualEncoder

    model = VisualEncoder(VisualEncoderConfig(), dtype=jnp.float32)
    B, T = 1, 6
    rng = np.random.default_rng(2)
    lips = rng.uniform(size=(B, T, 96, 96, 1)).astype(np.float32)

    # Shape-check the imported tree against a fresh init.
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(lips))
    chex = jax.tree.structure(template["params"])
    assert jax.tree.structure(params) == chex
    assert jax.tree.structure(stats) == jax.tree.structure(
        template["batch_stats"])

    ours = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(lips), train=False)

    with torch.no_grad():
        # Reference layout [B, C, T, H, W] (model/encoder.py:70-76).
        t_in = torch.tensor(lips.transpose(0, 4, 1, 2, 3))
        theirs = ref(t_in).numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_fusion_import_forward_parity(reference_path):
    _, RefFusion, _ = _import_reference_modules(reference_path)
    torch.manual_seed(3)
    D_V, D_A, FUSED, HEADS = 24, 16, 32, 4
    ref = RefFusion(D_V, D_A, FUSED, num_heads=HEADS).eval()

    params = convert_fusion_state_dict(ref.state_dict(), num_heads=HEADS)

    from multimodal_av_model_tpu.models.fusion import CrossAttentionFusion

    cfg = FusionConfig(fused_dim=FUSED, num_heads=HEADS)
    model = CrossAttentionFusion(cfg, dtype=jnp.float32)

    B, T_v, T_a = 2, 5, 12
    rng = np.random.default_rng(4)
    vis = rng.standard_normal((B, T_v, D_V)).astype(np.float32)
    aud = rng.standard_normal((B, T_a, D_A)).astype(np.float32)
    mask = rng.integers(0, 4, size=(B, T_a)).astype(np.int64)
    mask[:, :3] = 2                      # ≥3 kept frames per sample

    template = model.init(jax.random.PRNGKey(0), jnp.asarray(vis),
                          jnp.asarray(aud), jnp.asarray(mask))
    assert jax.tree.structure(params) == jax.tree.structure(
        template["params"])

    fused_ours, len_ours = model.apply(
        {"params": params}, jnp.asarray(vis), jnp.asarray(aud),
        jnp.asarray(mask))
    with torch.no_grad():
        fused_ref, len_ref = ref(torch.tensor(vis), torch.tensor(aud),
                                 torch.tensor(mask))
    np.testing.assert_allclose(np.asarray(fused_ours), fused_ref.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(len_ours), len_ref.numpy())


def test_decoder_import_forward_parity(reference_path):
    _, _, RefCTCDecoder = _import_reference_modules(reference_path)
    torch.manual_seed(5)
    D, V = 16, 11
    ref = RefCTCDecoder(D, V, blank_id=3).eval()
    params = convert_decoder_state_dict(ref.state_dict())

    from multimodal_av_model_tpu.models.decoder import CTCDecoder

    model = CTCDecoder(DecoderConfig(vocab_size=V), dtype=jnp.float32)
    x = np.random.default_rng(6).standard_normal((2, 7, D)).astype(np.float32)
    ours = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = ref(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_full_checkpoint_import_merges_and_skips(reference_path):
    """Full reference checkpoint layout (main.py:48-55) → flagship template:
    visual/fusion/decoder import, audio + optimizer skip with reasons, and
    untouched subtrees keep template values."""
    RefVisualEncoder, RefFusion, RefCTCDecoder = _import_reference_modules(
        reference_path)
    torch.manual_seed(7)
    D_A, FUSED, HEADS, V = 16, 32, 4, 11
    ref_fusion = RefFusion(512, D_A, FUSED, num_heads=HEADS)
    ref_dec = RefCTCDecoder(2 * FUSED, V, blank_id=3)

    ckpt = {
        "epoch": 4,
        "visual_encoder": RefVisualEncoder().state_dict(),
        "audio_encoder": {"some.hf.key": torch.zeros(3)},
        "fusion": ref_fusion.state_dict(),
        "decoder1": ref_dec.state_dict(),
        "optimizer": {"state": {}, "param_groups": []},
    }

    from multimodal_av_model_tpu.config import Config
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel

    cfg = Config()
    cfg.model.audio.d_model = D_A
    cfg.model.audio.num_layers = 1
    cfg.model.audio.num_heads = 2
    cfg.model.audio.ffn_dim = 2 * D_A
    cfg.model.audio.output_dim = D_A
    cfg.model.audio.middle_layers = (0,)
    cfg.model.fusion.fused_dim = FUSED
    cfg.model.fusion.num_heads = HEADS
    cfg.model.decoder.vocab_size = V

    model = MultiSpeakerAVModel(cfg.model)
    B, T, S = 1, 2, 2 * 534
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, T, 1, 96, 96)), jnp.zeros((B, T, 1, 96, 96)),
        jnp.zeros((B, S)), jnp.zeros((B, S), jnp.int32),
        jnp.zeros((B, S), jnp.int32))

    params, stats, report = import_reference_checkpoint(
        ckpt, variables["params"], variables["batch_stats"],
        num_heads=HEADS)

    assert report["imported"] == ["visual_encoder", "fusion", "decoder"]
    assert any("audio_encoder" in s for s in report["skipped"])
    assert any("optimizer" in s for s in report["skipped"])

    # Imported weight actually landed (kernel equals the torch transpose)...
    np.testing.assert_allclose(
        params["decoder"]["head"]["kernel"],
        ref_dec.net[0].weight.detach().numpy().T)
    # ...and untouched subtrees keep their template values.
    tp = variables["params"]["audio_encoder"]
    ip = params["audio_encoder"]
    assert all(
        np.array_equal(a, b) for a, b in zip(
            jax.tree.leaves(tp), jax.tree.leaves(ip)))

    # A mismatched config fails loudly with the offending path.
    cfg_bad_heads = 8
    with pytest.raises(ValueError, match="fusion"):
        import_reference_checkpoint(
            {"fusion": ref_fusion.state_dict()}, variables["params"],
            variables["batch_stats"], num_heads=cfg_bad_heads)


def test_bare_visual_snapshot_import(reference_path):
    """Bare encoder state_dict (reference main.py:95-97 best_loss_encoder.pt)
    is auto-detected and imported into the visual subtree."""
    RefVisualEncoder, _, _ = _import_reference_modules(reference_path)
    torch.manual_seed(8)
    ref = RefVisualEncoder()

    from multimodal_av_model_tpu.models.visual import VisualEncoder

    model = VisualEncoder(VisualEncoderConfig())
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 96, 96, 1)))
    params, stats, report = import_reference_checkpoint(
        ref.state_dict(),
        {"visual_encoder": template["params"]},
        {"visual_encoder": template["batch_stats"]})
    assert report["imported"] == ["visual_encoder"]
    np.testing.assert_allclose(
        params["visual_encoder"]["trunk"]["layer1_0"]["Conv_0"]["kernel"],
        ref.trunk.layer1[0].conv1.weight.detach().numpy().transpose(2, 3, 1, 0))
