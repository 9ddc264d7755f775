"""The time-folded 2D frontend must be numerically identical to the
reference-style Conv3D formulation (same weights, zero-padded time edges)."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_av_model_tpu.config import VisualEncoderConfig
from multimodal_av_model_tpu.models import VisualEncoder


def test_folded_frontend_equals_conv3d():
    rng = np.random.default_rng(0)
    B, T, H, W = 2, 7, 32, 32
    x = jnp.asarray(rng.standard_normal((B, T, H, W, 1)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((7, 7, 5, 8)).astype(np.float32) * 0.1)

    # Folded formulation (what VisualEncoder does).
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)))
    xf = jnp.concatenate([xp[:, k : k + T] for k in range(5)], axis=-1)
    folded = jax.lax.conv_general_dilated(
        xf.reshape(B * T, H, W, 5), w2, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(B, T, H // 2, W // 2, 8)

    # Direct Conv3D with the same weights: w3[k, h, w, 0, o] = w2[h, w, k, o].
    w3 = jnp.transpose(w2, (2, 0, 1, 3))[:, :, :, None, :]
    direct = jax.lax.conv_general_dilated(
        x, w3, (1, 2, 2), [(2, 2), (3, 3), (3, 3)],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )
    np.testing.assert_allclose(np.asarray(folded), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)


def test_visual_encoder_still_time_preserving():
    cfg = VisualEncoderConfig(
        frontend_channels=8, resnet_layers=(1, 1, 1, 1),
        resnet_channels=(8, 12, 16, 24), output_dim=24, norm="group",
    )
    model = VisualEncoder(cfg)
    lips = jnp.zeros((2, 6, 24, 24, 1))
    params = model.init(jax.random.PRNGKey(0), lips)
    out = model.apply(params, lips)
    assert out.shape == (2, 6, 24)


def test_first_and_last_frames_see_zero_padding():
    """Edge semantics: frame 0's taps k<2 read zero frames (Conv3D 'same'
    padding), so a clip whose first frames differ must differ at t=0."""
    cfg = VisualEncoderConfig(
        frontend_channels=4, resnet_layers=(1, 0, 0, 0),
        resnet_channels=(4, 4, 4, 4), output_dim=4, norm="group",
    )
    model = VisualEncoder(cfg)
    rng = np.random.default_rng(1)
    base = rng.standard_normal((1, 5, 16, 16, 1)).astype(np.float32)
    shifted = np.roll(base, 1, axis=1)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(base))
    o1 = np.asarray(model.apply(params, jnp.asarray(base)))
    o2 = np.asarray(model.apply(params, jnp.asarray(shifted)))
    assert not np.allclose(o1[0, 0], o2[0, 0])
