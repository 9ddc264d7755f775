"""On-device preprocessing must match the host pipeline exactly."""

import numpy as np

import jax.numpy as jnp

from multimodal_av_model_tpu.data.device_pipeline import preprocess_batch_device
from multimodal_av_model_tpu.data.mixing import MASK_PAD, mix_pair
from multimodal_av_model_tpu.data.pipeline import preprocess_lip_clip_host


def test_matches_host_pipeline():
    rng = np.random.default_rng(0)
    B, T, H, S = 2, 5, 128, 4000
    lips1 = rng.uniform(0, 255, size=(B, T, H, H, 3)).astype(np.float32)
    lips2 = rng.uniform(0, 255, size=(B, T, H, H, 3)).astype(np.float32)
    a1 = np.zeros((B, S), np.float32)
    a2 = np.zeros((B, S), np.float32)
    lens = [(3500, 2000), (1500, 4000)]
    for b, (l1, l2) in enumerate(lens):
        a1[b, :l1] = rng.standard_normal(l1)
        a2[b, :l2] = rng.standard_normal(l2)

    out = preprocess_batch_device(
        jnp.asarray(lips1), jnp.asarray(lips2),
        jnp.asarray(a1), jnp.asarray(a2),
        jnp.asarray([l for l, _ in lens]), jnp.asarray([l for _, l in lens]),
        out_size=96,
    )

    for b, (l1, l2) in enumerate(lens):
        ref_lip1 = preprocess_lip_clip_host(lips1[b], 96)
        np.testing.assert_allclose(
            np.asarray(out["lip1"])[b], ref_lip1, rtol=1e-4, atol=1e-5
        )
        mixed, m1, m2 = mix_pair(a1[b, :l1], a2[b, :l2])
        n = max(l1, l2)
        np.testing.assert_allclose(np.asarray(out["audio"])[b, :n], mixed,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out["mask1"])[b, :n], m1)
        np.testing.assert_array_equal(np.asarray(out["mask2"])[b, :n], m2)
        assert (np.asarray(out["mask1"])[b, n:] == MASK_PAD).all()


def test_output_layout_matches_collator():
    rng = np.random.default_rng(1)
    B, T, S = 2, 4, 2000
    out = preprocess_batch_device(
        jnp.asarray(rng.uniform(0, 255, size=(B, T, 128, 128, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 255, size=(B, T, 128, 128, 3)).astype(np.float32)),
        jnp.zeros((B, S)), jnp.zeros((B, S)),
        jnp.full((B,), S), jnp.full((B,), S),
    )
    assert out["lip1"].shape == (B, T, 1, 96, 96)
    assert out["audio"].shape == (B, S)
    assert out["mask1"].dtype == jnp.int32
