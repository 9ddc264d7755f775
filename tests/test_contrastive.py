"""Masked contrastive loss vs the reference torch implementation (imported
read-only as an oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_av_model_tpu.ops.contrastive import contrastive_loss_with_mask

torch = pytest.importorskip("torch")


def _ref_loss(reference_path, feat, mask):
    from contrastive import contrastive_loss_with_mask as ref_fn  # type: ignore

    return float(
        ref_fn(torch.tensor(feat), torch.tensor(mask.reshape(-1)), projection_layer=None)
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_reference(reference_path, seed):
    rng = np.random.default_rng(seed)
    B, T, D = 2, 12, 16
    feat = rng.standard_normal((B, T, D)).astype(np.float32)
    mask = rng.integers(0, 4, size=(B, T)).astype(np.int64)
    ours = float(contrastive_loss_with_mask(jnp.asarray(feat), jnp.asarray(mask)))
    ref = _ref_loss(reference_path, feat, mask)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_empty_positive_set(reference_path):
    rng = np.random.default_rng(3)
    feat = rng.standard_normal((1, 10, 8)).astype(np.float32)
    mask = np.array([[1, 1, 0, 0, 3, 3, 1, 0, 3, 1]], dtype=np.int64)  # no mask==2
    ours = float(contrastive_loss_with_mask(jnp.asarray(feat), jnp.asarray(mask)))
    ref = _ref_loss(reference_path, feat, mask)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_empty_anchor_set_gives_zero():
    rng = np.random.default_rng(4)
    feat = rng.standard_normal((1, 6, 8)).astype(np.float32)
    mask = np.array([[0, 0, 2, 2, 3, 3]], dtype=np.int64)  # no overlap frames
    assert float(contrastive_loss_with_mask(jnp.asarray(feat), jnp.asarray(mask))) == 0.0


def test_jit_and_grad():
    import jax

    rng = np.random.default_rng(5)
    feat = jnp.asarray(rng.standard_normal((2, 8, 8)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 4, size=(2, 8)))
    g = jax.jit(jax.grad(lambda f: contrastive_loss_with_mask(f, mask)))(feat)
    assert np.isfinite(np.asarray(g)).all()
