"""Fused-scan BiLSTM vs the two-scan formulation (same weights) and masking
semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_av_model_tpu.models.layers import BiLSTM, LSTMLayer


def test_matches_separate_direction_scans():
    rng = np.random.default_rng(0)
    B, T, D, H = 2, 9, 6, 5
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lengths = jnp.asarray([9, 6])

    model = BiLSTM(H, num_layers=1)
    params = model.init(jax.random.PRNGKey(0), x, lengths)["params"]
    out = model.apply({"params": params}, x, lengths)

    # Reference: independent forward/backward scans with the SAME cell weights.
    fwd = LSTMLayer(H, reverse=False)
    bwd = LSTMLayer(H, reverse=True)
    cell_f = params["layer0"]["fwd"]
    cell_b = params["layer0"]["bwd"]
    out_f = fwd.apply({"params": {"OptimizedLSTMCell_0": cell_f}}, x, lengths)
    out_b = bwd.apply({"params": {"OptimizedLSTMCell_0": cell_b}}, x, lengths)
    ref = jnp.concatenate([out_f, out_b], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_padding_frames_are_zero_and_inert():
    rng = np.random.default_rng(1)
    B, T, D, H = 2, 8, 4, 3
    x = np.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lengths = jnp.asarray([8, 5])
    model = BiLSTM(H, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), lengths)
    out = np.asarray(model.apply(params, jnp.asarray(x), lengths))
    # Outputs past each sample's length are exactly zero.
    assert (out[1, 5:] == 0).all()
    # Garbage in padding must not change valid outputs.
    x2 = x.copy()
    x2[1, 5:] = 100.0
    out2 = np.asarray(model.apply(params, jnp.asarray(x2), lengths))
    np.testing.assert_allclose(out[1, :5], out2[1, :5], rtol=1e-5, atol=1e-6)


def test_gradients_flow():
    B, T, D, H = 1, 5, 3, 4
    x = jnp.ones((B, T, D))
    model = BiLSTM(H, num_layers=1)
    params = model.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    total = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
    assert total > 0
