"""Multi-device sharding tests on the virtual 8-device CPU mesh:
data-parallel training must be numerically equivalent to single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_av_model_tpu.parallel import (
    batch_sharding,
    make_mesh,
    pad_batch_to_multiple,
    replicated,
    shard_batch,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_model_parallel_axis():
    mesh = make_mesh(model_parallel=2)
    assert mesh.shape["data"] == 4
    assert mesh.shape["model"] == 2


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2),
             "n": np.int32(5)}
    placed = shard_batch(mesh, batch)
    assert placed["x"].sharding == batch_sharding(mesh)
    assert placed["n"].sharding == replicated(mesh)
    np.testing.assert_array_equal(np.asarray(placed["x"]), batch["x"])


def test_pad_batch_to_multiple():
    batch = {"x": np.arange(6, dtype=np.float32).reshape(3, 2)}
    out = pad_batch_to_multiple(batch, 4)
    assert out["x"].shape == (4, 2)
    np.testing.assert_array_equal(out["x"][3], out["x"][2])  # repeats last row
    assert out["num_real"] == 3


def test_sharded_grad_matches_single_device():
    """The canonical DP check: psum-reduced gradients over the mesh equal
    the single-device gradients for the same global batch."""
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))

    def loss(W, x, y):
        return jnp.mean((x @ W - y) ** 2)

    g_single = jax.grad(loss)(W, x, y)

    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    Ws = jax.device_put(W, replicated(mesh))
    g_sharded = jax.jit(jax.grad(loss))(Ws, xs, ys)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-5, atol=1e-6)


def test_sharded_train_step_runs_tiny_model():
    """End-to-end: the flagship train step executes with a data-sharded batch
    on the 8-device mesh (same path as __graft_entry__.dryrun_multichip)."""
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer
    from test_models import tiny_config
    import os

    tok = CharTokenizer(os.path.join(os.path.dirname(__file__), "..",
                                     "assets", "tokenizer800.vocab"))
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"
    mesh = make_mesh()
    trainer = MultiSpeakerTrainer(
        cfg, MultiSpeakerAVModel(cfg.model), tok, mesh=mesh
    )
    B, T, S, L = 8, 4, 2136, 2
    rng = np.random.default_rng(0)
    batch = {
        "lip1": rng.uniform(size=(B, T, 1, 24, 24)).astype(np.float32),
        "lip2": rng.uniform(size=(B, T, 1, 24, 24)).astype(np.float32),
        "audio": (rng.standard_normal((B, S)) * 0.1).astype(np.float32),
        "mask1": rng.integers(0, 3, size=(B, S)).astype(np.int32),
        "mask2": rng.integers(0, 3, size=(B, S)).astype(np.int32),
        "lip1_lengths": np.full((B,), T, np.int32),
        "lip2_lengths": np.full((B,), T, np.int32),
        "text1": rng.integers(5, tok.vocab_size, size=(B, L)).astype(np.int32),
        "text1_lengths": np.full((B,), L, np.int32),
        "text2": rng.integers(5, tok.vocab_size, size=(B, L)).astype(np.int32),
        "text2_lengths": np.full((B,), L, np.int32),
    }
    state = trainer.init_state(0, batch)
    placed = shard_batch(mesh, batch)
    state, metrics = trainer.train_step(state, placed)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def _flagship_batch(tok, B=8, T=4, S=2136, L=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "lip1": rng.uniform(size=(B, T, 1, 24, 24)).astype(np.float32),
        "lip2": rng.uniform(size=(B, T, 1, 24, 24)).astype(np.float32),
        "audio": (rng.standard_normal((B, S)) * 0.1).astype(np.float32),
        "mask1": rng.integers(0, 3, size=(B, S)).astype(np.int32),
        "mask2": rng.integers(0, 3, size=(B, S)).astype(np.int32),
        "lip1_lengths": np.full((B,), T, np.int32),
        "lip2_lengths": np.full((B,), T, np.int32),
        "text1": rng.integers(5, tok.vocab_size, size=(B, L)).astype(np.int32),
        "text1_lengths": np.full((B,), L, np.int32),
        "text2": rng.integers(5, tok.vocab_size, size=(B, L)).astype(np.int32),
        "text2_lengths": np.full((B,), L, np.int32),
    }


def test_batchnorm_flagship_under_mesh_matches_single_device():
    """The SHIPPED default visual norm is BatchNorm (config visual.norm =
    'batch', reference model/encoder.py:57-75).  Under pjit the batch axis is
    sharded over `data`, and flax BatchNorm's jnp.mean over that axis makes
    XLA insert the cross-device reduction — i.e. statistics are computed over
    the GLOBAL batch (sync-BN semantics by construction, docs/DESIGN.md §7).
    Verify: one mesh train step produces the same running batch_stats and
    loss as the identical un-meshed step."""
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer
    from test_models import tiny_config
    import os

    tok = CharTokenizer(os.path.join(os.path.dirname(__file__), "..",
                                     "assets", "tokenizer800.vocab"))
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"
    cfg.model.visual.norm = "batch"       # the shipped default
    batch = _flagship_batch(tok)

    mesh = make_mesh()                    # 8-device pure-DP (model axis = 1)
    meshed = MultiSpeakerTrainer(
        cfg, MultiSpeakerAVModel(cfg.model), tok, mesh=mesh)
    st_m = meshed.init_state(0, batch)
    assert st_m.batch_stats, "BatchNorm config must produce batch_stats"
    st_m, metrics_m = meshed.train_step(st_m, shard_batch(mesh, batch))

    single = MultiSpeakerTrainer(
        cfg, MultiSpeakerAVModel(cfg.model), tok, mesh=None)
    st_s = single.init_state(0, batch)
    st_s, metrics_s = single.train_step(st_s, batch)

    np.testing.assert_allclose(float(metrics_m["loss"]),
                               float(metrics_s["loss"]), rtol=1e-4)
    flat_m = jax.tree.leaves(jax.device_get(st_m.batch_stats))
    flat_s = jax.tree.leaves(jax.device_get(st_s.batch_stats))
    assert flat_m, "expected non-empty batch_stats"
    for a, b in zip(flat_m, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
