"""Gather-free sharded checkpoints (train/sharded_checkpoints.py) on the
virtual 8-device CPU mesh.

The reference's checkpointing is single-GPU ``torch.save`` (reference
main.py:47-55); the msgpack backend reproduces that surface but *gathers*.
These tests pin the sharded backend's contract:

* round-trip — FSDP-sharded state saves without gathering and restores
  bit-exact under the same shardings;
* resharding — a checkpoint saved under one layout restores under any
  other (sharded -> replicated, replicated -> sharded, different specs);
* metadata — ints/floats and host numpy leaves survive; a save without the
  COMMITTED marker is not restorable (crash consistency);
* manager integration — the rolling last/best policy and preemption
  save_now work with layout="sharded", and fit-level resume round-trips.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_av_model_tpu.train.checkpoints import CheckpointManager
from multimodal_av_model_tpu.train.sharded_checkpoints import (
    restore_sharded,
    save_sharded,
    sharded_checkpoint_exists,
)


def _mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))


def _sharded_tree(mesh):
    """A state-like tree with mixed layouts: sharded, replicated, tiny."""
    rng = np.random.default_rng(0)
    big = rng.standard_normal((64, 256)).astype(np.float32)
    mid = rng.standard_normal((16, 8, 8)).astype(np.float32)
    bias = rng.standard_normal((256,)).astype(np.float32)
    tree = {
        "params": {
            "big": jax.device_put(big, NamedSharding(mesh, P("data", None))),
            "mid": jax.device_put(mid, NamedSharding(mesh, P(None, "data"))),
            "bias": jax.device_put(bias, NamedSharding(mesh, P())),
        },
        "step": 7,
        "lr": 1e-4,
        "host": np.arange(12, dtype=np.int32).reshape(3, 4),
    }
    return tree, {"big": big, "mid": mid, "bias": bias}


def test_sharded_roundtrip_preserves_values_and_shardings(tmp_path):
    mesh = _mesh()
    tree, raw = _sharded_tree(mesh)
    path = str(tmp_path / "ck")
    save_sharded(path, tree)
    assert sharded_checkpoint_exists(path)

    restored = restore_sharded(path, tree)
    for name in ("big", "mid", "bias"):
        got = restored["params"][name]
        np.testing.assert_array_equal(np.asarray(got), raw[name])
        assert got.sharding == tree["params"][name].sharding
    assert restored["step"] == 7 and restored["lr"] == pytest.approx(1e-4)
    np.testing.assert_array_equal(restored["host"], tree["host"])


def test_sharded_files_hold_shards_not_gathers(tmp_path):
    """The save must be gather-free: with one process, the shard file holds
    8 pieces of the 'data'-sharded leaf (one per device), each 1/8 the rows,
    not one full array."""
    mesh = _mesh()
    tree, _ = _sharded_tree(mesh)
    path = str(tmp_path / "ck")
    save_sharded(path, tree)

    from flax import serialization

    with open(os.path.join(path, "shards-00000.msgpack"), "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    pieces = payload["pieces"]["['params']['big']"]
    assert len(pieces) == 8
    assert all(p["data"].shape == (8, 256) for p in pieces)
    starts = sorted(p["start_stop"][0][0] for p in pieces)
    assert starts == [0, 8, 16, 24, 32, 40, 48, 56]
    # The replicated leaf is stored exactly once (replica_id-0 cover).
    assert len(payload["pieces"]["['params']['bias']"]) == 1


def test_restore_resharded_to_any_layout(tmp_path):
    """Save under ('data',)-sharded rows; restore replicated, column-sharded,
    and onto a 4x2 mesh — values identical every time."""
    mesh = _mesh()
    tree, raw = _sharded_tree(mesh)
    path = str(tmp_path / "ck")
    save_sharded(path, tree)

    # Replicated restore.
    tpl = dict(tree)
    tpl["params"] = dict(tree["params"])
    tpl["params"]["big"] = jax.device_put(
        np.zeros_like(raw["big"]), NamedSharding(mesh, P()))
    r1 = restore_sharded(path, tpl)
    np.testing.assert_array_equal(np.asarray(r1["params"]["big"]), raw["big"])
    assert r1["params"]["big"].sharding.is_fully_replicated

    # Re-shard the OTHER axis (stored pieces split rows; target splits cols).
    tpl["params"]["big"] = jax.device_put(
        np.zeros_like(raw["big"]), NamedSharding(mesh, P(None, "data")))
    r2 = restore_sharded(path, tpl)
    np.testing.assert_array_equal(np.asarray(r2["params"]["big"]), raw["big"])

    # Different mesh shape entirely.
    mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    tpl["params"]["big"] = jax.device_put(
        np.zeros_like(raw["big"]), NamedSharding(mesh2, P("data", "model")))
    tpl["params"]["mid"] = jax.device_put(
        np.zeros_like(raw["mid"]), NamedSharding(mesh2, P("model", None)))
    r3 = restore_sharded(path, tpl)
    np.testing.assert_array_equal(np.asarray(r3["params"]["big"]), raw["big"])
    np.testing.assert_array_equal(np.asarray(r3["params"]["mid"]), raw["mid"])


def test_save_replicated_restore_sharded(tmp_path):
    """The reverse migration: a single-device-style (replicated) checkpoint
    restores straight into an FSDP layout."""
    mesh = _mesh()
    raw = np.arange(64 * 16, dtype=np.float32).reshape(64, 16)
    rep = {"w": jax.device_put(raw, NamedSharding(mesh, P()))}
    path = str(tmp_path / "ck")
    save_sharded(path, rep)

    tpl = {"w": jax.device_put(np.zeros_like(raw),
                               NamedSharding(mesh, P("data", None)))}
    out = restore_sharded(path, tpl)
    np.testing.assert_array_equal(np.asarray(out["w"]), raw)
    assert out["w"].sharding == tpl["w"].sharding


def test_uncommitted_save_is_not_restorable(tmp_path):
    mesh = _mesh()
    tree, _ = _sharded_tree(mesh)
    path = str(tmp_path / "ck")
    save_sharded(path, tree)
    os.unlink(os.path.join(path, "COMMITTED"))
    assert not sharded_checkpoint_exists(path)
    with pytest.raises(FileNotFoundError):
        restore_sharded(path, tree)


def test_bf16_leaves_roundtrip(tmp_path):
    mesh = _mesh()
    raw = np.linspace(-3, 3, 64 * 8, dtype=np.float32).reshape(64, 8)
    tree = {"w": jax.device_put(jnp.asarray(raw, jnp.bfloat16),
                                NamedSharding(mesh, P("data", None)))}
    path = str(tmp_path / "ck")
    save_sharded(path, tree)
    out = restore_sharded(path, tree)
    assert out["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out["w"], np.float32),
                                  np.asarray(tree["w"], np.float32))


def test_manager_sharded_rolling_policy_and_save_now(tmp_path):
    mesh = _mesh()
    tree, raw = _sharded_tree(mesh)
    mgr = CheckpointManager(str(tmp_path), layout="sharded")
    saved = mgr.on_epoch_end({"state": tree, "epoch": 1},
                             eval_loss=1.0, eval_wer=0.5)
    assert saved["best_wer"] and saved["best_loss"]
    assert sharded_checkpoint_exists(mgr.last)
    assert sharded_checkpoint_exists(mgr.best_wer)

    # Worse epoch: only `last` advances.
    tree2 = dict(tree)
    tree2["step"] = 8
    saved = mgr.on_epoch_end({"state": tree2, "epoch": 2},
                             eval_loss=2.0, eval_wer=0.9)
    assert not saved["best_wer"] and not saved["best_loss"]
    resumed = mgr.try_resume(template={"state": tree, "epoch": 0})
    assert int(resumed["epoch"]) == 2
    assert int(resumed["state"]["step"]) == 8
    best = restore_sharded(mgr.best_wer, {"state": tree, "epoch": 0})
    assert int(best["state"]["step"]) == 7

    # Preemption path writes `last` synchronously.
    tree3 = dict(tree)
    tree3["step"] = 9
    mgr.save_now({"state": tree3, "epoch": 2})
    resumed = mgr.try_resume(template={"state": tree, "epoch": 0})
    assert int(resumed["state"]["step"]) == 9
    np.testing.assert_array_equal(
        np.asarray(resumed["state"]["params"]["big"]), raw["big"])


def test_trainstate_fsdp_roundtrip(tmp_path):
    """End to end on a real TrainState: init the flagship tiny trainer under
    an FSDP mesh, save sharded, restore into a fresh template — params AND
    Adam state equal, shardings preserved."""
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.parallel import make_mesh
    from multimodal_av_model_tpu.text import CharTokenizer
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer
    from test_models import tiny_config
    from test_sharding import _flagship_batch

    tok = CharTokenizer(os.path.join(os.path.dirname(__file__), "..",
                                     "assets", "tokenizer800.vocab"))
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"
    cfg.model.visual.norm = "group"
    mesh = make_mesh()
    trainer = MultiSpeakerTrainer(cfg, MultiSpeakerAVModel(cfg.model), tok,
                                  mesh=mesh, fsdp=True)
    batch = _flagship_batch(tok, B=8)
    state = trainer.init_state(0, batch)
    state, _ = trainer.train_step(state, trainer._place(batch))

    path = str(tmp_path / "ck")
    save_sharded(path, {"state": state, "epoch": 3})
    fresh = trainer.init_state(0, batch)
    restored = restore_sharded(path, {"state": fresh, "epoch": 0})
    assert int(restored["epoch"]) == 3

    def assert_tree_equal(a, b):
        jax.tree.map(lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)), a, b)

    assert_tree_equal(restored["state"].params, state.params)
    assert_tree_equal(restored["state"].opt_state, state.opt_state)
    # Shardings come from the template (identical layout here).
    got = jax.tree.leaves(jax.tree.map(lambda x: x.sharding,
                                       restored["state"].params))
    want = jax.tree.leaves(jax.tree.map(lambda x: x.sharding,
                                        fresh.params))
    assert got == want
