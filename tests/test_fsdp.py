"""ZeRO/FSDP sharding (parallel/fsdp.py) on the virtual 8-device CPU mesh.

Three properties:
* spec derivation — large leaves shard their largest free dim over `data`,
  tiny leaves replicate, TP axes are respected (no double-claimed dim);
* state placement — params AND Adam mu/nu actually live sharded on the mesh
  (the memory claim is real, not cosmetic);
* numerics — an FSDP train step is equivalent to the replicated-DP step on
  the same global batch (GSPMD's gathers/scatters change layout, not math).
"""

import os

import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from multimodal_av_model_tpu.parallel import (
    DATA_AXIS,
    fsdp_param_specs,
    make_mesh,
    shard_batch,
    shard_params_fsdp,
)
from test_sharding import _flagship_batch


def _tok():
    from multimodal_av_model_tpu.text import CharTokenizer

    return CharTokenizer(os.path.join(os.path.dirname(__file__), "..",
                                      "assets", "tokenizer800.vocab"))


def test_fsdp_specs_shard_large_leaves_and_replicate_small():
    params = {
        "big": {"kernel": np.zeros((64, 256), np.float32)},   # 16384 elems
        "tiny": {"bias": np.zeros((256,), np.float32)},       # below threshold
        "odd": {"kernel": np.zeros((51, 333), np.float32)},   # nothing divides 8
    }
    specs = fsdp_param_specs(params, data_parallel=8)
    assert specs["big"]["kernel"] == P(None, DATA_AXIS)  # largest dim wins
    assert specs["tiny"]["bias"] == P()
    assert specs["odd"]["kernel"] == P()                 # fallback: replicate


def test_fsdp_specs_compose_with_tp():
    # An FFN Dense_0 kernel is column-parallel over `model` (tp.py); FSDP must
    # claim the OTHER dimension.
    params = {"ConformerBlock_0": {"FeedForwardModule_0": {"Dense_0": {
        "kernel": np.zeros((64, 256), np.float32),
        "bias": np.zeros((256,), np.float32),
    }}}}
    specs = fsdp_param_specs(params, data_parallel=4, model_parallel=2)
    k = specs["ConformerBlock_0"]["FeedForwardModule_0"]["Dense_0"]["kernel"]
    assert k == P(DATA_AXIS, "model")


def _tiny_trainer(tok, mesh, fsdp):
    from multimodal_av_model_tpu.models import MultiSpeakerAVModel
    from multimodal_av_model_tpu.train import MultiSpeakerTrainer
    from test_models import tiny_config

    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"
    return MultiSpeakerTrainer(cfg, MultiSpeakerAVModel(cfg.model), tok,
                               mesh=mesh, fsdp=fsdp)


def test_fsdp_state_is_sharded_and_step_matches_replicated_dp():
    tok = _tok()
    batch = _flagship_batch(tok)
    mesh = make_mesh()                              # 8-device pure DP

    fs = _tiny_trainer(tok, mesh, fsdp=True)
    st_f = fs.init_state(0, batch)

    # Params: at least one leaf must ACTUALLY shard over `data`, and Adam's
    # mu must inherit that sharding (optimizer state sharded = the ZeRO part).
    def uses_data_axis(x):
        spec = getattr(getattr(x, "sharding", None), "spec", ())
        return any(e == DATA_AXIS or (isinstance(e, tuple) and DATA_AXIS in e)
                   for e in tuple(spec))

    def data_sharded(tree):
        return [x for x in jax.tree.leaves(tree) if uses_data_axis(x)]

    sharded_params = data_sharded(st_f.params)
    assert sharded_params, "no param leaf sharded over the data axis"
    mu = None
    for field in jax.tree.leaves(
            st_f.opt_state, is_leaf=lambda s: hasattr(s, "mu")):
        if hasattr(field, "mu"):
            mu = field.mu
            break
    assert mu is not None, "optax Adam state (mu) not found"
    assert data_sharded(mu), "Adam mu not sharded over the data axis"

    rep = _tiny_trainer(tok, mesh, fsdp=False)      # replicated-DP baseline
    st_r = rep.init_state(0, batch)

    # Gradient equality is the load-bearing numeric check: Adam would mask a
    # broken reduction (it normalizes every element's update to ~lr), raw
    # grads would not.
    placed = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(0)

    def grads(trainer, state):
        def loss_fn(p):
            return trainer._losses(p, state.batch_stats, placed, key, True)[0]

        return jax.device_get(jax.jit(jax.grad(loss_fn))(state.params))

    for a, b in zip(jax.tree.leaves(grads(fs, st_f)),
                    jax.tree.leaves(grads(rep, st_r))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # Two full steps: losses track (step 2's loss goes through step 1's
    # parameter update end to end).  Post-Adam params are compared only at
    # update-scale tolerance — elements with ~0 gradient get ±lr updates
    # whose SIGN is reduction-order noise, so bitwise equality across
    # layouts is not a property Adam preserves.
    lr = fs.config.train.learning_rate
    for _ in range(2):
        st_f, m_f = fs.train_step(st_f, placed)
        st_r, m_r = rep.train_step(st_r, placed)
        np.testing.assert_allclose(float(m_f["loss"]), float(m_r["loss"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(m_f["grad_norm"]),
                                   float(m_r["grad_norm"]), rtol=1e-3)
    for a, b in zip(jax.tree.leaves(jax.device_get(st_f.params)),
                    jax.tree.leaves(jax.device_get(st_r.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5 * lr)


def test_fsdp_composes_with_tensor_parallelism():
    tok = _tok()
    batch = _flagship_batch(tok)
    mesh = make_mesh(model_parallel=2)              # (4 data x 2 model)

    fs = _tiny_trainer(tok, mesh, fsdp=True)
    st = fs.init_state(0, batch)
    st, metrics = fs.train_step(st, shard_batch(mesh, batch))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
