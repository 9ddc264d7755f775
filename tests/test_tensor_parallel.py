"""Tensor parallelism: wide Conformer layers sharded over the mesh `model`
axis must produce the same numbers as the unsharded model (SURVEY.md §2c TP
row — designed from scratch; the reference is single-device)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from multimodal_av_model_tpu.models import AudioEncoder, MultiSpeakerAVModel
from multimodal_av_model_tpu.parallel import (
    MODEL_AXIS,
    make_mesh,
    shard_batch,
    shard_params,
    tp_param_specs,
)
from multimodal_av_model_tpu.text import CharTokenizer
from multimodal_av_model_tpu.train import MultiSpeakerTrainer
from test_models import tiny_config
from test_trainer import tiny_batch

import os

VOCAB = os.path.join(os.path.dirname(__file__), "..", "assets", "tokenizer800.vocab")


@pytest.fixture(scope="module")
def audio_setup():
    cfg = tiny_config()
    model = AudioEncoder(cfg.model.audio, cfg.model.frontend)
    B, S = 4, 3200
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
    mask = jnp.asarray(rng.integers(0, 2, size=(B, S)).astype(bool))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), audio, mask)["params"]
    return cfg, model, params, audio, mask


def test_tp_specs_cover_wide_layers(audio_setup):
    _, _, params, _, _ = audio_setup
    specs = tp_param_specs(params, model_parallel=2)
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(specs)
    joined = {"/".join(map(str, k)): v for k, v in flat.items()}
    ffn0 = [v for k, v in joined.items()
            if "FeedForwardModule_0/Dense_0/kernel" in k]
    assert ffn0 and all(v == P(None, MODEL_AXIS) for v in ffn0)
    ffn1 = [v for k, v in joined.items()
            if "FeedForwardModule_0/Dense_1/kernel" in k]
    assert ffn1 and all(v == P(MODEL_AXIS, None) for v in ffn1)
    assert joined["out_proj/kernel"] == P(None, MODEL_AXIS)
    qkv = [v for k, v in joined.items()
           if "self_attention/query/kernel" in k]
    assert qkv and all(v == P(None, MODEL_AXIS, None) for v in qkv)
    # Norms and conv module replicate.
    lnorm = [v for k, v in joined.items() if "LayerNorm" in k]
    assert lnorm and all(v == P() for v in lnorm)


def test_tp_indivisible_falls_back_to_replication(audio_setup):
    _, _, params, _, _ = audio_setup
    # model_parallel=7 divides none of the tiny dims → everything replicates.
    specs = tp_param_specs(params, model_parallel=7)
    from flax.traverse_util import flatten_dict

    assert all(v == P() for v in flatten_dict(specs).values())


def test_tp_forward_matches_unsharded(audio_setup):
    cfg, model, params, audio, mask = audio_setup

    @jax.jit
    def fwd(p, a, m):
        last, middle, _valid, _ = model.apply({"params": p}, a, m)
        return last, middle

    ref_last, ref_middle = jax.device_get(fwd(params, audio, mask))

    mesh = make_mesh(n_devices=4, model_parallel=2)
    p_sh = shard_params(mesh, params)
    batch = shard_batch(mesh, {"a": np.asarray(audio), "m": np.asarray(mask)})
    tp_last, tp_middle = jax.device_get(fwd(p_sh, batch["a"], batch["m"]))

    np.testing.assert_allclose(tp_last, ref_last, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(tp_middle, ref_middle, atol=2e-4, rtol=1e-4)


def test_tp_train_step_matches_dp_only():
    """One flagship train step on a (2 data × 2 model) mesh must match the
    same step on a pure-DP mesh: same loss, same grad norm."""
    tok = CharTokenizer(VOCAB)
    cfg = tiny_config()
    cfg.model.decoder.vocab_size = tok.vocab_size
    cfg.model.fusion.temporal_model = "transformer"
    batch = tiny_batch(tok, B=4)

    def run(model_parallel):
        mesh = make_mesh(n_devices=4, model_parallel=model_parallel)
        model = MultiSpeakerAVModel(cfg.model)
        trainer = MultiSpeakerTrainer(cfg, model, tok, mesh=mesh)
        state = trainer.init_state(0, batch)
        _, metrics = trainer.train_step(state, trainer._place(batch))
        return {k: float(v) for k, v in metrics.items()}

    dp = run(1)
    tp = run(2)
    assert dp["loss"] == pytest.approx(tp["loss"], rel=1e-4)
    assert dp["grad_norm"] == pytest.approx(tp["grad_norm"], rel=1e-3)
