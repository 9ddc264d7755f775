"""Pipeline parallelism (parallel/pp.py): the GPipe microbatch pipeline over
the mesh ``pipe`` axis must reproduce the sequential Conformer stack exactly
— forward AND parameter gradients — and compose with data parallelism.

Reference scope: the reference is single-device; PP exists for the
wav2vec2-LARGE-scale tower the reference downloads instead of training
(model/encoder.py:83).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_av_model_tpu.models.audio import ConformerBlock
from multimodal_av_model_tpu.parallel.mesh import make_mesh
from multimodal_av_model_tpu.parallel.pp import (
    PIPE_AXIS,
    bubble_fraction,
    pipeline_blocks,
    shard_stacked_params,
    stack_block_params,
    unstack_block_params,
)
from jax.sharding import Mesh

L, D, HEADS, FFN, KERNEL = 8, 16, 2, 32, 3
B, T = 8, 12


def _make_block():
    return ConformerBlock(HEADS, FFN, KERNEL, 0.0, jnp.float32)


def _init_blocks(seed=0):
    """Per-block params named block0..block{L-1} (the AudioEncoder layout)."""
    block = _make_block()
    x = jnp.zeros((2, T, D))
    valid = jnp.ones((2, T), bool)
    amask = jnp.ones((2, 1, T, T), bool)
    params = {}
    for i in range(L):
        key = jax.random.PRNGKey(seed * 1000 + i)
        params[f"block{i}"] = block.init(key, x, valid, amask, True)["params"]
    return block, params


def _sequential(block, params, x, valid, amask):
    for i in range(L):
        x = block.apply({"params": params[f"block{i}"]}, x, valid, amask, True)
    return x


def _inputs(seed=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lens = rng.integers(T // 2, T + 1, size=(B,))
    valid = jnp.asarray(np.arange(T)[None, :] < lens[:, None])
    amask = valid[:, None, None, :] & valid[:, None, :, None]
    return x, valid, amask


def _pipe_mesh(n_pipe):
    devs = np.array(jax.devices()[:n_pipe])
    return Mesh(devs, (PIPE_AXIS,))


def test_stack_unstack_roundtrip():
    _, params = _init_blocks()
    stacked = stack_block_params(params, L)
    back = unstack_block_params(stacked, L)
    jax.tree.map(np.testing.assert_array_equal, params, back)


@pytest.mark.parametrize("microbatches", [2, 4, 8])
def test_pipeline_forward_matches_sequential(microbatches):
    block, params = _init_blocks()
    x, valid, amask = _inputs()
    want = _sequential(block, params, x, valid, amask)

    mesh = _pipe_mesh(4)
    stacked = shard_stacked_params(stack_block_params(params, L), mesh)
    got = pipeline_blocks(block, stacked, x, valid, amask, mesh, microbatches)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match_sequential():
    block, params = _init_blocks()
    x, valid, amask = _inputs(seed=2)
    mesh = _pipe_mesh(4)
    stacked_specd = shard_stacked_params(stack_block_params(params, L), mesh)

    def seq_loss(p):
        y = _sequential(block, p, x, valid, amask)
        return (y * jnp.where(valid[..., None], 1.0, 0.0)).sum()

    def pp_loss(stacked):
        y = pipeline_blocks(block, stacked, x, valid, amask, mesh, 4)
        return (y * jnp.where(valid[..., None], 1.0, 0.0)).sum()

    g_seq = jax.grad(seq_loss)(params)
    g_pp = jax.jit(jax.grad(pp_loss))(stacked_specd)
    g_pp_unstacked = unstack_block_params(g_pp, L)
    flat_seq = jax.tree_util.tree_leaves_with_path(g_seq)
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp_unstacked)
    assert len(flat_seq) == len(flat_pp)
    for (path_a, a), (path_b, b) in zip(flat_seq, flat_pp):
        assert path_a == path_b
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(path_a))


def test_pipeline_composes_with_data_parallel():
    """(data=2, pipe=4): microbatch rows shard over data, layers over pipe."""
    block, params = _init_blocks()
    x, valid, amask = _inputs(seed=3)
    want = _sequential(block, params, x, valid, amask)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", PIPE_AXIS))
    stacked = shard_stacked_params(stack_block_params(params, L), mesh)
    got = pipeline_blocks(block, stacked, x, valid, amask, mesh, 4,
                          data_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bubble_fraction():
    assert bubble_fraction(4, 4) == pytest.approx(3 / 7)
    assert bubble_fraction(1, 8) == 0.0
