"""Multi-host helpers on the virtual 8-device mesh (single process).

True multi-process runs need a cluster; what IS testable here: the hybrid
mesh layout (model axis host-local, correct grid shape, train-step
compatibility) and the env-driven initialize gating.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from multimodal_av_model_tpu.parallel.multihost import (  # noqa: E402
    initialize_distributed,
    make_hybrid_mesh,
    process_local_batch_size,
)


def test_initialize_is_noop_without_env(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False


def test_hybrid_mesh_shape_and_axes():
    mesh = make_hybrid_mesh(model_parallel=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] == len(jax.devices()) // 2
    # Every tensor-parallel row stays within one process.
    grid = np.asarray(mesh.devices, dtype=object)
    for row in grid:
        assert len({d.process_index for d in row}) == 1


def test_hybrid_mesh_rejects_cross_host_tp():
    n = len(jax.devices())
    with pytest.raises(ValueError):
        make_hybrid_mesh(model_parallel=n * 2)


def test_hybrid_mesh_runs_sharded_computation():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_hybrid_mesh(model_parallel=2)
    x = jnp.arange(16.0).reshape(8, 2)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    y = jax.jit(lambda a: (a * 2).sum())(xs)
    assert float(y) == float((x * 2).sum())


def test_process_local_batch_size_single_process():
    # One process: every global batch is local (the divisibility error path
    # needs process_count > 1, untestable in-process).
    assert process_local_batch_size(32) == 32
    assert process_local_batch_size(33) == 33
