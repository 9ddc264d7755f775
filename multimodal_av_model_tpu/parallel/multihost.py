"""Multi-host (multi-process) scale-out: jax.distributed init + hybrid meshes.

The single-host path (``mesh.py``) covers a v4-8/v5e slice — the production
scale for this model (SURVEY.md §2c: DP is the primary axis, the model is far
below HBM capacity).  This module is the documented extension point for
going beyond one host (SURVEY.md §5, distributed-communication row):

* ``initialize_distributed`` — idempotent ``jax.distributed.initialize``
  driven by standard cluster env vars (a no-op on a single process, so every
  entry point can call it unconditionally);
* ``make_hybrid_mesh`` — a ``(data, model)`` mesh whose layout respects the
  two-tier network: the ``model`` axis (latency-sensitive tensor-parallel
  collectives: one psum per Conformer FFN, ``tp.py``) stays inside a host's
  ICI domain, while the ``data`` axis (bandwidth-tolerant gradient psum,
  overlappable with the backward pass) spans hosts over DCN.  This is the
  standard hybrid recipe: order mesh axes so the fastest-varying axis maps
  to the fastest interconnect.

Everything downstream is unchanged: ``shard_batch`` / ``shard_params`` /
the jitted train step operate on a ``Mesh`` and never ask which
interconnect an axis rides — XLA routes the collectives.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import DATA_AXIS, MODEL_AXIS

_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-process JAX from args or env; returns True if a
    multi-process runtime came up.

    Env convention (all three required to trigger initialization):
    ``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``.
    On TPU pods with standard metadata these can be omitted entirely and
    ``jax.distributed.initialize()`` autodetects; we only force explicit
    values when the env provides them.  Safe to call more than once.
    """
    global _initialized
    # Read the env/args BEFORE touching any backend-initializing JAX API:
    # jax.distributed.initialize() must run before the XLA backend comes up,
    # and even jax.process_count() initializes it.  Idempotency is tracked by
    # the module flag (and jax's own distributed global state), never by a
    # backend query.
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if _initialized:
        return jax.process_count() > 1

    if not (coordinator_address and num_processes is not None
            and process_id is not None):
        _initialized = True     # single-process run; nothing to do
        return False

    # Someone may have initialized jax.distributed out-of-band (e.g. a test
    # harness); jax's own state is authoritative and initialize() would raise.
    from jax._src import distributed as _jax_distributed

    if getattr(_jax_distributed.global_state, "client", None) is None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _initialized = True
    return jax.process_count() > 1


def make_hybrid_mesh(model_parallel: int = 1, devices=None) -> Mesh:
    """``(data, model)`` mesh laid out so ``model`` never crosses hosts.

    Device order: group by process (host), then split each host's devices
    into data-rows of width ``model_parallel``.  The resulting grid is
    ``[total/model_parallel, model_parallel]`` where every row (a
    tensor-parallel group) is host-local — its psums ride ICI — and the
    column axis concatenates hosts — the gradient psum crosses DCN only
    between host blocks.

    ``model_parallel`` must divide the per-host device count (a TP group
    spanning DCN would serialize every FFN on the slow network — refused
    rather than allowed to silently crawl).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)

    by_proc: dict[int, list] = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)

    rows = []
    for proc in sorted(by_proc):
        local = sorted(by_proc[proc], key=lambda d: d.id)
        if len(local) % model_parallel != 0:
            raise ValueError(
                f"host {proc} has {len(local)} devices, not divisible by "
                f"model_parallel={model_parallel} — a tensor-parallel group "
                f"must stay inside one host's ICI domain")
        for i in range(0, len(local), model_parallel):
            rows.append(local[i : i + model_parallel])

    grid = np.array(rows, dtype=object)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def process_local_batch_size(global_batch_size: int) -> int:
    """Per-process batch share for a data loader feeding a global batch.

    Each process loads only its shard (standard multi-host input pattern:
    per-host loaders + ``jax.make_array_from_process_local_data``)."""
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes")
    return global_batch_size // n
