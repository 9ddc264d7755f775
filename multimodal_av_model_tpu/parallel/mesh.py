"""Device mesh construction and named shardings.

The reference is strictly single-device (SURVEY.md §2c: no torch.distributed,
no NCCL, no samplers) — this layer is designed from scratch for TPU:

* a 2-D ``jax.sharding.Mesh`` with axes ``('data', 'model')``; gradient
  reduction is the ``psum`` XLA inserts for data-sharded batches under jit,
  riding ICI on a pod slice;
* batch tensors shard their leading axis over ``data``; params replicate by
  default (the model is far below HBM capacity at this scale — DP is the
  primary axis, SURVEY.md §2c) with the ``model`` axis reserved for wide
  layers (tensor parallelism extension point);
* everything works identically on a virtual CPU mesh
  (``--xla_force_host_platform_device_count``) — how multi-chip paths are
  tested without a pod.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the first ``n_devices`` devices.

    If the default backend has fewer than ``n_devices`` devices but a CPU
    backend has enough (the virtual-mesh testing setup,
    ``--xla_force_host_platform_device_count``), falls back to CPU devices.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            try:
                cpu = jax.devices("cpu")
                if len(cpu) >= n_devices:
                    devices = cpu
            except RuntimeError:
                pass
    devices = list(devices)
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place every array in the batch dict with its batch axis over ``data``.

    Scalars (e.g. ``num_real``) replicate.  Under a multi-process runtime
    each process passes only ITS slice of the global batch (the per-host
    loader pattern, ``multihost.process_local_batch_size``) and the global
    array is assembled from the process-local shards.
    """
    data = batch_sharding(mesh)
    rep = replicated(mesh)
    multiprocess = any(d.process_index != jax.process_index()
                       for d in mesh.devices.flat)

    def place(x):
        x = np.asarray(x)
        if x.ndim == 0:
            if multiprocess:
                return jax.make_array_from_process_local_data(rep, x)
            return jax.device_put(x, rep)
        if multiprocess:
            return jax.make_array_from_process_local_data(data, x)
        return jax.device_put(x, data)

    return {k: place(v) for k, v in batch.items()}


def local_data_parallelism(mesh: Mesh) -> int:
    """This process's device count along the ``data`` axis — the multiple a
    process-local batch must pad to before ``shard_batch``."""
    local = sum(1 for d in mesh.devices.flat
                if d.process_index == jax.process_index())
    return max(1, local // mesh.shape.get(MODEL_AXIS, 1))


def local_batch_rows(x) -> np.ndarray:
    """This process's rows of a batch-sharded (leading-axis) array, as numpy.

    Fully-addressable arrays (single process) return all rows.  In a
    multi-process run a jit output is globally sharded and ``np.asarray``
    would raise; here each process extracts its addressable row shards
    (deduplicated — model-axis replication yields one copy per model device)
    so decode/metrics run on the rows this process fed in."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    by_start: dict[int, np.ndarray] = {}
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        if start not in by_start:
            by_start[start] = np.asarray(s.data)
    return np.concatenate([by_start[k] for k in sorted(by_start)], axis=0)


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Pad the batch axis so it divides the data-axis size (repeats the last
    row; ``num_real`` records the true count for metric masking)."""
    sizes = {v.shape[0] for v in batch.values() if getattr(v, "ndim", 0) > 0}
    if len(sizes) != 1:
        raise ValueError("inconsistent batch axis")
    (b,) = sizes
    rem = (-b) % multiple
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim == 0:
            out[k] = v
        else:
            out[k] = np.concatenate([v, np.repeat(v[-1:], rem, axis=0)], axis=0)
    if "valid" in out:
        out["valid"] = out["valid"].copy()
        out["valid"][b:] = 0.0
    out.setdefault("num_real", np.int32(b))
    return out
