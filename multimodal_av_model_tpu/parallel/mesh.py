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

    Scalars (e.g. ``num_real``) replicate.
    """
    data = batch_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, rep)
        return jax.device_put(x, data)

    return {k: place(v) for k, v in batch.items()}


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
