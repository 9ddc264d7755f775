"""Sharded (gather-free) checkpointing for mesh-sharded training state.

The msgpack backend (``checkpoints.py``) snapshots via ``jax.device_get`` —
correct, but it *gathers*: every leaf is materialized in full on the host.
That is exactly wrong for the configs the parallelism layer exists for
(FSDP/ZeRO params + Adam state over ``data``, TP over ``model``,
wav2vec2-LARGE-scale towers — parallel/fsdp.py, parallel/tp.py): a state
sharded 8 ways re-assembles 8× its per-host footprint on one host, and in a
multi-process run ``device_get`` on a non-fully-addressable array raises.
The reference has no analogue of any of this — it is single-GPU
``torch.save`` (reference main.py:47-55).

TPU-native design — the sharding IS the format:

* **Save** writes one file per process containing exactly the shards that
  process owns.  The shards with ``replica_id == 0`` tile every global
  array exactly once across the fleet, so "each process saves its
  replica-0 shards" is a complete, duplicate-free cover with zero
  communication and no gather; hosts write in parallel.
* **Restore** rebuilds each leaf with ``jax.make_array_from_callback``
  under the *template's* sharding: the callback assembles any requested
  index range from the stored pieces, so a checkpoint saved under one
  layout restores under ANY other (FSDP → replicated, DP → FSDP×TP, a
  different mesh shape) — resharding happens by construction, not by a
  conversion tool.
* A ``COMMITTED`` marker written after all shard files make partial
  (crashed) saves detectable; save into a temp dir + atomic rename keeps
  the previous checkpoint until the new one is complete.

Non-array leaves (epoch counters, floats) ride in the manifest; host numpy
arrays are treated as replicated and saved by process 0.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from typing import Any

import jax
import numpy as np
from flax import serialization

MANIFEST = "manifest.msgpack"
MARKER = "COMMITTED"


def _keystr(path) -> str:
    return jax.tree_util.keystr(path)


def _norm_index(index, shape) -> list[list[int]]:
    """Normalize a tuple of slices into explicit [start, stop] per dim."""
    out = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        out.append([start, stop])
    return out


def save_sharded(directory: str, tree: Any) -> None:
    """Write ``tree`` as a sharded checkpoint directory.

    Every process must call this (it is collective in a multi-process run);
    each writes only its own shards.  Single-process runs produce one shard
    file and are the common case on this dev box.
    """
    directory = os.path.abspath(directory)
    pidx, pcount = jax.process_index(), jax.process_count()

    leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    manifest_leaves: dict[str, dict] = {}
    meta: dict[str, Any] = {}
    my_pieces: dict[str, list[dict]] = {}
    for path, leaf in leaves:
        key = _keystr(path)
        if isinstance(leaf, jax.Array):
            manifest_leaves[key] = {
                "shape": list(leaf.shape),
                "dtype": jax.dtypes.canonicalize_dtype(leaf.dtype).name,
            }
            pieces = []
            for sh in leaf.addressable_shards:
                if sh.replica_id != 0:
                    continue
                pieces.append({
                    "start_stop": _norm_index(sh.index, leaf.shape),
                    "data": np.asarray(sh.data),
                })
            if pieces:
                my_pieces[key] = pieces
        elif isinstance(leaf, np.ndarray):
            manifest_leaves[key] = {"shape": list(leaf.shape),
                                    "dtype": leaf.dtype.name}
            if pidx == 0:  # host array: replicated by definition
                my_pieces[key] = [{
                    "start_stop": [[0, d] for d in leaf.shape],
                    "data": leaf,
                }]
        else:
            meta[key] = leaf

    # Stage into a sibling temp dir; process 0 renames after the barrier so
    # readers never see a half-written checkpoint under the final name.
    parent = os.path.dirname(directory) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = directory + ".tmp"
    if pidx == 0:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
    _barrier(pcount, "sharded-ckpt-mkdir")

    shard_path = os.path.join(tmp, f"shards-{pidx:05d}.msgpack")
    _atomic_write(shard_path, serialization.msgpack_serialize(
        {"pieces": my_pieces}))
    if pidx == 0:
        _atomic_write(os.path.join(tmp, MANIFEST), serialization.msgpack_serialize({
            "leaves": manifest_leaves,
            "meta": meta,
            "process_count": pcount,
        }))
    _barrier(pcount, "sharded-ckpt-written")
    if pidx == 0:
        with open(os.path.join(tmp, MARKER), "w") as f:
            f.write("ok\n")
        if os.path.isdir(directory):
            shutil.rmtree(directory)
        os.replace(tmp, directory)
    _barrier(pcount, "sharded-ckpt-committed")


def _barrier(pcount: int, name: str) -> None:
    if pcount > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def _atomic_write(path: str, data: bytes) -> None:
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".w-")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def sharded_checkpoint_exists(directory: str) -> bool:
    return os.path.isfile(os.path.join(directory, MARKER))


class _PieceReader:
    """Lazy per-leaf piece index over every shard file in the directory.

    All shard files are visible to all hosts (shared filesystem — same
    assumption every multi-host checkpoint scheme makes); each file is
    parsed at most once per restore.
    """

    def __init__(self, directory: str):
        self._paths = sorted(glob.glob(os.path.join(directory, "shards-*.msgpack")))
        if not self._paths:
            raise FileNotFoundError(f"no shard files under {directory}")
        self._loaded: list[bool] = [False] * len(self._paths)
        self._pieces: dict[str, list[dict]] = {}

    def _load(self, i: int) -> None:
        if self._loaded[i]:
            return
        with open(self._paths[i], "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        for key, pieces in payload["pieces"].items():
            self._pieces.setdefault(key, []).extend(pieces)
        self._loaded[i] = True

    def pieces(self, key: str) -> list[dict]:
        for i in range(len(self._paths)):
            self._load(i)
        return self._pieces.get(key, [])

    def assemble(self, key: str, shape, dtype, index) -> np.ndarray:
        """Materialize the ``index`` (tuple of slices) region of leaf ``key``
        from whatever stored pieces overlap it — the pieces may come from a
        different device layout than the one being restored to."""
        req = _norm_index(index, shape)
        out_shape = [stop - start for start, stop in req]
        out = np.empty(out_shape, dtype=dtype)
        filled = np.zeros(out_shape, dtype=bool) if out.size else None
        for piece in self.pieces(key):
            ps = piece["start_stop"]
            dst_sl, src_sl = [], []
            empty = False
            for (rs, re), (qs, qe) in zip(req, ps):
                lo, hi = max(rs, qs), min(re, qe)
                if lo >= hi:
                    empty = True
                    break
                dst_sl.append(slice(lo - rs, hi - rs))
                src_sl.append(slice(lo - qs, hi - qs))
            if empty:
                continue
            out[tuple(dst_sl)] = piece["data"][tuple(src_sl)]
            if filled is not None:
                filled[tuple(dst_sl)] = True
        if filled is not None and not filled.all():
            raise ValueError(
                f"sharded checkpoint is missing data for leaf {key!r} "
                f"region {req} (incomplete shard files?)")
        return out


def restore_sharded(directory: str, template: Any) -> Any:
    """Restore a sharded checkpoint into ``template``'s structure and
    *shardings*.

    Template leaves that are ``jax.Array`` (or ``ShapeDtypeStruct`` with a
    ``sharding``) come back as global arrays under that leaf's sharding —
    regardless of the layout they were saved under.  Plain numpy template
    leaves come back as host numpy.  Non-array leaves restore from the
    manifest.
    """
    if template is None:
        raise ValueError("restore_sharded needs a template: the template's "
                         "leaf shardings define the restored layout")
    directory = os.path.abspath(directory)
    if not sharded_checkpoint_exists(directory):
        raise FileNotFoundError(f"no committed sharded checkpoint at {directory}")
    with open(os.path.join(directory, MANIFEST), "rb") as f:
        manifest = serialization.msgpack_restore(f.read())
    reader = _PieceReader(directory)

    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for path, leaf in leaves:
        key = _keystr(path)
        if key in manifest["meta"]:
            out.append(manifest["meta"][key])
            continue
        info = manifest["leaves"].get(key)
        if info is None:
            raise KeyError(f"checkpoint has no leaf {key!r}")
        shape = tuple(info["shape"])
        dtype = np.dtype(info["dtype"])
        sharding = getattr(leaf, "sharding", None)
        if isinstance(leaf, jax.Array) or (
                sharding is not None and not isinstance(leaf, np.ndarray)):
            arr = jax.make_array_from_callback(
                shape, sharding,
                lambda idx, k=key, s=shape, d=dtype: reader.assemble(k, s, d, idx))
            out.append(arr)
        else:
            full = (slice(None),) * len(shape)
            out.append(reader.assemble(key, shape, dtype, full))
    return jax.tree_util.tree_unflatten(treedef, out)
