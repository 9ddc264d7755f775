"""Tensor parallelism: megatron-style sharding of the Conformer's wide layers
over the mesh ``model`` axis.

The reference has no TP (single device, SURVEY.md §2c); this layer is designed
for TPU from scratch.  The scheme is the standard two-matmul split (column-
parallel first projection, row-parallel second projection) so each FFN needs
exactly one ``psum`` — which XLA's SPMD partitioner inserts automatically once
the *parameters* carry the right ``NamedSharding``:

* FFN ``Dense_0`` (d_model → ffn_dim): kernel ``P(None, 'model')`` — column
  parallel, activations come out sharded on the hidden axis;
* FFN ``Dense_1`` (ffn_dim → d_model): kernel ``P('model', None)`` — row
  parallel over the contracted axis, XLA reduces partial products with one
  ``psum`` over ICI;
* attention q/k/v: heads axis sharded (``P(None, 'model', None)``), ``out``
  row-parallel over heads — each device computes its own heads end to end;
* the wide ``out_proj`` (d_model → 1024): column parallel.

Everything else (LayerNorms, depthwise conv module, visual trunk, fusion,
decoder) replicates: at this model scale their FLOPs/params are small and
replication avoids resharding chatter between modules.

No model code changes: specs are derived from parameter *paths* (flax's
auto-naming is stable), applied by ``jax.device_put`` after init.  jit then
propagates shardings through the computation.
"""

from __future__ import annotations

import jax
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _spec_for(path: tuple, leaf) -> P:
    parts = [str(p) for p in path]
    name = parts[-1]
    parent = parts[-2] if len(parts) >= 2 else ""
    if any(p.startswith("FeedForwardModule") for p in parts):
        if parent == "Dense_0":  # column parallel: d_model → ffn_dim
            return P(None, MODEL_AXIS) if name == "kernel" else P(MODEL_AXIS)
        if parent == "Dense_1":  # row parallel: ffn_dim → d_model (+psum)
            return P(MODEL_AXIS, None) if name == "kernel" else P()
    # Attention projections, matched by their flax child names (covers
    # nn.MultiHeadDotProductAttention under any parent naming, and drop-in
    # replacements like the long-form CP attention that keep the layout):
    # kernels are [d, heads, head_dim] for q/k/v and [heads, head_dim, d]
    # for out — heads shard over the model axis.
    shape = getattr(leaf, "shape", ())
    if parent in ("query", "key", "value"):
        if name == "kernel" and len(shape) == 3:
            return P(None, MODEL_AXIS, None)
        if name == "bias" and len(shape) == 2:
            return P(MODEL_AXIS, None)
    if parent == "out":
        if name == "kernel" and len(shape) == 3:
            return P(MODEL_AXIS, None, None)
        if name == "bias":
            return P()
    if parent == "out_proj":                     # wide d_model → 1024
        return P(None, MODEL_AXIS) if name == "kernel" else P(MODEL_AXIS)
    return P()


def tp_param_specs(params, model_parallel: int):
    """Pytree of ``PartitionSpec`` per param leaf.

    Leaves whose TP-axis size does not divide ``model_parallel`` fall back to
    replication (e.g. an odd head count) — correctness first.
    """
    flat = flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = _spec_for(path, leaf)
        if spec != P():
            shape = getattr(leaf, "shape", ())
            ok = all(
                axis is None or (dim % model_parallel == 0)
                for dim, axis in zip(shape, spec)
            )
            if not ok:
                spec = P()
        out[path] = spec
    return unflatten_dict(out)


def shard_params(mesh: Mesh, params, model_parallel: int | None = None):
    """Place every param leaf on ``mesh``: TP specs on the wide layers,
    replication everywhere else.  Idempotent for already-placed arrays."""
    if model_parallel is None:
        model_parallel = mesh.shape[MODEL_AXIS]
    if model_parallel <= 1:
        rep = NamedSharding(mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, rep), params)
    specs = tp_param_specs(params, model_parallel)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def replicate_tree(mesh: Mesh, tree):
    """Replicate an arbitrary pytree (batch_stats, opt aux) over the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
