"""ZeRO/FSDP-style parameter + optimizer-state sharding over the data axis.

The reference is single-device (SURVEY.md §2c) — this is a from-scratch TPU
design, the standard GSPMD recipe (jax-ml "How to Scale Your Model"): instead
of a wrapper class that manually gathers/scatters (torch FSDP), each parameter
leaf simply CARRIES a ``NamedSharding`` that splits its largest free dimension
over the mesh ``data`` axis.  Under ``jit`` XLA's SPMD partitioner then:

* all-gathers a layer's shard right before its matmul (forward and backward),
  overlapping the gather with preceding compute,
* reduce-scatters gradients instead of all-reducing them, and
* keeps optimizer state (optax Adam's ``mu``/``nu`` are ``zeros_like`` the
  params, so they inherit the same shardings) permanently sharded —

which is ZeRO-3 semantics with zero model-code changes and no hand-written
collectives.  Per-device memory for params+Adam state drops by ~the data-axis
size; the price is one all-gather per layer per direction, riding ICI.

Composition: TP specs (``parallel/tp.py``) claim the ``model`` axis on the
wide Conformer layers; FSDP then shards a DIFFERENT free dimension of the
same leaf over ``data`` (e.g. an FFN kernel becomes ``P('data', 'model')``).
Small leaves (biases, norm scales) stay replicated — sharding a 512-float
vector buys nothing and costs a collective.

At the reference model's scale (tens of MB) FSDP is optional; it exists for
the wav2vec2-LARGE-scale audio towers (317M params,
/root/reference/model/encoder.py:83, benchmarks/w2v2_scale.py) and beyond,
where replicated Adam state is the first thing to overflow a chip's HBM.
"""

from __future__ import annotations

import jax
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS
from .tp import tp_param_specs

# Leaves below this element count replicate: the all-gather latency on a tiny
# leaf exceeds the HBM it frees (biases, LayerNorm scales, BN stats).
MIN_SHARD_ELEMS = 4096


def fsdp_param_specs(params, data_parallel: int, model_parallel: int = 1,
                     min_shard_elems: int = MIN_SHARD_ELEMS):
    """Pytree of ``PartitionSpec`` per leaf: TP spec (if any) plus the largest
    remaining dimension sharded over ``data``.

    Leaves with no dimension divisible by ``data_parallel`` (after TP claims
    its axis) fall back to the bare TP spec — correctness first, same policy
    as ``tp_param_specs``.
    """
    flat = flatten_dict(params)
    if model_parallel > 1:
        tp = flatten_dict(tp_param_specs(params, model_parallel))
    else:
        tp = {path: P() for path in flat}
    out = {}
    for path, leaf in flat.items():
        shape = tuple(getattr(leaf, "shape", ()))
        spec = list(tp.get(path, P()))
        spec += [None] * (len(shape) - len(spec))
        elems = 1
        for d in shape:
            elems *= d
        if data_parallel > 1 and elems >= min_shard_elems:
            candidates = [
                (shape[i], i) for i in range(len(shape))
                if spec[i] is None and shape[i] % data_parallel == 0
                and shape[i] > 1
            ]
            if candidates:
                _, axis = max(candidates)
                spec[axis] = DATA_AXIS
        while spec and spec[-1] is None:    # P(None) ≡ P(): canonical form
            spec.pop()
        out[path] = P(*spec)
    return unflatten_dict(out)


def shard_params_fsdp(mesh: Mesh, params,
                      min_shard_elems: int = MIN_SHARD_ELEMS):
    """Place every param leaf on ``mesh`` with its FSDP(+TP) sharding."""
    specs = fsdp_param_specs(
        params,
        data_parallel=mesh.shape[DATA_AXIS],
        model_parallel=mesh.shape.get(MODEL_AXIS, 1),
        min_shard_elems=min_shard_elems,
    )
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
