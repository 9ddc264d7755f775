"""Post-training int8 weight quantization for serving.

The reference has no quantization story — it trains and serves fp32 torch
modules (reference model/trainer.py keeps everything in default dtype; its
only precision machinery is cuda.amp's GradScaler, reference main.py, which
is a *training* tool).  For TPU serving the win is HBM: per-channel symmetric
int8 weights cut parameter bytes 2x vs bf16 (4x vs the reference's fp32) —
checkpoint size, host->device transfer, and device residency all halve,
which is what lets a reference-scale audio tower (317M params,
reference model/encoder.py:83) serve on a single v5e chip with room for
activations.

Scheme: per-output-channel symmetric int8 ("weight-only" quantization, the
standard serving recipe).  Only matmul/conv kernels are quantized — biases,
norm scales, PReLU alphas and other small vectors stay fp32; they are a
rounding error of the byte budget and quantizing them costs accuracy for
nothing.  At apply time the kernels are dequantized inside the jitted serve
function (int8 -> bf16 multiply by the per-channel scale); XLA fuses the
dequant into the consumer where profitable.  Quality is measured, not
assumed: benchmarks/quantized_serving.py trains a real-transcript acoustic
model and shows the int8 CER delta.

The quantized form is two pytrees with a stable layout:
  * ``qtree``  — same treedef as the input params; quantized leaves are int8;
  * ``scales`` — flat dict {"path/to/leaf": [1,...,C] float32 scale}.
Both are ordinary pytrees: they jit-trace, checkpoint (msgpack), and export
(StableHLO) without any custom node machinery.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _path_key(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def _reduce_axes(leaf) -> tuple:
    """Axes to reduce for the per-output-channel scale.

    2D kernels ([in, out] Dense, LSTM gate kernels) and convs
    ([window..., in, out]) keep only the trailing output axis.  3D kernels
    are flax ``DenseGeneral`` attention projections ([in, heads, head_dim]
    or [heads, head_dim, out]); reducing only axis 0 keeps the finest
    per-output granularity in both orientations.
    """
    if leaf.ndim == 3:
        return (0,)
    return tuple(range(leaf.ndim - 1))


def default_predicate(path, leaf, min_size: int = 4096) -> bool:
    """Quantize float matmul/conv kernels big enough to matter."""
    if leaf.ndim < 2 or leaf.size < min_size:
        return False
    if not jnp.issubdtype(leaf.dtype, jnp.floating):
        return False
    name = str(getattr(path[-1], "key", path[-1])) if path else ""
    return name.endswith("kernel")


def quantize_tree(params, min_size: int = 4096):
    """params pytree -> (qtree, scales).

    ``qtree`` has the same treedef as ``params``; quantized leaves become
    int8, everything else passes through unchanged.  ``scales`` maps the
    quantized leaves' path keys to broadcastable float32 scale arrays.
    """
    scales: dict[str, Any] = {}

    def q(path, leaf):
        leaf = jnp.asarray(leaf)
        if not default_predicate(path, leaf, min_size):
            return leaf
        axes = _reduce_axes(leaf)
        w = leaf.astype(jnp.float32)
        s = jnp.max(jnp.abs(w), axis=axes, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-12)
        qv = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        scales[_path_key(path)] = s
        return qv

    qtree = jax.tree_util.tree_map_with_path(q, params)
    return qtree, scales


def dequantize_tree(qtree, scales, dtype=jnp.bfloat16):
    """Inverse of ``quantize_tree`` (jit-traceable; membership in ``scales``
    is static so the compiled graph has no branching)."""

    def d(path, leaf):
        s = scales.get(_path_key(path))
        if s is None:
            return leaf
        return (leaf.astype(jnp.float32) * s).astype(dtype)

    return jax.tree_util.tree_map_with_path(d, qtree)


def quantize_variables(variables, min_size: int = 4096):
    """Quantize the ``params`` collection of a flax variables dict; other
    collections (batch_stats, ...) pass through untouched.

    Returns ``(qvariables, scales)`` where ``dequantize_variables`` restores
    an apply-ready variables dict.
    """
    variables = dict(variables)
    qparams, scales = quantize_tree(variables["params"], min_size)
    qvariables = {**variables, "params": qparams}
    return qvariables, scales


def dequantize_variables(qvariables, scales, dtype=jnp.bfloat16):
    qvariables = dict(qvariables)
    qvariables["params"] = dequantize_tree(qvariables["params"], scales, dtype)
    return qvariables


def tree_bytes(tree) -> int:
    return int(sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(tree)
                   if hasattr(x, "dtype")))


def quantization_report(params, qtree, scales) -> dict:
    """Byte accounting for logs / benchmark JSONs."""
    fp32 = int(sum(x.size * 4 for x in jax.tree.leaves(params)))
    qbytes = tree_bytes(qtree) + tree_bytes(scales)
    return {
        "n_quantized": len(scales),
        "fp32_bytes": fp32,
        "bf16_bytes": fp32 // 2,
        "int8_bytes": qbytes,
        "vs_fp32": round(fp32 / qbytes, 2),
        "vs_bf16": round(fp32 / 2 / qbytes, 2),
    }
