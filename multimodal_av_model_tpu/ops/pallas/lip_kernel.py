"""Fused Pallas lip-ROI preprocessing: grayscale + bilinear resize + /255.

The device half of the lip pipeline (reference semantics:
``rgb.mean(-1)`` → per-frame ``cv2.resize`` to 96×96 → ``/255``,
dataset/multi_speaker_dataset.py:49-59).  One HBM pass per clip:

* grayscale mean runs on the VPU as the frames stream through VMEM;
* the bilinear resize uses the separable matrix form (ops/resize.py:
  ``resize_matrix``) — two small matmuls per frame on the MXU — because
  gather-based resampling lowers poorly on TPU;
* normalization folds into the second matmul's epilogue.

Layout: frames arrive ``[T, C, H, W]`` (channels split on a leading axis so
the lane dimension is W = 128-friendly).  Grid over frame tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..resize import resize_matrix


def _kernel(frames_ref, ry_ref, rxt_ref, out_ref, *, tile_t: int, channels: int):
    hi = jax.lax.Precision.HIGHEST
    inv_c = 1.0 / channels
    inv255 = 1.0 / 255.0
    for t in range(tile_t):
        g = frames_ref[t, 0, :, :].astype(jnp.float32)
        for c in range(1, channels):
            g = g + frames_ref[t, c, :, :].astype(jnp.float32)
        g = g * inv_c
        rows = jnp.dot(ry_ref[:, :], g, preferred_element_type=jnp.float32,
                       precision=hi)
        out_ref[t, :, :] = (
            jnp.dot(rows, rxt_ref[:, :], preferred_element_type=jnp.float32,
                    precision=hi)
            * inv255
        )


def lip_preprocess_pallas(
    frames,
    out_size: int = 96,
    tile_t: int = 8,
    interpret: bool = False,
):
    """``[T, H, W, C]`` (uint8/float, 0..255) → ``[T, 1, out, out]`` float32.

    Drop-in fused equivalent of ops.resize.lip_frames_preprocess.
    """
    frames = jnp.asarray(frames, jnp.float32)
    T, H, W, C = frames.shape
    frames = jnp.moveaxis(frames, -1, 1)               # [T, C, H, W]

    T_pad = -(-T // tile_t) * tile_t
    if T_pad != T:
        frames = jnp.pad(frames, ((0, T_pad - T), (0, 0), (0, 0), (0, 0)))

    ry = resize_matrix(out_size, H)                    # [out, H]
    rxt = resize_matrix(out_size, W).T.copy()          # [W, out]

    out = pl.pallas_call(
        functools.partial(_kernel, tile_t=tile_t, channels=C),
        grid=(T_pad // tile_t,),
        in_specs=[
            pl.BlockSpec((tile_t, C, H, W), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_size, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, out_size), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, out_size, out_size), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, out_size, out_size), jnp.float32),
        interpret=interpret,
    )(frames, jnp.asarray(ry), jnp.asarray(rxt))

    return out[:T, None, :, :]
