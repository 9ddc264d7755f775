"""Pipeline parallelism: GPipe-style microbatch pipelining of the Conformer
stack over a mesh ``pipe`` axis.

The reference is single-device (SURVEY.md §2c) — this layer exists for the
configuration the reference *buys* rather than trains: a wav2vec2-LARGE-scale
audio tower (24 layers, d=1024, ~580 M params, reference model/encoder.py:83).
At that scale one chip holds the tower but a pod wants it split; the
TPU-native split is layers-over-devices with microbatches in flight:

* the L identical ``ConformerBlock``s are STACKED — every parameter leaf gets
  a leading ``[L]`` stage axis — and sharded ``P('pipe')`` over the mesh, so
  device ``s`` holds layers ``[s·L/S, (s+1)·L/S)`` and nothing else;
* inside ``shard_map`` each device applies its own layer slice with a
  ``lax.scan`` (weight-stationary: params never move), then hands its
  activation to the next stage with a single ``ppermute`` hop — neighbour
  traffic only, the cheapest collective on an ICI torus;
* a batch of B utterances runs as M microbatches; the classic GPipe schedule
  fills and drains in ``M + S - 1`` ticks (bubble fraction ``(S-1)/(M+S-1)``);
* the whole schedule is one ``lax.scan`` under jit — no data-dependent
  Python control flow, shapes static throughout;
* backward needs no hand-scheduling: autodiff through
  ``shard_map``+``ppermute``+``scan`` yields the reverse pipeline (the
  transpose of a ``ppermute`` is the reverse ``ppermute``), and the final
  stage-broadcast ``psum`` transposes to the gradient scatter.

Composes with data parallelism: on a ``('data', 'pipe')`` mesh the
microbatch axis shards over ``data`` and each data slice runs its own
pipeline; the gradient all-reduce over ``data`` is inserted by XLA as usual.

Tensor parallelism (parallel/tp.py) covers the *width* of the same tower;
this module covers its *depth*.  Verified against the sequential stack —
forward and parameter gradients — in tests/test_pipeline_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

PIPE_AXIS = "pipe"


def stack_block_params(encoder_params: dict, num_layers: int) -> dict:
    """Restack per-block param subtrees ``block0..block{L-1}`` (the
    AudioEncoder naming, models/audio.py:208) into one subtree whose leaves
    carry a leading ``[L]`` stage axis.

    Works on trained checkpoints: a single-device-trained tower restacks
    losslessly into the pipelined layout (and back via ``unstack``).
    """
    blocks = [encoder_params[f"block{i}"] for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)


def unstack_block_params(stacked: dict, num_layers: int) -> dict:
    """Inverse of :func:`stack_block_params`."""
    return {
        f"block{i}": jax.tree.map(lambda x, i=i: x[i], stacked)
        for i in range(num_layers)
    }


def stacked_param_specs(stacked: dict) -> dict:
    """P('pipe') on every leaf's leading (stage) axis."""
    return jax.tree.map(lambda _: P(PIPE_AXIS), stacked)


def shard_stacked_params(stacked: dict, mesh: Mesh) -> dict:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(PIPE_AXIS))), stacked
    )


def pipeline_blocks(
    block,
    stacked_params: dict,
    x: jax.Array,
    frame_valid: jax.Array,
    attn_mask: jax.Array,
    mesh: Mesh,
    num_microbatches: int,
    data_axis: str | None = None,
):
    """Run ``x`` through the stacked Conformer blocks, pipelined over the
    mesh ``pipe`` axis.

    Args:
      block: a constructed ``ConformerBlock`` module (shared hyperparams; its
        params come from ``stacked_params``).  Blocks run deterministic inside
        the pipeline (dropout needs per-layer rng plumbing; at the scale PP
        targets, the tower is usually frozen or SSL-pretrained without it).
      stacked_params: leaves ``[L, ...]`` as from :func:`stack_block_params`,
        placed with :func:`shard_stacked_params`.
      x: ``[B, T, d]`` post-subsampler activations.
      frame_valid: ``[B, T]`` bool.
      attn_mask: ``[B, 1, T, T]`` (or broadcastable) attention mask.
      mesh: mesh containing a ``pipe`` axis (optionally a data axis too).
      num_microbatches: M; B must divide by M (and by the data-axis size
        when ``data_axis`` is given).

    Returns ``[B, T, d]`` — identical (up to dtype rounding) to applying the
    L blocks sequentially.
    """
    S = mesh.shape[PIPE_AXIS]
    M = num_microbatches
    B, T, d = x.shape
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = B // M

    xs = x.reshape(M, mb, T, d)
    valid = frame_valid.reshape(M, mb, *frame_valid.shape[1:])
    amask = jnp.broadcast_to(attn_mask, (B, *attn_mask.shape[1:])).reshape(
        M, mb, *attn_mask.shape[1:]
    )

    dspec = data_axis  # batch (microbatch-row) sharding axis or None
    io_spec = P(None, dspec)  # [M, mb, ...]: microbatch slots replicated,
    #                           rows sharded over data when composing with DP

    def body(params_local, xs, valid, amask):
        # params_local leaves: [L/S, ...] — this device's layer slice.
        s = lax.axis_index(PIPE_AXIS)

        def apply_stage(x_in, v, am):
            def layer(h, p):
                return block.apply({"params": p}, h, v, am, True), None

            y, _ = lax.scan(layer, x_in, params_local)
            return y

        state = jnp.zeros_like(xs[0])

        def step(carry, t):
            state, outs = carry
            mb_in = jnp.clip(t, 0, M - 1)          # stage 0's feed
            mb_cur = jnp.clip(t - s, 0, M - 1)     # microbatch at this stage
            x_in = jnp.where(s == 0, xs[mb_in], state)
            y = apply_stage(x_in, valid[mb_cur], amask[mb_cur])
            out_idx = t - (S - 1)
            write = (s == S - 1) & (out_idx >= 0) & (out_idx < M)
            idx = jnp.clip(out_idx, 0, M - 1)
            outs = outs.at[idx].set(jnp.where(write, y, outs[idx]))
            state = lax.ppermute(
                y, PIPE_AXIS, [(i, (i + 1) % S) for i in range(S)]
            )
            return (state, outs), None

        outs = jnp.zeros_like(xs)
        (state, outs), _ = lax.scan(
            step, (state, outs), jnp.arange(M + S - 1)
        )
        # Results live on the last stage only; zero elsewhere + psum is a
        # broadcast whose transpose is the matching gradient scatter.
        outs = lax.psum(jnp.where(s == S - 1, outs, jnp.zeros_like(outs)),
                        PIPE_AXIS)
        return outs

    out_specs = io_spec
    pipelined = shard_map(
        body,
        mesh=mesh,
        in_specs=(stacked_param_specs(stacked_params), io_spec,
                  io_spec, io_spec),
        out_specs=out_specs,
        check_vma=False,
    )
    outs = pipelined(stacked_params, xs, valid, amask)
    return outs.reshape(B, T, d)


def bubble_fraction(num_stages: int, num_microbatches: int) -> float:
    """GPipe fill/drain overhead: (S-1)/(M+S-1)."""
    return (num_stages - 1) / (num_microbatches + num_stages - 1)
