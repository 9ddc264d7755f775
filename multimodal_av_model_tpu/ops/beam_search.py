"""On-device frame-synchronous beam search (vmap-able ``lax.scan``).

Algorithmically identical to the reference's host-Python decoder
(reference beam_search.py:2-42): per frame, take the top ``beam_width`` token
log-probs, extend every beam with each, merge identical label sequences
keeping the max score, keep the top ``beam_width``; CTC collapse
(dedupe + blank-strip) is applied only to the final best sequence.  This is
*label-sequence* beam search, not CTC prefix search — kept deliberately so
outputs match the reference's decoder.

The reference implementation calls ``.item()`` per candidate per frame — a
device→host sync every step that dominates eval time (SURVEY.md §3.2).  Here
the whole search is one ``lax.scan`` on device with static shapes:

* beams are a ``[W, T]`` token buffer + ``[W]`` scores; each frame appends
  exactly one token, so sequence length is implicit;
* merge-by-sequence uses a ``[W·K, W·K]`` pairwise equality over the token
  buffer (W·K = 25: trivial on the VPU) with first-occurrence-wins slots and
  group-max scores — exactly the reference's dict semantics, including stable
  ordering for downstream ties;
* frames past ``length`` extend every beam with a score-0 blank, which the
  final collapse removes — ranking is unchanged, shapes stay static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ctc import ctc_collapse

_NEG_INF = -1e30


def _beam_search_single(log_probs, length, beam_width: int, blank_id: int):
    """``log_probs: [T, V]`` → ``(tokens [T], score)`` best un-collapsed path."""
    T, V = log_probs.shape
    W = beam_width
    log_probs = jnp.asarray(log_probs, jnp.float32)

    blank_row = jnp.full((V,), _NEG_INF).at[blank_id].set(0.0)

    seqs0 = jnp.full((W, T), -1, dtype=jnp.int32)
    scores0 = jnp.full((W,), _NEG_INF).at[0].set(0.0)

    parent_idx = jnp.repeat(jnp.arange(W), W)              # [W*K], K = W
    WK = W * W

    def step(carry, inp):
        seqs, scores = carry
        lp, t = inp
        lp = jnp.where(t < length, lp, blank_row)
        top_vals, top_ids = jax.lax.top_k(lp, W)

        cand_scores = (scores[:, None] + top_vals[None, :]).reshape(WK)
        cand_tok = jnp.tile(top_ids, W)
        cand_seqs = seqs[parent_idx].at[:, t].set(cand_tok)  # [WK, T]

        eq = jnp.all(cand_seqs[:, None, :] == cand_seqs[None, :, :], axis=-1)
        # Dict-merge semantics: slot at first occurrence, value = group max.
        idx = jnp.arange(WK)
        earlier = eq & (idx[None, :] < idx[:, None])       # [j, i]: i<j dup
        is_first = ~jnp.any(earlier, axis=1)
        group_max = jnp.max(jnp.where(eq, cand_scores[None, :], _NEG_INF), axis=1)
        merged = jnp.where(is_first, group_max, _NEG_INF)

        # Stable top-W (ties keep first-occurrence order, like Python sorted).
        order = jnp.argsort(-merged, stable=True)[:W]
        return (cand_seqs[order], merged[order]), None

    ts = jnp.arange(T, dtype=jnp.int32)
    (seqs, scores), _ = jax.lax.scan(step, (seqs0, scores0), (log_probs, ts))
    return seqs[0], scores[0]


@functools.partial(jax.jit, static_argnames=("beam_width", "blank_id", "pad_id"))
def beam_search_decode(
    log_probs: jnp.ndarray,
    lengths: jnp.ndarray,
    beam_width: int = 5,
    blank_id: int = 3,
    pad_id: int = -1,
):
    """Batched beam search + CTC collapse, fully on device.

    Args:
      log_probs: ``[B, T, V]`` log-softmaxed scores.
      lengths: ``[B]`` valid frame counts (frames past length are ignored).
    Returns:
      ``(ids [B, T] collapsed label ids padded with pad_id, out_lengths [B],
      scores [B])``.
    """
    log_probs = jnp.asarray(log_probs, jnp.float32)
    B, T, _ = log_probs.shape
    lengths = jnp.asarray(lengths, jnp.int32)
    best, score = jax.vmap(
        lambda lp, n: _beam_search_single(lp, n, beam_width, blank_id)
    )(log_probs, lengths)
    ids, out_len = ctc_collapse(best, jnp.full((B,), T, jnp.int32), blank_id, pad_id)
    return ids, out_len, score
