"""On-device CTC *prefix* beam search (vmap-able ``lax.scan``).

``ops/beam_search.py`` reproduces the reference's decoder exactly
(reference beam_search.py:2-42): a beam over *un-collapsed frame paths*,
collapsed only at the end.  That decoder cannot sum the probability of the
many alignments that collapse to the same transcript, so it systematically
under-scores short/repeat-heavy hypotheses — the textbook failure is
``P(blank)=0.6, P(a)=0.4`` per frame, where the best transcript is "a"
(mass 0.64) but every path beam returns "" (best path 0.36).

This module implements the correct decoder — prefix beam search (Hannun et
al., 2014, "First-Pass Large Vocabulary Continuous Speech Recognition using
Bi-Directional Recurrent DNNs"): beams are *collapsed label prefixes*, each
carrying two log-masses, ``p_b`` (alignments ending in blank) and ``p_nb``
(ending in the prefix's last label), recursed per frame:

  stay     p_b'(A)   ⊕= (p_b(A) ⊕ p_nb(A)) · P(blank)
  repeat   p_nb'(A)  ⊕= p_nb(A) · P(ℓ)            ℓ = last label of A
  split    p_nb'(A+ℓ)⊕= p_b(A) · P(ℓ)             (blank separated the repeat)
  extend   p_nb'(A+c)⊕= (p_b(A) ⊕ p_nb(A)) · P(c)  c ≠ ℓ

TPU mechanics mirror ``beam_search.py``: prefixes live in a ``[W, T]``
buffer padded with −1 (canonical, so content equality ≡ prefix equality),
per-frame candidates are ``W·(K+1)`` static rows (one stay + top-``K``
emission extensions per beam), duplicates merge by masked log-sum-exp into
the first occurrence, and frames past ``length`` leave the state untouched.
Everything is one ``lax.scan`` — no host syncs (the motivation for moving
decode on-device in the first place, SURVEY.md §3.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _logaddexp(a, b):
    """log(e^a + e^b), safe at the -inf sentinel."""
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, _NEG_INF / 2)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
    return jnp.where(m <= _NEG_INF / 2, _NEG_INF, out)


def _group_logsumexp(eq, vals):
    """Per-row masked log-sum-exp of ``vals`` over each row's group ``eq``."""
    masked = jnp.where(eq, vals[None, :], _NEG_INF)
    m = jnp.max(masked, axis=1)
    m_safe = jnp.maximum(m, _NEG_INF / 2)
    s = m_safe + jnp.log(jnp.sum(jnp.exp(masked - m_safe[:, None]), axis=1))
    return jnp.where(m <= _NEG_INF / 2, _NEG_INF, s)


def _make_step(W: int, C: int, K: int, V: int, blank_id: int, length,
               lm=None, lm_weight=0.0, length_bonus=0.0):
    """The per-frame prefix-beam recursion over a ``[W, C]`` prefix buffer.

    Shared by the offline decoder (C = T, one scan over the utterance) and
    the streaming continuation (C = transcript capacity, one scan per chunk
    starting from carried beam state).  ``length`` masks frames ≥ length to
    identity.
    """
    M = W * (K + 1)
    cols = jnp.arange(C, dtype=jnp.int32)

    def step(carry, inp):
        prefixes, lens, pb, pnb = carry
        lp, t = inp

        total = _logaddexp(pb, pnb)                                   # [W]
        last = prefixes[jnp.arange(W), jnp.maximum(lens - 1, 0)]      # [W]
        has_last = lens > 0
        lp_last = jnp.where(has_last, jnp.take(lp, jnp.maximum(last, 0)),
                            _NEG_INF)

        # Stay: blank keeps (p_b+p_nb); repeating the last label keeps p_nb.
        stay_pb = total + lp[blank_id]
        stay_pnb = pnb + lp_last

        # Extend with the frame's top-K tokens (blank masked out — its mass
        # is the stay candidate's p_b).
        top_vals, top_ids = jax.lax.top_k(lp, K)                      # [K]
        c = jnp.broadcast_to(top_ids[None, :], (W, K))                # [W, K]
        pc = jnp.broadcast_to(top_vals[None, :], (W, K))
        is_blank = c == blank_id
        same = (c == last[:, None]) & has_last[:, None]
        base = jnp.where(same, pb[:, None], total[:, None])           # split vs extend
        ext_pnb = jnp.where(is_blank, _NEG_INF, base + pc)
        if lm is not None:
            ctx = jnp.where(has_last, last, V)                        # BOS = V
            lm_bonus = lm_weight * lm[ctx[:, None], c] + length_bonus
            ext_pnb = jnp.where(is_blank, _NEG_INF, ext_pnb + lm_bonus)
        at_end = cols[None, :] == lens[:, None]                       # [W, C]
        ext_prefixes = jnp.where(at_end[:, None, :], c[:, :, None],
                                 prefixes[:, None, :])                # [W, K, C]
        full = lens >= C                                              # buffer full
        ext_pnb = jnp.where(full[:, None], _NEG_INF, ext_pnb)

        cand_prefixes = jnp.concatenate(
            [prefixes[:, None, :], ext_prefixes], axis=1).reshape(M, C)
        cand_lens = jnp.concatenate(
            [lens[:, None], jnp.minimum(lens + 1, C)[:, None].repeat(K, 1)],
            axis=1).reshape(M)
        cand_pb = jnp.concatenate(
            [stay_pb[:, None], jnp.full((W, K), _NEG_INF)], axis=1).reshape(M)
        cand_pnb = jnp.concatenate(
            [stay_pnb[:, None], ext_pnb], axis=1).reshape(M)

        # Merge identical prefixes (−1 padding is canonical, so content
        # equality is prefix equality): log-sum-exp both masses into the
        # first occurrence, kill the rest.
        eq = jnp.all(cand_prefixes[:, None, :] == cand_prefixes[None, :, :],
                     axis=-1)
        idx = jnp.arange(M)
        is_first = ~jnp.any(eq & (idx[None, :] < idx[:, None]), axis=1)
        merged_pb = jnp.where(is_first, _group_logsumexp(eq, cand_pb), _NEG_INF)
        merged_pnb = jnp.where(is_first, _group_logsumexp(eq, cand_pnb), _NEG_INF)

        order = jnp.argsort(-_logaddexp(merged_pb, merged_pnb), stable=True)[:W]
        new = (cand_prefixes[order], cand_lens[order],
               merged_pb[order], merged_pnb[order])

        # Frames past this sample's length are identity.
        keep = t < length
        out = jax.tree.map(
            lambda n, o: jnp.where(
                jnp.reshape(keep, (1,) * n.ndim), n, o), new,
            (prefixes, lens, pb, pnb))
        return out, None

    return step


def _prefix_beam_single(log_probs, length, beam_width: int, top_k: int,
                        blank_id: int, lm=None, lm_weight=0.0,
                        length_bonus=0.0):
    """``log_probs: [T, V]`` → ``(prefix [T] (-1 padded), prefix_len, score)``.

    With ``lm`` (a ``[V+1, V]`` bigram log-prob table, last row = BOS
    context — text/ngram_lm.py), every candidate that EMITS a token ``c``
    carries an extra ``lm_weight·log P_lm(c | last)`` + ``length_bonus``
    (shallow fusion; the bonus counters the LM's short-transcript bias).
    Stay/repeat candidates add no token and get no bonus, so the cumulative
    beam score is ``log P_am + α·log P_lm(prefix) + β·|prefix|`` exactly.
    """
    T, V = log_probs.shape
    W, K = beam_width, min(top_k, V)
    log_probs = jnp.asarray(log_probs, jnp.float32)

    state0 = prefix_beam_state_init(W, T)
    step = _make_step(W, T, K, V, blank_id, length, lm, lm_weight, length_bonus)
    ts = jnp.arange(T, dtype=jnp.int32)
    (prefixes, lens, pb, pnb), _ = jax.lax.scan(step, state0, (log_probs, ts))
    return prefixes[0], lens[0], _logaddexp(pb, pnb)[0]


def prefix_beam_state_init(beam_width: int, capacity: int):
    """Fresh beam state ``(prefixes [W, C], lens, p_b, p_nb)``: one live beam
    (the empty prefix, all-blank mass 1)."""
    return (
        jnp.full((beam_width, capacity), -1, jnp.int32),
        jnp.zeros((beam_width,), jnp.int32),
        jnp.full((beam_width,), _NEG_INF).at[0].set(0.0),
        jnp.full((beam_width,), _NEG_INF),
    )


@functools.partial(
    jax.jit, static_argnames=("top_k", "blank_id"))
def prefix_beam_stream_step(
    state,
    log_probs: jnp.ndarray,
    length,
    top_k: int = 8,
    blank_id: int = 3,
    lm: jnp.ndarray | None = None,
    lm_weight: float = 0.0,
    length_bonus: float = 0.0,
):
    """Continue a prefix beam over one CHUNK of frames (streaming decode).

    ``state`` is ``prefix_beam_state_init(W, C)`` or a previous return; the
    prefix buffer capacity ``C`` is independent of the chunk length, so an
    unbounded stream decodes at ONE compiled shape per chunk size.  Feeding
    chunks ``[lp1; lp2; …]`` is mathematically identical to one offline pass
    over their concatenation (tests/test_streaming.py) — CTC's per-frame
    recursion carries all its state in ``(prefixes, p_b, p_nb)``.

    Args:
      log_probs: ``[T_chunk, V]`` log-softmaxed scores for the new frames.
      length: valid frame count (≤ T_chunk; rest are identity).
    Returns the advanced state.
    """
    prefixes, lens, pb, pnb = state
    W, C = prefixes.shape
    log_probs = jnp.asarray(log_probs, jnp.float32)
    T, V = log_probs.shape
    if lm is not None:
        lm = jnp.asarray(lm, jnp.float32)
    step = _make_step(W, C, min(top_k, V), V, blank_id,
                      jnp.asarray(length, jnp.int32), lm, lm_weight,
                      length_bonus)
    ts = jnp.arange(T, dtype=jnp.int32)
    new_state, _ = jax.lax.scan(step, (prefixes, lens, pb, pnb),
                                (log_probs, ts))
    return new_state


@functools.partial(
    jax.jit, static_argnames=("beam_width", "top_k", "blank_id", "pad_id"))
def prefix_beam_search_decode(
    log_probs: jnp.ndarray,
    lengths: jnp.ndarray,
    beam_width: int = 5,
    top_k: int = 8,
    blank_id: int = 3,
    pad_id: int = -1,
    lm: jnp.ndarray | None = None,
    lm_weight: float = 0.0,
    length_bonus: float = 0.0,
):
    """Batched CTC prefix beam search, fully on device.

    Args:
      log_probs: ``[B, T, V]`` log-softmaxed scores.
      lengths: ``[B]`` valid frame counts.
      beam_width: number of collapsed prefixes kept per frame.
      top_k: emission tokens considered per frame (pruning; ``V`` = exact).
      lm / lm_weight / length_bonus: optional shallow fusion with a bigram
        LM table ``[V+1, V]`` (text/ngram_lm.py; last row = BOS context):
        beams rank on ``log P_am + lm_weight·log P_lm + length_bonus·|y|``.
    Returns:
      ``(ids [B, T] label ids padded with pad_id, out_lengths [B],
      log_scores [B])`` — ids are already collapsed (prefixes are label
      sequences, unlike ``beam_search_decode``'s frame paths).
    """
    log_probs = jnp.asarray(log_probs, jnp.float32)
    lengths = jnp.asarray(lengths, jnp.int32)
    if lm is not None:
        lm = jnp.asarray(lm, jnp.float32)
    ids, out_len, score = jax.vmap(
        lambda lp, n: _prefix_beam_single(lp, n, beam_width, top_k, blank_id,
                                          lm, lm_weight, length_bonus)
    )(log_probs, lengths)
    T = ids.shape[1]
    ids = jnp.where(jnp.arange(T)[None, :] < out_len[:, None], ids, pad_id)
    return ids, out_len, score
