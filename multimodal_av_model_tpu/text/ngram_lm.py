"""Character bigram language model for shallow fusion.

Production CTC systems rescore the acoustic model with an external LM at
decode time (shallow fusion: ``log P_am + α·log P_lm + β·|y|``).  The
reference has no LM at all — its beam search ranks on acoustic scores only
(reference beam_search.py:2-42).  This module trains a smoothed bigram over
token-id sequences (e.g. the corpus transcripts) and exports it as a dense
``[V+1, V]`` log-probability matrix the on-device prefix beam consumes
directly (`ops/prefix_beam_search.py`): row ``v`` is the distribution of the
next token after token ``v``; the extra LAST row is the BOS context.

A bigram is deliberately modest: it is the largest n-gram whose full score
table still fits HBM as one dense matrix (800² floats), which keeps LM
lookup a single gather inside the decode scan — no host callbacks.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np


def train_bigram_lm(
    sequences: Iterable[Sequence[int]],
    vocab_size: int,
    add_k: float = 0.5,
) -> np.ndarray:
    """Add-k–smoothed bigram log-probabilities.

    Args:
      sequences: iterable of token-id sequences (each a transcript).
      vocab_size: V; ids outside ``[0, V)`` are ignored.
      add_k: Laplace smoothing mass per (context, token) cell.

    Returns ``[V+1, V]`` float32 log-probs; row ``V`` is the BOS context.
    Every row is a normalized distribution (logsumexp == 0).
    """
    V = vocab_size
    counts = np.zeros((V + 1, V), np.float64)
    for seq in sequences:
        prev = V                               # BOS
        for t in seq:
            t = int(t)
            if not 0 <= t < V:
                continue
            counts[prev, t] += 1.0
            prev = t
    probs = (counts + add_k) / (counts.sum(axis=1, keepdims=True) + add_k * V)
    return np.log(probs).astype(np.float32)


def save_bigram_lm(path: str, lm: np.ndarray) -> None:
    np.save(path, lm)


def load_bigram_lm(path: str) -> np.ndarray:
    lm = np.load(path)
    if lm.ndim != 2 or lm.shape[0] != lm.shape[1] + 1:
        raise ValueError(f"not a bigram LM table: shape {lm.shape}")
    return lm.astype(np.float32)


def mean_token_logprob(lm: np.ndarray, sequences: Iterable[Sequence[int]]) -> float:
    """Average per-token log-probability of a corpus under the bigram.

    Shallow fusion adds ``α·log P_lm`` per EMITTED token — always negative,
    so it acts as a deletion-biased length penalty unless offset.  The
    principled insertion bonus is ``β = -α · mean_token_logprob`` (zero-mean
    the LM term over typical text); pass it as ``decode.length_bonus``.
    """
    V = lm.shape[1]
    total, n = 0.0, 0
    for seq in sequences:
        prev = V
        for t in seq:
            t = int(t)
            if not 0 <= t < V:
                continue
            total += float(lm[prev, t])
            prev = t
            n += 1
    return total / max(n, 1)


def sequence_logprob(lm: np.ndarray, seq: Sequence[int]) -> float:
    """Log-probability of a token sequence under the bigram (BOS context)."""
    V = lm.shape[1]
    prev, total = V, 0.0
    for t in seq:
        total += float(lm[prev, int(t)])
        prev = int(t)
    return total
