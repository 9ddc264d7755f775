"""Word/character error-rate metrics (pure Python/NumPy).

Replaces the reference's jiwer dependency (RapidFuzz C++,
reference model/trainer.py:4,246-249).  ``wer`` is corpus-aggregated like
``jiwer.wer(refs, hyps)``: total edit distance over total reference words.
``cer`` is the Korean-appropriate headline metric the reference lacks
(SURVEY.md §5 metrics row): character-level, with whitespace runs collapsed
so spacing conventions don't dominate the score.
"""

from __future__ import annotations

from typing import Sequence


def levenshtein_py(a: Sequence, b: Sequence) -> int:
    """Pure-Python edit distance (O(len(a)·len(b)), two rows)."""
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Edit distance; dispatches to the native C++ kernel (runtime/hostops.cpp)
    when available, mapping arbitrary hashable tokens to int codes first."""
    try:
        from ..runtime import native
    except ImportError:
        return levenshtein_py(a, b)
    if not native.have_native():
        return levenshtein_py(a, b)
    codes: dict = {}
    enc = [codes.setdefault(t, len(codes)) for t in a]
    enc_b = [codes.setdefault(t, len(codes)) for t in b]
    return native.levenshtein(enc, enc_b)


def _corpus_counts(ref_seqs: list, hyp_seqs: list) -> tuple[int, int]:
    """(total edit distance, total reference length) — the additive form of
    the corpus rate, summable across data shards/processes before dividing."""
    total_dist = sum(levenshtein(r, h) for r, h in zip(ref_seqs, hyp_seqs))
    total_len = sum(len(r) for r in ref_seqs)
    return total_dist, total_len


def rate_from_counts(total_dist: float, total_len: float) -> float:
    if total_len == 0:
        return 0.0 if total_dist == 0 else float("inf")
    return total_dist / total_len


def _corpus_rate(ref_seqs: list, hyp_seqs: list) -> float:
    return rate_from_counts(*_corpus_counts(ref_seqs, hyp_seqs))


def wer_counts(references: Sequence[str], hypotheses: Sequence[str]) -> tuple[int, int]:
    return _corpus_counts([r.split() for r in references],
                          [h.split() for h in hypotheses])


def cer_counts(references: Sequence[str], hypotheses: Sequence[str],
               remove_spaces: bool = False) -> tuple[int, int]:
    def norm(s: str) -> str:
        s = " ".join(s.split())
        return s.replace(" ", "") if remove_spaces else s

    return _corpus_counts([list(norm(r)) for r in references],
                          [list(norm(h)) for h in hypotheses])


def wer(references: Sequence[str] | str, hypotheses: Sequence[str] | str) -> float:
    """Corpus word error rate over whitespace-split words (jiwer semantics)."""
    if isinstance(references, str):
        references, hypotheses = [references], [hypotheses]  # type: ignore[list-item]
    return _corpus_rate([r.split() for r in references], [h.split() for h in hypotheses])


def cer(
    references: Sequence[str] | str,
    hypotheses: Sequence[str] | str,
    remove_spaces: bool = False,
) -> float:
    """Corpus character error rate; whitespace runs collapse to one space."""
    if isinstance(references, str):
        references, hypotheses = [references], [hypotheses]  # type: ignore[list-item]

    def norm(s: str) -> str:
        s = " ".join(s.split())
        return s.replace(" ", "") if remove_spaces else s

    return _corpus_rate([list(norm(r)) for r in references], [list(norm(h)) for h in hypotheses])
