"""Korean syllable-level vocabulary (legacy-v0 parity) and jamo utilities.

Capability-equivalent of reference 이전 버전/utils/korean_vocab_utils.py:28-43:
the full Hangul syllable block U+AC00–U+D7A3 (11,172 syllables) with
``<blank>`` at id 0, plus text↔index round-tripping that silently drops
characters outside the block.
"""

from __future__ import annotations

from typing import Iterable

_HANGUL_START = 0xAC00
_HANGUL_END = 0xD7A3  # inclusive


class KoreanSyllableVocab:
    blank_id = 0

    def __init__(self) -> None:
        self.vocab = ["<blank>"] + [chr(c) for c in range(_HANGUL_START, _HANGUL_END + 1)]
        self._char2idx = {ch: i for i, ch in enumerate(self.vocab)}

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def text_to_indices(self, text: str) -> list[int]:
        c2i = self._char2idx
        return [c2i[ch] for ch in text if ch in c2i]

    def indices_to_text(self, indices: Iterable[int]) -> str:
        return "".join(self.vocab[i] for i in indices if i != 0)


def is_hangul_syllable(ch: str) -> bool:
    return _HANGUL_START <= ord(ch) <= _HANGUL_END


# Compatibility jamo inventories (the choseong/jungseong/jongseong the legacy
# util lists, 이전 버전/utils/korean_vocab_utils.py:10-27).
_N_JUNG, _N_JONG = 21, 28

_CHOSEONG = ["ㄱ", "ㄲ", "ㄴ", "ㄷ", "ㄸ", "ㄹ", "ㅁ", "ㅂ", "ㅃ", "ㅅ",
             "ㅆ", "ㅇ", "ㅈ", "ㅉ", "ㅊ", "ㅋ", "ㅌ", "ㅍ", "ㅎ"]
_JUNGSEONG = ["ㅏ", "ㅐ", "ㅑ", "ㅒ", "ㅓ", "ㅔ", "ㅕ", "ㅖ", "ㅗ", "ㅘ",
              "ㅙ", "ㅚ", "ㅛ", "ㅜ", "ㅝ", "ㅞ", "ㅟ", "ㅠ", "ㅡ", "ㅢ", "ㅣ"]
_JONGSEONG = ["", "ㄱ", "ㄲ", "ㄳ", "ㄴ", "ㄵ", "ㄶ", "ㄷ", "ㄹ", "ㄺ",
              "ㄻ", "ㄼ", "ㄽ", "ㄾ", "ㄿ", "ㅀ", "ㅁ", "ㅂ", "ㅄ", "ㅅ",
              "ㅆ", "ㅇ", "ㅈ", "ㅊ", "ㅋ", "ㅌ", "ㅍ", "ㅎ"]


def syllable_to_jamo(ch: str) -> list[str]:
    """Decompose one Hangul syllable into (choseong, jungseong[, jongseong]);
    non-Hangul characters pass through unchanged."""
    if not is_hangul_syllable(ch):
        return [ch]
    idx = ord(ch) - _HANGUL_START
    cho, rem = divmod(idx, _N_JUNG * _N_JONG)
    jung, jong = divmod(rem, _N_JONG)
    out = [_CHOSEONG[cho], _JUNGSEONG[jung]]
    if jong:
        out.append(_JONGSEONG[jong])
    return out


def text_to_jamo(text: str) -> list[str]:
    out: list[str] = []
    for ch in text:
        out.extend(syllable_to_jamo(ch))
    return out


def jamo_error_rate(references, hypotheses) -> float:
    """Jamo-level CER — the finest-grained Korean error metric: a single
    vowel mistake costs 1/3 of a syllable instead of a whole character."""
    from ..ops.metrics import rate_from_counts

    return rate_from_counts(*jamo_counts(references, hypotheses))


def jamo_counts(references, hypotheses) -> tuple[int, int]:
    """(edit distance, reference length) at the jamo level — summable across
    data shards before dividing (multi-host eval aggregation)."""
    from ..ops.metrics import _corpus_counts

    if isinstance(references, str):
        references, hypotheses = [references], [hypotheses]
    return _corpus_counts(
        [text_to_jamo(" ".join(r.split())) for r in references],
        [text_to_jamo(" ".join(h.split())) for h in hypotheses],
    )
