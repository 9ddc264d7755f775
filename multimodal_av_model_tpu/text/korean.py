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
