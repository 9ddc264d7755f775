"""Character-level tokenizer with SentencePiece ``.vocab`` file semantics.

Re-implements the runtime surface of the reference tokenizer
(reference utils/tokenizer.py:3-41) — which, despite shipping a SentencePiece
``.model``, only ever does per-character vocab lookups:

* vocab file: one ``token<TAB>logprob`` line per id, id = line number
* ``encode``: per *character*; ``' '`` maps to ``'▁'``; unknown chars → ``unk_id``
* ``decode``: ids joined, ``'▁'`` → ``' '``, stripped; out-of-range ids dropped
* special ids on the shipped ``tokenizer800.vocab``: ``unk=0, <s>=1, </s>=2,
  blank=3, ▁=4`` (verified at runtime, SURVEY.md §2 row 5); ``pad_id`` falls
  back to 0 because the vocab has no ``<pad>`` entry.

Also provides :func:`build_char_vocab`, a pure-Python replacement for the
SentencePiece char-level trainer (reference utils/train_tokenizer.py:5-23):
it emits the same special-token header and frequency-sorted character
inventory, so new datasets can be tokenized without the C++ dependency.
"""

from __future__ import annotations

import os
from collections import Counter
from typing import Iterable, Sequence

import numpy as np

_SP_SPACE = "▁"  # '▁'


class CharTokenizer:
    """Loads a tab-separated ``.vocab`` file into token↔id maps."""

    def __init__(self, vocab_path: str):
        self.vocab_path = vocab_path       # kept for artifact export (infer.py)
        self.token_to_id: dict[str, int] = {}
        self.id_to_token: list[str] = []
        with open(vocab_path, "r", encoding="utf-8") as f:
            for idx, line in enumerate(f):
                token = line.rstrip("\n").split("\t")[0]
                self.token_to_id.setdefault(token, idx)
                self.id_to_token.append(token)

    # -- core surface (reference utils/tokenizer.py:14-25) --------------------

    def encode(self, text: str) -> list[int]:
        unk = self.unk_id
        t2i = self.token_to_id
        return [t2i.get(_SP_SPACE if ch == " " else ch, unk) for ch in text]

    def decode(self, ids: Iterable[int]) -> str:
        n = len(self.id_to_token)
        toks = [self.id_to_token[i] for i in ids if 0 <= i < n]
        return "".join(toks).replace(_SP_SPACE, " ").strip()

    def decode_ctc(self, ids: Iterable[int]) -> str:
        """id→text skipping blanks without CTC merge — the surface of
        reference beam_search.py:45-49 (``fast_decode``)."""
        blank = self.blank_id
        n = len(self.id_to_token)
        toks = [self.id_to_token[i] for i in ids if i != blank and 0 <= i < n]
        return "".join(toks).replace(_SP_SPACE, " ").strip()

    # -- arrays, for the device pipeline --------------------------------------

    def encode_array(self, text: str, pad_to: int | None = None) -> np.ndarray:
        ids = self.encode(text)
        if pad_to is not None:
            if len(ids) > pad_to:
                ids = ids[:pad_to]
            ids = ids + [self.pad_id] * (pad_to - len(ids))
        return np.asarray(ids, dtype=np.int32)

    # -- properties (reference utils/tokenizer.py:27-41) ----------------------

    @property
    def vocab_size(self) -> int:
        return len(self.id_to_token)

    @property
    def pad_id(self) -> int:
        return self.token_to_id.get("<pad>", 0)

    @property
    def blank_id(self) -> int:
        return self.token_to_id.get("<blank>", 0)

    @property
    def unk_id(self) -> int:
        return self.token_to_id.get("<unk>", 0)


# Back-compat alias mirroring the reference class name.
Tokenizer = CharTokenizer


def build_char_vocab(
    texts: Iterable[str],
    vocab_size: int = 800,
    specials: Sequence[str] = ("<unk>", "<s>", "</s>", "<blank>"),
) -> list[tuple[str, float]]:
    """Frequency-sorted char vocab with the SentencePiece-style header.

    Mirrors the observable output of the reference trainer
    (reference utils/train_tokenizer.py:5-23: char-level model, vocab 800,
    user_defined ``<blank>`` and space, character_coverage 1.0): specials get
    score 0, ``▁`` then characters get pseudo-logprobs from corpus frequency.
    """
    counts: Counter[str] = Counter()
    for text in texts:
        for ch in text.strip():
            counts[_SP_SPACE if ch == " " else ch] += 1
    total = sum(counts.values()) or 1
    entries: list[tuple[str, float]] = [(s, 0.0) for s in specials]
    seen = set(specials)
    # Space first (matches user_defined_symbols ordering in the artifact: id 4).
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    if _SP_SPACE in counts:
        ordered = [(_SP_SPACE, counts[_SP_SPACE])] + [
            (t, c) for t, c in ordered if t != _SP_SPACE
        ]
    for tok, c in ordered:
        if tok in seen:
            continue
        entries.append((tok, float(np.log(c / total))))
        seen.add(tok)
        if len(entries) >= vocab_size:
            break
    return entries


def write_vocab(entries: Sequence[tuple[str, float]], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for tok, score in entries:
            f.write(f"{tok}\t{score:g}\n")


def train_tokenizer_from_txt_folder(
    txt_folder: str, vocab_path: str, vocab_size: int = 800
) -> CharTokenizer:
    """End-to-end equivalent of reference utils/train_tokenizer.py:5-23."""
    texts = []
    for name in sorted(os.listdir(txt_folder)):
        if name.endswith(".txt"):
            with open(os.path.join(txt_folder, name), "r", encoding="utf-8") as f:
                texts.append(f.read())
    write_vocab(build_char_vocab(texts, vocab_size=vocab_size), vocab_path)
    return CharTokenizer(vocab_path)
