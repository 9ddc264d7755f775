from .tokenizer import CharTokenizer, Tokenizer, build_char_vocab, write_vocab
from .korean import KoreanSyllableVocab

__all__ = [
    "CharTokenizer",
    "Tokenizer",
    "build_char_vocab",
    "write_vocab",
    "KoreanSyllableVocab",
]
