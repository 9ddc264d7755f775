"""Tokenizer parity tests against the shipped tokenizer800.vocab artifact and
the reference implementation (imported read-only as an oracle)."""

import os

import pytest

from multimodal_av_model_tpu.text import (
    CharTokenizer,
    KoreanSyllableVocab,
    build_char_vocab,
    write_vocab,
)

VOCAB = os.path.join(os.path.dirname(__file__), "..", "assets", "tokenizer800.vocab")


@pytest.fixture(scope="module")
def tok():
    return CharTokenizer(VOCAB)


def test_special_ids(tok):
    # Verified runtime values of the reference artifact (SURVEY.md §2 row 5).
    assert tok.vocab_size == 800
    assert tok.unk_id == 0
    assert tok.blank_id == 3
    assert tok.pad_id == 0
    assert tok.id_to_token[4] == "▁"  # ▁


def test_encode_space_maps_to_sp_space(tok):
    ids = tok.encode("가 나")
    assert ids[1] == 4  # ▁


def test_round_trip(tok):
    # Build the sentence from characters known to be in the 800-token vocab.
    chars = [t for t in tok.id_to_token[5:40] if len(t) == 1 and t != "▁"]
    text = "".join(chars[:6]) + " " + "".join(chars[6:12])
    assert tok.decode(tok.encode(text)) == text


def test_unknown_char_maps_to_unk(tok):
    assert tok.encode("ß") == [tok.unk_id]  # ß not in Korean vocab


def test_decode_drops_out_of_range(tok):
    assert tok.decode([10, -5, 100000, 11]) == tok.decode([10, 11])


def test_parity_with_reference(tok, reference_path):
    from utils.tokenizer import Tokenizer as RefTokenizer  # type: ignore

    ref = RefTokenizer(VOCAB)
    assert ref.vocab_size == tok.vocab_size
    assert ref.blank_id == tok.blank_id
    assert ref.unk_id == tok.unk_id
    for text in ["안녕하세요", "오늘 날씨가 좋네요.", "abc 123 !?", ""]:
        assert ref.encode(text) == tok.encode(text)
        assert ref.decode(tok.encode(text)) == tok.decode(tok.encode(text))


def test_encode_array_padding(tok):
    arr = tok.encode_array("가나다", pad_to=8)
    assert arr.shape == (8,)
    assert (arr[3:] == tok.pad_id).all()


def test_build_char_vocab_header_and_usability(tmp_path):
    texts = ["안녕하세요 여러분", "좋은 아침입니다", "안녕"]
    entries = build_char_vocab(texts, vocab_size=50)
    path = str(tmp_path / "v.vocab")
    write_vocab(entries, path)
    t = CharTokenizer(path)
    assert t.id_to_token[:4] == ["<unk>", "<s>", "</s>", "<blank>"]
    assert t.blank_id == 3
    assert t.id_to_token[4] == "▁"
    assert t.decode(t.encode("안녕 여러분")) == "안녕 여러분"


def test_korean_syllable_vocab_round_trip():
    v = KoreanSyllableVocab()
    assert v.vocab_size == 11173  # 11,172 syllables + <blank>
    idxs = v.text_to_indices("바나나")
    assert v.indices_to_text(idxs) == "바나나"
    # Non-Hangul silently dropped (legacy semantics).
    assert v.text_to_indices("a바b") == v.text_to_indices("바")
