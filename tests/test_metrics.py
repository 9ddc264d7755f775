"""WER/CER metric tests (known-value cases; jiwer-style corpus aggregation)."""

import math

from multimodal_av_model_tpu.ops.metrics import cer, levenshtein, wer


def test_levenshtein_known():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein([], []) == 0
    assert levenshtein([1, 2, 3], []) == 3
    assert levenshtein("abc", "abc") == 0


def test_wer_single():
    assert wer("a b c", "a b c") == 0.0
    assert wer("a b c", "a x c") == 1 / 3
    assert wer("a b c d", "a b") == 0.5


def test_wer_corpus_aggregation():
    # jiwer semantics: total edits / total ref words, not mean of per-pair WER.
    refs = ["a b", "c d e f"]
    hyps = ["a x", "c d e f"]
    assert wer(refs, hyps) == 1 / 6


def test_cer_korean():
    assert cer("안녕하세요", "안녕하세요") == 0.0
    assert cer("안녕하세요", "안녕하세유") == 1 / 5
    assert cer("안녕 하세요", "안녕하세요", remove_spaces=True) == 0.0


def test_empty_reference():
    assert cer("", "") == 0.0
    assert math.isinf(wer("", "word"))


def test_jamo_decomposition_and_rate():
    from multimodal_av_model_tpu.text.korean import (
        jamo_error_rate,
        syllable_to_jamo,
        text_to_jamo,
    )

    assert syllable_to_jamo("한") == ["ㅎ", "ㅏ", "ㄴ"]
    assert syllable_to_jamo("가") == ["ㄱ", "ㅏ"]
    assert syllable_to_jamo("a") == ["a"]
    assert text_to_jamo("한가") == ["ㅎ", "ㅏ", "ㄴ", "ㄱ", "ㅏ"]
    assert jamo_error_rate("한", "한") == 0.0
    # 한(ㅎㅏㄴ) vs 한(ㅎㅏ) with missing jongseong: 1 deletion / 3 jamo.
    assert jamo_error_rate("한", "하") == 1 / 3
