"""Round-4 regression tests for issues found while executing the round-4
evidence program."""

import os

import numpy as np
import pytest

from multimodal_av_model_tpu.text import CharTokenizer

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VOCAB = os.path.join(REPO_ROOT, "assets", "tokenizer800.vocab")


@pytest.fixture(scope="module")
def tok():
    return CharTokenizer(VOCAB)


def test_real_text_min_chars_restores_solo_frames(tok):
    """Real sentences are almost always longer than max_chars, so the fixed
    crop makes every utterance exactly max_chars long — paired utterances
    then overlap end to end and the speaker masks have NO solo frames
    (contrastive loss 0.0, probe crash — found running the round-4 pretrain
    ablation on the real corpus).  min_chars varies the crop length and
    restores the production solo/overlap mix."""
    from multimodal_av_model_tpu.data.mixing import (
        MASK_OTHER_SOLO,
        MASK_OVERLAP,
        MASK_TARGET_SOLO,
    )
    from multimodal_av_model_tpu.data.structured import RealTextStructuredSource

    sents = ["가나다라마바사아자차카타파하"] * 4   # all longer than max_chars

    fixed = RealTextStructuredSource(tok, sents, seed=0, max_chars=5)
    m = np.concatenate([fixed.load_pair()["mask1"] for _ in range(6)])
    assert (m == MASK_OVERLAP).all()          # the degenerate regime

    varied = RealTextStructuredSource(tok, sents, seed=0, max_chars=5,
                                      min_chars=2)
    masks = np.concatenate([varied.load_pair()["mask1"] for _ in range(6)])
    assert (masks == MASK_OVERLAP).any()
    assert ((masks == MASK_TARGET_SOLO) | (masks == MASK_OTHER_SOLO)).any()

    # Labels still decode to real substrings within the length band.
    lab = varied.load_pair()["label1"]
    assert 2 <= len(lab) <= 5
    assert tok.decode(list(lab)) in sents[0]
