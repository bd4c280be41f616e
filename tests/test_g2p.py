"""g2p: text → ARPAbet phonemes with SIL word separators.

Parity target: nejm_b2txt_utils/general_utils.py:51-74 (sentence_to_phonemes
via g2p_en) — output contract (SIL between/after words, punctuation cleanup,
empty → [SIL]) plus dictionary/lexicon lookup and rule fallback for OOV words.
"""

import numpy as np
import pytest

from b2txt_tpu.utils.g2p import (
    G2p,
    letters_to_phonemes,
    sentence_to_phoneme_ids,
    sentence_to_phonemes,
)
from b2txt_tpu.utils.phonemes import LOGIT_TO_PHONEME, SIL_ID_MODEL

VALID = set(LOGIT_TO_PHONEME[1:40]) | {"SIL"}


def test_output_contract_matches_reference():
    phones, cleaned = sentence_to_phonemes("Hello, world!")
    assert cleaned == "hello world"
    assert phones[-1] == "SIL"            # one SIL at the end
    assert phones.count("SIL") == 2       # one per word
    assert all(p in VALID for p in phones)


def test_empty_text_is_sil():
    assert sentence_to_phonemes("...") == (["SIL"], "")
    assert sentence_to_phonemes("") == (["SIL"], "")


def test_common_words_exact():
    g = G2p()
    assert g.word_to_phonemes("the") == ["DH", "AH"]
    assert g.word_to_phonemes("one") == ["W", "AH", "N"]
    assert g.word_to_phonemes("through") == ["TH", "R", "UW"]
    assert g.word_to_phonemes("would") == ["W", "UH", "D"]


def test_regular_words_via_rules():
    assert letters_to_phonemes("cat") == ["K", "AE", "T"]
    assert letters_to_phonemes("stone") == ["S", "T", "OW", "N"]
    assert letters_to_phonemes("rain") == ["R", "EY", "N"]
    assert letters_to_phonemes("night") == ["N", "AY", "T"]
    assert letters_to_phonemes("phone") == ["F", "OW", "N"]
    assert letters_to_phonemes("speech") == ["S", "P", "IY", "CH"]


def test_oov_words_always_phonemize():
    # invented words must still produce valid decoder phonemes
    for w in ["zorbex", "quimble", "vathering", "brelfs", "xantheum"]:
        out = letters_to_phonemes(w)
        assert out, w
        assert all(p in VALID for p in out), (w, out)


def test_inflections_assimilate_voicing():
    g = G2p()
    assert g.word_to_phonemes("days") == ["D", "EY", "Z"]        # voiced → Z
    assert g.word_to_phonemes("books") == ["B", "UH", "K", "S"]  # unvoiced → S
    assert g.word_to_phonemes("walked") == ["W", "AO", "K", "T"]
    assert g.word_to_phonemes("turned") == ["T", "ER", "N", "D"]
    assert g.word_to_phonemes("wanted") == ["W", "AA", "N", "T", "IH", "D"]


def test_user_lexicon_wins():
    g = G2p(lexicon={"cat": ["K", "IY", "T"]})
    assert g.word_to_phonemes("cat") == ["K", "IY", "T"]
    assert g.word_to_phonemes("cats") == ["K", "IY", "T", "S"]


def test_sentence_to_phoneme_ids_model_order():
    ids = sentence_to_phoneme_ids("the cat")
    assert ids[-1] == SIL_ID_MODEL
    names = [LOGIT_TO_PHONEME[i] if i != SIL_ID_MODEL else "SIL" for i in ids]
    assert names == ["DH", "AH", "SIL", "K", "AE", "T", "SIL"]


def test_per_reference_for_arbitrary_transcript():
    """g2p output works as a PER reference (the evaluate_model.py use)."""
    from b2txt_tpu.utils.metrics import edit_distance

    ref = sentence_to_phoneme_ids("it's a bright day")
    assert all(0 < i <= SIL_ID_MODEL for i in ref)
    assert edit_distance(ref, ref) == 0
