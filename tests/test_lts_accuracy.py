"""Held-out G2P accuracy on the REAL CMUdict (VERDICT r4 item 5).

The reference's OOV path is g2p_en's trained seq2seq
(nejm_b2txt_utils/general_utils.py:51-74, ~8-10% held-out phoneme error).
The rebuild's trained LTS decision list (utils/lts.py) must measure < 15%
phoneme error on 5,000 held-out dict.txt words — words EXCLUDED from the
packaged model's training set by construction (utils.lts.held_out_split is
shared between scripts/train_lts.py and this test)."""

import pytest

from b2txt_tpu.data.real_assets import have_real_dict
from b2txt_tpu.utils.lts import (LetterToSound, held_out_split,
                                 phoneme_error_rate)

needs_dict = pytest.mark.skipif(
    not have_real_dict(), reason="reference dict.txt not present"
)
needs_asset = pytest.mark.skipif(
    LetterToSound.load_pretrained() is None,
    reason="packaged LTS asset missing (run scripts/train_lts.py)",
)


@needs_dict
@needs_asset
def test_heldout_phoneme_error_under_15pct():
    _, test = held_out_split()
    lts = LetterToSound.load_pretrained()
    r = phoneme_error_rate(lts, test)
    # round-5 measurement: 9.4% PER / 58.4% word accuracy
    assert r["phoneme_error_rate"] < 0.15, r
    assert r["word_accuracy"] > 0.45, r


@needs_dict
@needs_asset
def test_lts_beats_rule_engine():
    from b2txt_tpu.utils.g2p import letters_to_phonemes

    _, test = held_out_split()
    small = dict(list(test.items())[:800])
    lts = LetterToSound.load_pretrained()
    r_lts = phoneme_error_rate(lts, small)
    r_rules = phoneme_error_rate(lambda w: letters_to_phonemes(w), small)
    assert (r_lts["phoneme_error_rate"]
            < 0.6 * r_rules["phoneme_error_rate"]), (r_lts, r_rules)


@needs_asset
def test_g2p_uses_lts_for_oov():
    """Default G2p routes OOV words through the trained model (and still
    emits only valid decoder phonemes)."""
    from b2txt_tpu.utils.g2p import G2p, letters_to_phonemes
    from b2txt_tpu.utils.phonemes import LOGIT_TO_PHONEME

    valid = set(LOGIT_TO_PHONEME[1:40])
    g = G2p()
    assert g.lts is not None
    # a nonsense-but-wordlike OOV: must produce valid phones
    for w in ("brimbleton", "zorvex", "quandrill", "mcgrathson"):
        out = g.word_to_phonemes(w)
        assert out and all(p in valid for p in out), (w, out)
    # lts=False forces the rule engine
    g_rules = G2p(lts=False)
    assert g_rules.word_to_phonemes("zorvex") == letters_to_phonemes("zorvex")


def test_train_tiny_roundtrip(tmp_path):
    """LetterToSound.train on a toy lexicon: alignment, prediction on
    training words, save/load identity. (No reference assets needed.)"""
    toy = {
        "cat": ["K", "AE", "T"], "cab": ["K", "AE", "B"],
        "bat": ["B", "AE", "T"], "bad": ["B", "AE", "D"],
        "mat": ["M", "AE", "T"], "mad": ["M", "AE", "D"],
        "cats": ["K", "AE", "T", "S"], "bats": ["B", "AE", "T", "S"],
        "tab": ["T", "AE", "B"], "tad": ["T", "AE", "D"],
        "box": ["B", "AA", "K", "S"], "fox": ["F", "AA", "K", "S"],
    }
    lts = LetterToSound.train(toy, em_iters=2)
    # training words reproduce exactly (decision list memorizes them)
    for w, p in toy.items():
        assert lts.predict(w) == p, (w, lts.predict(w), p)
    # generalization: unseen 'cad' from c-, -ad patterns; 'sox' from -ox
    assert lts.predict("cad") == ["K", "AE", "D"]
    path = str(tmp_path / "m.json.gz")
    lts.save(path)
    again = LetterToSound.load(path)
    assert again.table == lts.table
