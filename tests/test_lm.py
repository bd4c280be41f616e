"""n-gram LM: training normalization, ARPA round-trip, backoff scoring,
pruning, lexicon/trie, corpus cleaning."""

import math

import numpy as np
import pytest

from b2txt_tpu.lm import (
    BOS, EOS, UNK,
    Lexicon,
    NGramLM,
    clean_sentence,
    train_ngram,
    uniform_unigram,
)

CORPUS = [
    "the cat sat on the mat".split(),
    "the dog sat on the rug".split(),
    "a cat and a dog".split(),
    "the cat saw the dog".split(),
    "dogs and cats play".split(),
] * 3


@pytest.fixture(scope="module")
def lm3():
    return train_ngram(CORPUS, order=3)


def test_probabilities_normalize(lm3):
    """Σ_w P(w|ctx) == 1 over vocab ∪ {</s>, <unk>} for several contexts."""
    vocab = [w for w in lm3.vocab if w not in (EOS, UNK)]
    for ctx in ([], ["the"], ["the", "cat"], ["on", "the"], ["unseen_ctx"]):
        total = sum(math.exp(lm3.logp(ctx, w)) for w in vocab)
        total += math.exp(lm3.logp(ctx, EOS))
        total += math.exp(lm3.logp(ctx, UNK))
        np.testing.assert_allclose(total, 1.0, rtol=1e-6, err_msg=f"ctx={ctx}")


def test_seen_ngram_beats_unseen(lm3):
    assert lm3.logp(["the"], "cat") > lm3.logp(["the"], "play")
    assert lm3.logp(["sat"], "on") > lm3.logp(["sat"], "saw")


def test_sentence_scoring_and_ppl(lm3):
    in_domain = lm3.perplexity([s for s in CORPUS[:5]])
    shuffled = lm3.perplexity([list(reversed(s)) for s in CORPUS[:5]])
    assert in_domain < shuffled


def test_arpa_roundtrip(tmp_path, lm3):
    path = str(tmp_path / "lm.arpa")
    lm3.to_arpa(path)
    lm2 = NGramLM.from_arpa(path)
    for ctx in ([], ["the"], ["the", "cat"]):
        for w in ["cat", "dog", "play", EOS]:
            np.testing.assert_allclose(
                lm2.logp(ctx, w), lm3.logp(ctx, w), rtol=1e-5, atol=1e-5
            )


def test_vocab_limiting():
    lm = train_ngram(CORPUS, order=2, vocab=["the", "cat", "dog"], add_unk=True)
    assert "rug" not in lm.vocab
    assert math.exp(lm.logp([], UNK)) > 0


def test_prune_keeps_model_valid(lm3):
    pruned = lm3.prune(0.1)
    n_tri = len(pruned.tables[2])
    assert n_tri < len(lm3.tables[2])
    vocab = [w for w in pruned.vocab if w not in (EOS, UNK)]
    for ctx in (["the"], ["the", "cat"]):
        total = sum(math.exp(pruned.logp(ctx, w)) for w in vocab)
        total += math.exp(pruned.logp(ctx, EOS)) + math.exp(pruned.logp(ctx, UNK))
        np.testing.assert_allclose(total, 1.0, rtol=1e-5)


def test_uniform_unigram():
    lm = uniform_unigram(["yes", "no", "maybe"])
    assert lm.logp([], "yes") == lm.logp([], "no")
    np.testing.assert_allclose(math.exp(lm.logp([], "yes")), 1 / 4, rtol=1e-9)


# ---------------------------------------------------------------- lexicon

LEX = {
    "cat": ["K", "AE", "T"],
    "cab": ["K", "AE", "B"],
    "at": ["AE", "T"],
    "their": ["DH", "EH", "R"],
    "there": ["DH", "EH", "R"],
}


def test_trie_structure():
    lex = Lexicon.from_words(LEX)
    from b2txt_tpu.lm import PHONE_TO_ID

    node = 0
    for p in ["K", "AE", "T"]:
        node = lex.next[node, PHONE_TO_ID[p]]
        assert node > 0
    assert lex.node_words(int(node)) == [lex.word_ids["cat"]]
    # homophones share a final node
    node = 0
    for p in ["DH", "EH", "R"]:
        node = lex.next[node, PHONE_TO_ID[p]]
    ws = {lex.words[w] for w in lex.node_words(int(node))}
    assert ws == {"their", "there"}


def test_lexicon_file_parsing(tmp_path):
    p = tmp_path / "dict.txt"
    p.write_text(
        ";;; comment\n"
        "CAT  K AE1 T\n"
        "CAT(2)  K AE0 T\n"
        "READ  R IY1 D\n"
        "READ(2)  R EH1 D\n"
    )
    lex = Lexicon.from_file(str(p))
    assert set(lex.words) == {"cat", "read"}
    assert len(lex.phones_of("read")) == 2  # two distinct pronunciations
    assert len(lex.phones_of("cat")) == 1  # stress-stripped duplicates merge


def test_sentence_to_phonemes():
    lex = Lexicon.from_words(LEX)
    from b2txt_tpu.lm import PHONE_TO_ID
    from b2txt_tpu.utils.phonemes import SIL_ID_MODEL

    ids = lex.sentence_to_phonemes("cat at")
    expected = [PHONE_TO_ID[p] for p in ["K", "AE", "T"]] + [SIL_ID_MODEL] + [
        PHONE_TO_ID[p] for p in ["AE", "T"]
    ] + [SIL_ID_MODEL]
    assert ids == expected
    assert lex.sentence_to_phonemes("cat zzz") is None


# ---------------------------------------------------------------- corpus

def test_clean_sentence():
    assert clean_sentence("Hello, World! 123") == "hello world"
    assert clean_sentence("I have a cat.") == "i have a cat"
    assert clean_sentence("x marks the spot") is None  # stray single char
    assert clean_sentence("don't stop") == "don't stop"
    assert clean_sentence("visit www.example.com now") != "visit www example com now"
