"""Lexicon+n-gram fused CTC beam search (host reference implementation)."""

import numpy as np
import pytest

from b2txt_tpu.decode.lmbeam import LexiconBeamSearch, decode_numpy
from b2txt_tpu.lm import Lexicon, train_ngram, uniform_unigram
from b2txt_tpu.lm.lexicon import PHONE_TO_ID
from b2txt_tpu.utils.config import DecodeConfig
from b2txt_tpu.utils.phonemes import SIL_ID_MODEL

LEX = {
    "the": ["DH", "AH"],
    "cat": ["K", "AE", "T"],
    "sat": ["S", "AE", "T"],
    "mat": ["M", "AE", "T"],
    "on": ["AA", "N"],
    "their": ["DH", "EH", "R"],
    "there": ["DH", "EH", "R"],
    "is": ["IH", "Z"],
    "hat": ["HH", "AE", "T"],
}

CORPUS = [
    "the cat sat on the mat".split(),
    "there is the cat".split(),
    "the cat is there".split(),
    "there is the mat".split(),
    "the cat sat on the hat".split(),
] * 4


@pytest.fixture(scope="module")
def lexicon():
    return Lexicon.from_words(LEX)


@pytest.fixture(scope="module")
def lm():
    return train_ngram(CORPUS, order=3)


def phones_of(sentence, lexicon):
    return lexicon.sentence_to_phonemes(sentence)


def clean_logprobs(phoneme_ids, n_classes=41, frames_per=3, hot=8.0):
    """Synthetic log-probs: each phoneme held for frames_per frames with a
    blank frame between (so repeats survive CTC collapse)."""
    rows = []
    for pid in phoneme_ids:
        for _ in range(frames_per):
            row = np.full(n_classes, -hot, np.float32)
            row[pid] = 0.0
            rows.append(row)
        blank = np.full(n_classes, -hot, np.float32)
        blank[0] = 0.0
        rows.append(blank)
    lp = np.stack(rows)
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


def test_decodes_clean_sentence(lexicon, lm):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10, beam_width=64)
    searcher = LexiconBeamSearch(lexicon, lm, cfg)
    sentence = "the cat sat on the mat"
    lp = clean_logprobs(phones_of(sentence, lexicon))
    searcher.decode(lp)
    results = searcher.finish_decoding()
    assert results[0].sentence == sentence
    assert results[0].ac_score < 0 and results[0].lm_score < 0


def test_homophone_resolved_by_lm(lexicon, lm):
    """'DH EH R IH Z ...' must come out as 'there is' (their/there are
    acoustically identical; the LM must disambiguate)."""
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10)
    searcher = LexiconBeamSearch(lexicon, lm, cfg)
    lp = clean_logprobs(phones_of("there is the cat", lexicon))
    searcher.decode(lp)
    results = searcher.finish_decoding()
    assert results[0].sentence == "there is the cat"
    sentences = [r.sentence for r in results]
    assert "their is the cat" in sentences  # homophone branch exists, ranked lower
    assert sentences.index("their is the cat") > 0


def test_final_word_closes_without_trailing_sil(lexicon, lm):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0)
    searcher = LexiconBeamSearch(lexicon, lm, cfg)
    ids = phones_of("the cat", lexicon)[:-1]  # drop trailing SIL
    searcher.decode(clean_logprobs(ids))
    results = searcher.finish_decoding()
    assert results[0].sentence == "the cat"


def test_out_of_lexicon_paths_pruned(lexicon, lm):
    """Acoustics spelling a non-word must snap to the closest lexicon path."""
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0)
    searcher = LexiconBeamSearch(lexicon, lm, cfg)
    # 'K AE B' — no 'cab' in this lexicon; 'K AE T' (cat) differs in one phone
    ids = [PHONE_TO_ID[p] for p in ["K", "AE", "B"]] + [SIL_ID_MODEL]
    searcher.decode(clean_logprobs(ids, hot=3.0))
    results = searcher.finish_decoding()
    assert results[0].sentence == "cat"


def test_incremental_equals_oneshot(lexicon, lm):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=5)
    lp = clean_logprobs(phones_of("the cat is there", lexicon))
    full = LexiconBeamSearch(lexicon, lm, cfg)
    full.decode(lp)
    r_full = full.finish_decoding()

    chunked = LexiconBeamSearch(lexicon, lm, cfg)
    for i in range(0, lp.shape[0], 7):
        chunked.decode(lp[i : i + 7])
    r_chunked = chunked.finish_decoding()
    assert [r.sentence for r in r_full] == [r.sentence for r in r_chunked]
    np.testing.assert_allclose(
        [r.ac_score for r in r_full], [r.ac_score for r in r_chunked], rtol=1e-9
    )


def test_reset(lexicon, lm):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0)
    searcher = LexiconBeamSearch(lexicon, lm, cfg)
    searcher.decode(clean_logprobs(phones_of("the cat", lexicon)))
    searcher.finish_decoding()
    searcher.reset()
    assert not searcher.decoded_something()
    searcher.decode(clean_logprobs(phones_of("the mat", lexicon)))
    assert searcher.finish_decoding()[0].sentence == "the mat"


def test_partial_results_stream(lexicon, lm):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0)
    searcher = LexiconBeamSearch(lexicon, lm, cfg)
    lp = clean_logprobs(phones_of("the cat sat", lexicon))
    partials = []
    for i in range(0, lp.shape[0], 4):
        searcher.decode(lp[i : i + 4])
        res = searcher.result()
        if res:
            partials.append(res[0].sentence)
    assert partials[-1].startswith("the cat")


def test_blank_penalty_shortens_hypotheses(lexicon):
    """High blank penalty discourages blanks → more/longer emissions. Use a
    uniform LM so only acoustics matter."""
    lm1 = uniform_unigram(list(LEX.keys()))
    ids = phones_of("the cat", Lexicon.from_words(LEX))
    lp = clean_logprobs(ids, hot=1.2)  # noisy acoustics
    lex = Lexicon.from_words(LEX)
    out = {}
    for bp in (1.0, 60.0):
        cfg = DecodeConfig(acoustic_scale=0.8, blank_penalty=bp, nbest=1)
        s = LexiconBeamSearch(lex, lm1, cfg)
        s.decode(lp)
        r = s.finish_decoding()
        out[bp] = r[0].sentence if r else ""
    assert len(out[60.0].split()) >= len(out[1.0].split())


def test_blank_skip_threshold(lexicon, lm):
    """With aggressive blank skipping the decode still recovers the sentence
    (blank frames are confidently blank in the synthetic input)."""
    cfg = DecodeConfig(
        acoustic_scale=0.5, blank_penalty=1.0, ctc_blank_skip_threshold=0.9
    )
    searcher = LexiconBeamSearch(lexicon, lm, cfg)
    lp = clean_logprobs(phones_of("the cat sat", lexicon))
    searcher.decode(lp)
    assert searcher.finish_decoding()[0].sentence == "the cat sat"


def test_decode_numpy_from_logits(lexicon, lm):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0)
    searcher = LexiconBeamSearch(lexicon, lm, cfg)
    ids = phones_of("the cat", lexicon)
    logits = np.asarray(clean_logprobs(ids)) * 4.0  # unnormalized
    decode_numpy(searcher, logits)
    assert searcher.finish_decoding()[0].sentence == "the cat"


def test_set_opt_runtime_reconfig(lexicon, lm):
    searcher = LexiconBeamSearch(lexicon, lm, DecodeConfig(nbest=1))
    searcher.set_opt(DecodeConfig(nbest=7, acoustic_scale=0.5, blank_penalty=1.0))
    searcher.decode(clean_logprobs(phones_of("the cat", lexicon)))
    assert len(searcher.finish_decoding()) > 1
