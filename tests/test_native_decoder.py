"""C++ native decoder parity vs the Python host searcher (its oracle)."""

import os
import shutil

import numpy as np
import pytest

from b2txt_tpu.decode.lmbeam import LexiconBeamSearch
from b2txt_tpu.lm import Lexicon, train_ngram
from b2txt_tpu.lm.lexicon import strip_stress
from b2txt_tpu.utils.config import DecodeConfig

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="g++ not available"
)

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
def artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native")
    lm = train_ngram(CORPUS, order=3)
    arpa = str(tmp / "lm.arpa")
    lm.to_arpa(arpa)
    lex_path = str(tmp / "lexicon.txt")
    with open(lex_path, "w") as f:
        for w, pron in LEX.items():
            f.write(f"{w.upper()}  {' '.join(pron)}\n")
    lexicon = Lexicon.from_words(LEX)
    return arpa, lex_path, lexicon, lm


@pytest.fixture(scope="module")
def native(artifacts):
    from b2txt_tpu.runtime import NativeLexiconBeamSearch

    arpa, lex_path, _, _ = artifacts
    return NativeLexiconBeamSearch(arpa, lex_path)


def clean_logprobs(ids, n_classes=41, frames_per=3, hot=8.0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for pid in ids:
        for _ in range(frames_per):
            row = np.full(n_classes, -hot, np.float32)
            row[pid] = 0.0
            rows.append(row)
        blank = np.full(n_classes, -hot, np.float32)
        blank[0] = 0.0
        rows.append(blank)
    lp = np.stack(rows)
    if noise:
        lp = lp + noise * rng.standard_normal(lp.shape).astype(np.float32)
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


SENTS = ["the cat sat on the mat", "there is the cat", "the mat"]


@pytest.mark.parametrize("sentence", SENTS)
def test_native_matches_python(artifacts, native, sentence):
    arpa, lex_path, lexicon, lm = artifacts
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10,
                       beam_width=64, beam=0.0)
    lp = clean_logprobs(lexicon.sentence_to_phonemes(sentence))

    host = LexiconBeamSearch(lexicon, lm, cfg)
    host.decode(lp)
    r_host = host.finish_decoding()

    native.set_opt(cfg)
    native.reset()
    native.decode(lp)
    r_nat = native.finish_decoding()

    assert r_nat[0].sentence == r_host[0].sentence == sentence
    np.testing.assert_allclose(r_nat[0].ac_score, r_host[0].ac_score, rtol=1e-4)
    np.testing.assert_allclose(r_nat[0].lm_score, r_host[0].lm_score, rtol=1e-4)
    host_map = {r.sentence: r for r in r_host}
    for r in r_nat[:5]:
        assert r.sentence in host_map
        np.testing.assert_allclose(
            r.lm_score, host_map[r.sentence].lm_score, rtol=1e-3, atol=1e-3
        )


def test_native_noisy_and_blank_penalty(artifacts, native):
    arpa, lex_path, lexicon, lm = artifacts
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=30.0, nbest=5,
                       beam_width=64, beam=0.0)
    lp = clean_logprobs(
        lexicon.sentence_to_phonemes("there is the cat"), hot=2.5, noise=0.8, seed=3
    )
    host = LexiconBeamSearch(lexicon, lm, cfg)
    host.decode(lp)
    native.set_opt(cfg)
    native.reset()
    native.decode(lp)
    assert native.finish_decoding()[0].sentence == host.finish_decoding()[0].sentence


def test_native_streaming_partials(artifacts, native):
    arpa, lex_path, lexicon, lm = artifacts
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=5, beam_width=64)
    native.set_opt(cfg)
    native.reset()
    lp = clean_logprobs(lexicon.sentence_to_phonemes("the cat sat"))
    partials = []
    for i in range(0, lp.shape[0], 6):
        native.decode(lp[i : i + 6])
        res = native.result()
        if res:
            partials.append(res[0].sentence)
    assert partials[-1].startswith("the cat")
    assert native.finish_decoding()[0].sentence == "the cat sat"


def test_native_blank_skip(artifacts, native):
    arpa, lex_path, lexicon, lm = artifacts
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=3,
                       beam_width=64, ctc_blank_skip_threshold=0.9)
    native.set_opt(cfg)
    native.reset()
    native.decode(clean_logprobs(lexicon.sentence_to_phonemes("the cat sat")))
    assert native.finish_decoding()[0].sentence == "the cat sat"


def test_native_in_decoder_service(artifacts, native):
    from b2txt_tpu.serve import DecoderService

    arpa, lex_path, lexicon, lm = artifacts
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10)
    svc = DecoderService(lexicon, lm, cfg, channel_order="model")
    svc.searcher = native
    native.set_opt(cfg)
    out = svc.decode_utterance(
        clean_logprobs(lexicon.sentence_to_phonemes("the cat sat")) * 3.0
    )
    assert out.sentence == "the cat sat"


@pytest.mark.parametrize("order", [2, 3])
def test_native_ngram_trainer_matches_python(tmp_path, order):
    """C++ KN trainer == Python trainer (same estimator, exact scores)."""
    import math

    from b2txt_tpu.lm import EOS, UNK, NGramLM, train_ngram
    from b2txt_tpu.runtime import train_ngram_native

    corpus = [" ".join(s) for s in CORPUS]
    cpath = str(tmp_path / "corpus.txt")
    with open(cpath, "w") as f:
        f.write("\n".join(corpus) + "\n")
    apath = str(tmp_path / f"lm{order}.arpa")
    train_ngram_native(cpath, apath, order=order)
    nat = NGramLM.from_arpa(apath)
    py = train_ngram(CORPUS, order=order)
    for ctx in ([], ["the"], ["the", "cat"], ["there", "is"], ["zz"]):
        for w in ["cat", "mat", "is", "the", EOS, UNK]:
            np.testing.assert_allclose(
                nat.logp(ctx, w), py.logp(ctx, w), rtol=1e-5, atol=1e-5
            )
    # normalization
    total = sum(math.exp(nat.logp(["the"], w)) for w in py.vocab
                if w not in (EOS, UNK))
    total += math.exp(nat.logp(["the"], EOS)) + math.exp(nat.logp(["the"], UNK))
    np.testing.assert_allclose(total, 1.0, rtol=1e-5)


def test_native_trainer_vocab_limit(tmp_path):
    from b2txt_tpu.lm import NGramLM
    from b2txt_tpu.runtime import train_ngram_native

    cpath = str(tmp_path / "c.txt")
    with open(cpath, "w") as f:
        f.write("the cat sat\nthe dog ran\n")
    vpath = str(tmp_path / "v.txt")
    with open(vpath, "w") as f:
        f.write("the\ncat\nsat\n")
    apath = str(tmp_path / "lm.arpa")
    train_ngram_native(cpath, apath, order=2, vocab_path=vpath)
    lm = NGramLM.from_arpa(apath)
    assert "dog" not in lm.vocab
    assert lm.logp([], "dog") == lm.logp([], "<unk>")


def test_native_unpruned_rescore(tmp_path):
    """C++ n-best rescoring with a second (unpruned) ARPA == recomputing each
    sentence's LM score with NGramLM.sentence_logp (the Python rescore oracle,
    decode/rescore.py:160-168)."""
    import numpy as np

    from b2txt_tpu.lm import Lexicon, train_ngram
    from b2txt_tpu.runtime import NativeLexiconBeamSearch
    from b2txt_tpu.utils.config import DecodeConfig

    LEX = {
        "the": ["DH", "AH"], "cat": ["K", "AE", "T"], "sat": ["S", "AE", "T"],
        "mat": ["M", "AE", "T"], "hat": ["HH", "AE", "T"], "on": ["AA", "N"],
    }
    corpus = ["the cat sat on the mat".split(), "the cat sat".split(),
              "the hat".split()] * 3
    lexicon = Lexicon.from_words(LEX)
    pruned = train_ngram(corpus, order=2)
    unpruned = train_ngram(corpus + ["the mat sat on the hat".split()] * 2,
                           order=3)
    arpa = str(tmp_path / "lm.arpa"); pruned.to_arpa(arpa)
    arpa_big = str(tmp_path / "lm_unpruned.arpa"); unpruned.to_arpa(arpa_big)
    lexp = str(tmp_path / "lexicon.txt")
    with open(lexp, "w") as f:
        for w, p in LEX.items():
            f.write(f"{w.upper()}  {' '.join(p)}\n")

    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10,
                       beam_width=64, beam=0.0)

    def lp_for(sentence, hot=4.0):
        rows = []
        for pid in lexicon.sentence_to_phonemes(sentence):
            for _ in range(2):
                r = np.full(41, -hot, np.float32); r[pid] = 0.0; rows.append(r)
            b = np.full(41, -hot, np.float32); b[0] = 0.0; rows.append(b)
        lp = np.stack(rows)
        return lp - np.log(np.exp(lp).sum(-1, keepdims=True))

    lp = lp_for("the cat sat")

    base = NativeLexiconBeamSearch(arpa, lexp, cfg)
    base.decode(lp)
    r_base = base.finish_decoding()

    resc = NativeLexiconBeamSearch(arpa, lexp, cfg, rescore_arpa=arpa_big)
    resc.decode(lp)
    r_resc = resc.finish_decoding()

    assert len(r_resc) > 1
    # every rescored candidate's lm_score equals the unpruned full-sentence
    # score, and the ranking follows scale·ac + lm_new
    for r in r_resc:
        expect = unpruned.sentence_logp(r.sentence.split())
        np.testing.assert_allclose(r.lm_score, expect, rtol=1e-4, atol=1e-4)
    totals = [cfg.acoustic_scale * r.ac_score + r.lm_score for r in r_resc]
    # ranking follows the rescored totals (rescoring happens BEFORE the
    # n-best cut, so tail membership may legitimately differ from base —
    # exactly why lattice/large-pool rescoring beats rescoring a fixed list)
    assert totals == sorted(totals, reverse=True)
    assert r_resc[0].sentence == "the cat sat"

    # clearing the rescorer restores base behavior
    resc.set_rescore_lm(None)
    resc.reset(); resc.decode(lp)
    r_clear = resc.finish_decoding()
    assert [r.sentence for r in r_clear] == [r.sentence for r in r_base]
