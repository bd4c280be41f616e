"""Three-way randomized cross-check of the searcher backends.

CLAUDE.md invariant: decode semantics move together across the host oracle
(decode/lmbeam.py), the native C++ decoder (runtime/decoder.cc) and the device
searcher (decode/lmbeam_jax.py). This sweep drives all three over the same
logits with randomized DecodeConfig knob combinations — acoustic_scale,
blank_penalty, blank-skip threshold, first_beam_size, length_penalty — and
asserts top-1 agreement plus score parity (reference knobs:
lm_decoder.cc:30-35, ctc_wfst_beam_search.cc:70-121).
"""

import os
import tempfile

import numpy as np
import pytest

from b2txt_tpu.decode.lmbeam import LexiconBeamSearch
from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch
from b2txt_tpu.lm import Lexicon, train_ngram
from b2txt_tpu.runtime import NativeLexiconBeamSearch
from b2txt_tpu.utils.config import DecodeConfig

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
    "a": ["AH"],
}
CORPUS = [
    "the cat sat on the mat".split(),
    "there is the cat".split(),
    "the cat is there".split(),
    "there is a mat".split(),
    "the cat sat on the hat".split(),
    "a hat is on the mat".split(),
] * 3


@pytest.fixture(scope="module")
def setup():
    lexicon = Lexicon.from_words(LEX)
    lm = train_ngram(CORPUS, order=3)
    tmp = tempfile.mkdtemp()
    arpa = os.path.join(tmp, "lm.arpa")
    lm.to_arpa(arpa)
    lexp = os.path.join(tmp, "lexicon.txt")
    with open(lexp, "w") as f:
        for w, p in LEX.items():
            f.write(f"{w.upper()}  {' '.join(p)}\n")
    return lexicon, lm, arpa, lexp


def noisy_logprobs(ids, seed, hot=4.0, noise=0.6, frames_per=3):
    rng = np.random.default_rng(seed)
    rows = []
    for pid in ids:
        for _ in range(frames_per):
            row = np.full(41, -hot, np.float32)
            row[pid] = 0.0
            rows.append(row)
        blank = np.full(41, -hot, np.float32)
        blank[0] = 0.0
        rows.append(blank)
    lp = np.stack(rows) + noise * rng.standard_normal((len(rows), 41)).astype(np.float32)
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


# Knob sweep: every row exercises a different combination, including the
# first-beam prune (now in all three backends) and blank skipping.
CONFIGS = [
    dict(acoustic_scale=0.5, blank_penalty=1.0, first_beam_size=0,
         ctc_blank_skip_threshold=1.0, length_penalty=0.0, beam=0.0),
    dict(acoustic_scale=0.325, blank_penalty=9.0, first_beam_size=0,
         ctc_blank_skip_threshold=1.0, length_penalty=0.0, beam=0.0),
    dict(acoustic_scale=0.5, blank_penalty=1.0, first_beam_size=6,
         ctc_blank_skip_threshold=1.0, length_penalty=0.0, beam=0.0),
    dict(acoustic_scale=1.0, blank_penalty=3.0, first_beam_size=10,
         ctc_blank_skip_threshold=1.0, length_penalty=-0.4, beam=0.0),
    dict(acoustic_scale=0.5, blank_penalty=1.0, first_beam_size=0,
         ctc_blank_skip_threshold=0.95, length_penalty=0.0, beam=0.0),
    dict(acoustic_scale=0.325, blank_penalty=2.0, first_beam_size=8,
         ctc_blank_skip_threshold=0.9, length_penalty=0.2, beam=17.0),
    # Viterbi merge (Kaldi token-passing semantics)
    dict(acoustic_scale=0.5, blank_penalty=1.0, first_beam_size=0,
         ctc_blank_skip_threshold=1.0, length_penalty=0.0, beam=0.0,
         sum_mode=False),
    dict(acoustic_scale=0.325, blank_penalty=9.0, first_beam_size=8,
         ctc_blank_skip_threshold=1.0, length_penalty=0.0, beam=0.0,
         sum_mode=False),
]


@pytest.mark.parametrize("knobs", CONFIGS)
def test_three_way_agreement(setup, knobs):
    lexicon, lm, arpa, lexp = setup
    cfg = DecodeConfig(nbest=5, beam_width=64, **knobs)
    sentences = ["there is the cat", "the cat sat on the mat"]

    native = NativeLexiconBeamSearch(arpa, lexp, cfg)
    device = DeviceLexiconBeamSearch(lexicon, lm, cfg)

    for si, sent in enumerate(sentences):
        lp = noisy_logprobs(lexicon.sentence_to_phonemes(sent), seed=100 + si)

        host = LexiconBeamSearch(lexicon, lm, cfg)
        host.decode(lp)
        r_host = host.finish_decoding()

        native.reset()
        native.decode(lp)
        r_native = native.finish_decoding()

        device.reset()
        device.decode(lp)
        r_device = device.finish_decoding()

        assert r_host and r_native and r_device
        assert r_native[0].sentence == r_host[0].sentence
        assert r_device[0].sentence == r_host[0].sentence
        np.testing.assert_allclose(
            r_native[0].lm_score, r_host[0].lm_score, rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            r_native[0].ac_score, r_host[0].ac_score, rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            r_device[0].lm_score, r_host[0].lm_score, rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            r_device[0].ac_score, r_host[0].ac_score, rtol=1e-3, atol=1e-3
        )


def test_first_beam_oracle_restricts_extensions(setup):
    """With first_beam_size=1 only the frame-best phone can extend; the oracle
    must still find the clean-path sentence (its phones are frame-best)."""
    lexicon, lm, _, _ = setup
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=3,
                       beam_width=32, beam=0.0, first_beam_size=1)
    lp = noisy_logprobs(lexicon.sentence_to_phonemes("the cat"), seed=0, noise=0.0)
    host = LexiconBeamSearch(lexicon, lm, cfg)
    host.decode(lp)
    assert host.finish_decoding()[0].sentence == "the cat"


def test_homophone_cap_drop_policy_crosschecked(tmp_path):
    """When a homophone class EXCEEDS max_homophones, all three backends
    drop the same members: the least-likely by unigram (stable on ties).
    Guards the round-4 unification (TrieArrays / lmbeam._node_words /
    decoder.cc b2t_create sort)."""
    lex_words = {
        # a 4-member class on one pronunciation; 'vfreq' is the most
        # frequent in the corpus, 'vrare' the rarest
        "vfreq": ["V", "IY"],
        "vmid1": ["V", "IY"],
        "vmid2": ["V", "IY"],
        "vrare": ["V", "IY"],
        "the": ["DH", "AH"],
        "cat": ["K", "AE", "T"],
    }
    corpus = (
        ["the vfreq cat".split()] * 12
        + ["the vmid1 cat".split()] * 6
        + ["the vmid2 cat".split()] * 3
        + ["the vrare cat".split()] * 1
        + ["the cat".split()] * 2
    )
    lexicon = Lexicon.from_words(lex_words)
    lm = train_ngram(corpus, order=2)
    arpa = str(tmp_path / "lm.arpa"); lm.to_arpa(arpa)
    lexp = str(tmp_path / "lexicon.txt")
    with open(lexp, "w") as f:
        for w, p in lex_words.items():
            f.write(f"{w.upper()}  {' '.join(p)}\n")

    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10,
                       beam_width=48, beam=0.0, sum_mode=False)
    H = 2  # cap BELOW the class size of 4
    host = LexiconBeamSearch(lexicon, lm, cfg, max_homophones=H)
    native = NativeLexiconBeamSearch(arpa, lexp, cfg, max_homophones=H)
    dev = DeviceLexiconBeamSearch(lexicon, lm, cfg, max_homophones=H)

    lp = noisy_logprobs(lexicon.sentence_to_phonemes("the vfreq cat"),
                        seed=5, noise=0.3)
    outs = {}
    for name, s in (("host", host), ("native", native), ("device", dev)):
        s.reset(); s.decode(lp)
        outs[name] = s.finish_decoding()
    sents = {name: [r.sentence for r in rs] for name, rs in outs.items()}
    assert sents["host"] == sents["native"] == sents["device"], sents
    # the two most likely class members survive the cap; the rare ones drop
    joined = " ".join(sents["host"])
    assert "vfreq" in joined and "vmid1" in joined
    assert "vrare" not in joined and "vmid2" not in joined
    for name in ("native", "device"):
        np.testing.assert_allclose(
            [r.lm_score for r in outs[name][:3]],
            [r.lm_score for r in outs["host"][:3]], rtol=1e-4, atol=1e-4)


def test_finalize_length_penalty_open_word(setup):
    """length_penalty != 0 with the utterance CUT MID-WORD (no trailing
    silence): the end-of-utterance close must add length_penalty in all
    three backends (lmbeam.py:304 / decoder.cc:654 / device finalize —
    the device omission was round-4's parity bug)."""
    lexicon, lm, arpa, lexp = setup
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=5,
                       beam_width=48, beam=0.0, length_penalty=0.7,
                       sum_mode=False)
    ids = lexicon.sentence_to_phonemes("the cat")
    lp = noisy_logprobs(ids[:-1], seed=9, noise=0.2)  # drop trailing SIL

    host = LexiconBeamSearch(lexicon, lm, cfg)
    native = NativeLexiconBeamSearch(arpa, lexp, cfg)
    dev = DeviceLexiconBeamSearch(lexicon, lm, cfg)
    outs = {}
    for name, s in (("host", host), ("native", native), ("device", dev)):
        s.reset(); s.decode(lp)
        outs[name] = s.finish_decoding()
    assert outs["host"][0].sentence == "the cat"
    assert [r.sentence for r in outs["device"][:3]] == \
        [r.sentence for r in outs["host"][:3]]
    assert [r.sentence for r in outs["native"][:3]] == \
        [r.sentence for r in outs["host"][:3]]
    for name in ("native", "device"):
        np.testing.assert_allclose(
            [r.lm_score for r in outs[name][:3]],
            [r.lm_score for r in outs["host"][:3]], rtol=1e-4, atol=1e-4)
