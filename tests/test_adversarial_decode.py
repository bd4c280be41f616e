"""Decode on the homophone-dense adversarial fixture (CMUdict collision
statistics + Zipfian corpus, data/adversarial.py) — the see/sea regime the
round-2 synthetic world lacked.

Checks: (1) the three searcher backends still agree on this hard fixture,
(2) decode quality numbers, (3) the pool-vs-lattice question — how often the
truth is IN the surviving candidate pool (so n-best/pool rescoring can rescue
it, matching brain_speech_decoder.cc:61-101's lattice rescore), vs absent
entirely (where only a true lattice could help)."""

import os
import tempfile

import numpy as np
import pytest

from b2txt_tpu.data.adversarial import (
    homophone_lexicon, lexicon_stats, zipf_corpus,
)
from b2txt_tpu.data.synthetic import ctc_logprobs
from b2txt_tpu.decode.lmbeam import LexiconBeamSearch
from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch
from b2txt_tpu.decode.rescore import rescore_nbest_with_ngram, results_to_nbest
from b2txt_tpu.lm import Lexicon, train_ngram
from b2txt_tpu.lm.ngram import NGramLM
from b2txt_tpu.runtime import NativeLexiconBeamSearch
from b2txt_tpu.utils.config import DecodeConfig

VOCAB = 3000
H = 6  # homophone classes in the fixture go up to 6 (CMUdict has up to 10)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    words, by_freq = homophone_lexicon(rng, VOCAB)
    stats = lexicon_stats(words)
    assert stats["homophone_word_frac"] > 0.15   # the fixture IS adversarial
    assert stats["prefix_pron_frac"] > 0.10
    lexicon = Lexicon.from_words(words)

    corpus = zipf_corpus(rng, by_freq, 4000)
    corpus += [[w] for w in words]               # every word LM-covered
    lm_full = train_ngram(corpus, order=3)
    lm = lm_full.prune(3e-8)

    tmp = tempfile.mkdtemp()
    arpa = os.path.join(tmp, "lm.arpa")
    lm.to_arpa(arpa)
    arpa_full = os.path.join(tmp, "lm_full.arpa")
    lm_full.to_arpa(arpa_full)
    lexp = os.path.join(tmp, "lexicon.txt")
    with open(lexp, "w") as f:
        for w, p in words.items():
            f.write(f"{w.upper()}  {' '.join(p)}\n")

    # Zipfian test sentences with homophone-dense words
    draw_rng = np.random.default_rng(40)
    utts = []
    for _ in range(24):
        ws = [by_freq[r] for r in
              np.random.default_rng(draw_rng.integers(1 << 31)).choice(
                  min(800, VOCAB), size=5)]
        ids = lexicon.sentence_to_phonemes(" ".join(ws))
        lp = ctc_logprobs(draw_rng, ids, hot=12.0, noise=0.3)
        utts.append((" ".join(ws), lp))
    return lexicon, lm, lm_full, arpa, arpa_full, lexp, utts, stats


CFG = dict(acoustic_scale=0.325, blank_penalty=90.0, nbest=100,
           beam_width=96, beam=17.0, first_beam_size=8, sum_mode=False)


def test_three_backends_agree_on_homophone_fixture(world):
    lexicon, lm, lm_full, arpa, arpa_full, lexp, utts, stats = world
    cfg = DecodeConfig(**CFG)
    host = LexiconBeamSearch(lexicon, lm, cfg, max_homophones=H)
    native = NativeLexiconBeamSearch(arpa, lexp, cfg, max_homophones=H)
    device = DeviceLexiconBeamSearch(lexicon, lm, cfg, max_homophones=H)

    lens = np.array([lp.shape[0] for _, lp in utts[:8]], np.int32)
    T = int(lens.max())
    batch = np.full((8, T, 41), -20.0, np.float32)
    for i, (_, lp) in enumerate(utts[:8]):
        batch[i, : lp.shape[0]] = lp
    dev_out = device.decode_batch(batch, lens)

    for i, (sent, lp) in enumerate(utts[:8]):
        host.reset()
        host.decode(lp)
        h = host.finish_decoding()
        native.reset()
        native.decode(lp)
        n = native.finish_decoding()
        d = dev_out[i]
        assert h and n and d

        def total(r):
            return cfg.acoustic_scale * r.ac_score + r.lm_score

        # homophone pairs can produce EXACT score ties (identical prons,
        # identical backed-off LM scores); any backend may order a tie either
        # way, so agreement is: same sentence, or same total score.
        assert h[0].sentence == n[0].sentence or abs(
            total(h[0]) - total(n[0])
        ) < 1e-3, f"utt {i}: host={h[0]!r} native={n[0]!r}"
        assert h[0].sentence == d[0].sentence or abs(
            total(h[0]) - total(d[0])
        ) < 1e-3, f"utt {i}: host={h[0]!r} device={d[0]!r}"


def test_decode_quality_and_pool_rescue(world):
    """Decode the full utterance set with the pruned LM; report exact-match,
    pool-rescue (unpruned rescoring fixes top-1), and truth-in-pool rates.
    The truth-in-pool rate bounds what pool rescoring can ever rescue — the
    gap to 100% is the lattice-rescoring question."""
    lexicon, lm, lm_full, arpa, arpa_full, lexp, utts, stats = world
    cfg = DecodeConfig(**CFG)
    native = NativeLexiconBeamSearch(arpa, lexp, cfg, max_homophones=H)

    def total(ac, lm_s):
        return cfg.acoustic_scale * ac + lm_s

    exact = rescued = in_pool = search_errors = homophone_misses = 0
    pron_of = {w: tuple(p) for w, p in
               ((wd, lexicon.prons[lexicon.word_ids[wd]][0])
                for wd in lexicon.words)}
    for sent, lp in utts:
        native.reset()
        native.decode(lp)
        res = native.finish_decoding()
        assert res
        top1 = res[0].sentence
        if top1 == sent:
            exact += 1
            in_pool += 1
            continue
        pool = {r.sentence: r for r in res}
        if sent in pool:
            in_pool += 1
            # search error = the truth OUTSCORES the returned top-1 (a real
            # decoder failure); anything else is a model-optimal miss
            tr = pool[sent]
            if total(tr.ac_score, tr.lm_score) > total(
                res[0].ac_score, res[0].lm_score
            ) + 1e-3:
                search_errors += 1
            nbest = rescore_nbest_with_ngram(results_to_nbest(res), lm_full)
            best = max(
                nbest, key=lambda t: cfg.acoustic_scale * t[1] + t[2]
            )
            if best[0] == sent:
                rescued += 1
        # classify the miss: homophone-substitution-only?
        tw, ow = sent.split(), top1.split()
        if len(tw) == len(ow) and all(
            a == b or pron_of.get(a) == pron_of.get(b)
            for a, b in zip(tw, ow)
        ):
            homophone_misses += 1
    n = len(utts)
    misses = n - exact
    print(f"\nadversarial stats={stats}")
    print(f"exact={exact}/{n} in_pool={in_pool}/{n} rescued={rescued} "
          f"search_errors={search_errors} "
          f"homophone_misses={homophone_misses}/{misses}")
    # the searcher keeps the truth reachable for pool rescoring essentially
    # always — the pool-vs-lattice equivalence evidence on a HARD fixture
    assert in_pool >= int(0.9 * n)
    # no result may OUTSCORE-lose to the truth: misses must be model-optimal
    assert search_errors == 0
    # and misses must be true homophone ambiguities, not word-boundary or
    # pruning failures
    assert homophone_misses >= int(0.8 * misses)
    assert exact >= int(0.3 * n)


def test_close_probe_top_guard(world):
    """Regression net for the close_probe_top approximation (VERDICT r4
    weak #6): probing grams for only the top-C unigram-ranked homophones is
    byte-identical WITH the on-chip pool rescore attached, because tail
    slots carry the exact backoff-chain score and the rescore restores
    exact scores on survivors. This guard decodes randomized homophone-
    dense utterances with exact probing vs close_top=2 and fails on any
    quality divergence beyond score ties — detecting a future world/config
    where the approximation silently costs quality."""
    lexicon, lm, lm_full, arpa, arpa_full, lexp, utts, stats = world
    cfg = DecodeConfig(**CFG)
    exact = DeviceLexiconBeamSearch(lexicon, lm, cfg, max_homophones=H,
                                    rescore_lm=lm_full)
    capped = DeviceLexiconBeamSearch(lexicon, lm, cfg, max_homophones=H,
                                     rescore_lm=lm_full, close_probe_top=2)

    lens = np.array([lp.shape[0] for _, lp in utts], np.int32)
    T = int(lens.max())
    batch = np.full((len(utts), T, 41), -20.0, np.float32)
    for i, (_, lp) in enumerate(utts):
        batch[i, : lp.shape[0]] = lp
    out_e = exact.decode_batch(batch, lens)
    out_c = capped.decode_batch(batch, lens)

    def total(r):
        return cfg.acoustic_scale * r.ac_score + r.lm_score

    for i, (sent, _) in enumerate(utts):
        e, c = out_e[i], out_c[i]
        assert e and c
        # top-1: same sentence, or an exact-score homophone tie
        assert e[0].sentence == c[0].sentence or abs(
            total(e[0]) - total(c[0])
        ) < 1e-3, f"utt {i}: exact={e[0]!r} capped={c[0]!r}"
        # the rescored pools must carry identical scores for shared
        # sentences (the rescore restores exactness on survivors)
        de = {r.sentence: total(r) for r in e}
        dc = {r.sentence: total(r) for r in c}
        for s in set(de) & set(dc):
            assert abs(de[s] - dc[s]) < 1e-3, (i, s, de[s], dc[s])
