"""Grouped LLM finalize: several utterances' n-best lists scored in ONE
packed call (serve/service.py llm_group_candidates,
decode/rescore.py llm_rescore_group_async) must be output-identical to the
per-utterance path — the packed OPT forward scores independent segments
under block-diagonal attention, so call grouping cannot change scores."""

import numpy as np
import pytest

from b2txt_tpu.decode.lmbeam import DecodeResult
from b2txt_tpu.decode.rescore import (
    llm_rescore,
    llm_rescore_async,
    llm_rescore_group_async,
)
from b2txt_tpu.lm import Lexicon, train_ngram
from b2txt_tpu.serve import DecoderService
from b2txt_tpu.utils.config import DecodeConfig

LEX = {
    "the": ["DH", "AH"],
    "cat": ["K", "AE", "T"],
    "sat": ["S", "AE", "T"],
    "mat": ["M", "AE", "T"],
    "on": ["AA", "N"],
}


@pytest.fixture(scope="module")
def lexicon():
    return Lexicon.from_words(LEX)


@pytest.fixture(scope="module")
def lm():
    corpus = [
        "the cat sat on the mat".split(),
        "the cat sat".split(),
        "the mat".split(),
    ] * 5
    return train_ngram(corpus, order=3)


def _nbests(n_utts: int, per: int = 4):
    words = ["the", "cat", "sat", "mat", "on"]
    out = []
    for u in range(n_utts):
        nb = []
        for c in range(per):
            sent = " ".join(words[(u + c + k) % len(words)]
                            for k in range(2 + (u + c) % 3))
            nb.append((sent, -1.0 - u - 0.1 * c, -2.0 - 0.2 * c))
        out.append(nb)
    return out


def test_group_matches_per_utterance_tiny_opt():
    """Grouped scoring through the REAL packed OPT path (tiny config, CPU)
    equals per-utterance llm_rescore_async exactly."""
    import jax.numpy as jnp

    from b2txt_tpu.decode.opt_lm import OPTConfig, OPTRescorer

    resc = OPTRescorer(OPTConfig.tiny(), max_len=24, compute_dtype=jnp.float32)
    nbests = _nbests(5)
    grouped = [f() for f in llm_rescore_group_async(
        resc, nbests, acoustic_scale=0.3, alpha=0.5, length_penalty=0.1)]
    single = [llm_rescore_async(resc, nb, 0.3, 0.5, length_penalty=0.1)()
              for nb in nbests]
    for g, s in zip(grouped, single):
        assert g.best == s.best
        assert g.confidence == pytest.approx(s.confidence, abs=1e-6)
        for rg, rs in zip(g.nbest, s.nbest):
            assert rg[0] == rs[0]
            np.testing.assert_allclose(rg[1:], rs[1:], atol=1e-4)


def test_group_empty_and_order():
    """Empty n-best lists inside a group yield empty outputs in place."""

    class Scorer:
        def score(self, texts, length_penalty=0.0):
            return [-float(len(t)) for t in texts]

    nbests = _nbests(4)
    nbests.insert(2, [])  # an utterance with no candidates
    outs = [f() for f in llm_rescore_group_async(
        Scorer(), nbests, acoustic_scale=0.3, alpha=0.5)]
    assert outs[2].best == "" and outs[2].nbest == []
    singles = [llm_rescore(Scorer(), nb, 0.3, 0.5) if nb else None
               for nb in nbests]
    for i, (g, s) in enumerate(zip(outs, singles)):
        if i == 2:
            continue
        assert g.best == s.best and g.nbest == s.nbest


def test_group_fetch_failure_falls_back_per_utterance():
    """A non-finite group fetch falls back to each utterance's batched-retry
    path (matching llm_rescore_async failure semantics), fetching the group
    only once."""
    calls = {"async": 0, "sync": 0}

    class FlakyScorer:
        def score(self, texts, length_penalty=0.0):
            calls["sync"] += 1
            return [-float(len(t)) for t in texts]

        def score_async(self, texts, length_penalty=0.0):
            calls["async"] += 1
            return lambda: [float("nan")] * len(texts)

    nbests = _nbests(3)
    outs = [f() for f in llm_rescore_group_async(
        FlakyScorer(), nbests, acoustic_scale=0.3, alpha=0.5)]
    assert calls["async"] == 1  # one group dispatch, no re-fetch per thunk
    assert calls["sync"] >= 3  # per-utterance fallback rescues each
    for g, nb in zip(outs, nbests):
        s = llm_rescore(FlakyScorer(), nb, 0.3, 0.5)
        assert g.best == s.best and g.nbest == s.nbest


def _pipelined_service(lexicon, lm, scorer, group):
    return DecoderService(
        lexicon, lm,
        DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=5,
                     do_opt=True, alpha=0.5),
        llm=scorer, channel_order="model", llm_group_candidates=group,
    )


def test_service_grouped_pipeline_parity(lexicon, lm):
    """_finalize_pipelined with llm_group_candidates>0: identical outputs to
    the per-utterance path, far fewer scorer calls, order preserved across
    the dispatch window, and group size bounded by the candidate cap."""
    sizes = []

    class CountingScorer:
        def score(self, texts, length_penalty=0.0):
            sizes.append(len(texts))
            return [-float(len(t)) for t in texts]

        def score_async(self, texts, length_penalty=0.0):
            sizes.append(len(texts))
            return lambda: [-float(len(t)) for t in texts]

    def batched():
        out = []
        for b in range(3):
            lists = [[DecodeResult(f"utt {b * 30 + i}", -1.0 - i, -2.0),
                      DecodeResult(f"utt {b * 30 + i} x", -2.0 - i, -2.5)]
                     for i in range(30)]
            out.append((30, lists))
        return out

    svc_g = _pipelined_service(lexicon, lm, CountingScorer(), group=24)
    outs_g = svc_g._finalize_pipelined(iter(batched()))
    grouped_calls = len(sizes)
    assert max(sizes) <= 24
    sizes.clear()

    svc_1 = _pipelined_service(lexicon, lm, CountingScorer(), group=0)
    outs_1 = svc_1._finalize_pipelined(iter(batched()))
    assert grouped_calls < len(sizes) / 2  # real call amortization
    assert [o.sentence for o in outs_g] == [o.sentence for o in outs_1]
    for a, b in zip(outs_g, outs_1):
        assert a.nbest == b.nbest and a.confidence == b.confidence


def test_serial_decode_utterances_grouped_parity(lexicon, lm):
    """The serial (python/native backend) decode_utterances path inherits
    grouping via _finalize_pipelined: grouped == ungrouped outputs on real
    beam-search results."""
    sizes = []

    class CountingScorer:
        def score(self, texts, length_penalty=0.0):
            sizes.append(len(texts))
            return [-float(len(t)) for t in texts]

    def clean_logits(phoneme_ids, n_classes=41, frames_per=3, hot=6.0):
        rows = []
        for pid in phoneme_ids:
            rows += [np.full(n_classes, -hot, np.float32)] * frames_per
            for r in rows[-frames_per:]:
                r[pid] = hot
            blank = np.full(n_classes, -hot, np.float32)
            blank[0] = hot
            rows.append(blank)
        return np.stack(rows)

    sents = ["the cat", "the mat", "the cat sat", "the mat on the cat"]
    logits = [clean_logits(lexicon.sentence_to_phonemes(s)) for s in sents]

    outs = {}
    for group in (0, 12):
        svc = _pipelined_service(lexicon, lm, CountingScorer(), group=group)
        svc.channel_order = "model"
        outs[group] = svc.decode_utterances(logits)
    assert [o.sentence for o in outs[12]] == sents
    for a, b in zip(outs[12], outs[0]):
        assert a.sentence == b.sentence and a.nbest == b.nbest


def test_service_group_gated_off_by_context(lexicon, lm):
    """Conversational context (per-utterance prefix state) must bypass the
    grouped path — it dispatches one call per utterance with the context."""
    ctx_calls = []

    class CtxScorer:
        supports_context = True

        def score(self, texts, length_penalty=0.0, context=None):
            ctx_calls.append((len(texts), context))
            return [-float(len(t)) for t in texts]

    svc = _pipelined_service(lexicon, lm, CtxScorer(), group=24)
    svc.set_context("hello there")
    lists = [[DecodeResult(f"utt {i}", -1.0, -2.0)] for i in range(6)]
    outs = svc._finalize_pipelined(iter([(6, lists)]))
    assert len(outs) == 6
    assert len(ctx_calls) == 6  # one per utterance, not one group
    assert all(c == "hello there" for _, c in ctx_calls)
