"""Rescoring: word alignment, n-best augmentation, n-gram + LLM rescoring."""

import numpy as np
import pytest

from b2txt_tpu.decode.rescore import (
    NGramLLMAdapter,
    augment_nbest,
    get_string_differences,
    llm_rescore,
    llm_rescore_async,
    rescore_nbest_with_ngram,
)
from b2txt_tpu.lm import train_ngram

CORPUS = [
    "the cat sat on the mat".split(),
    "the dog sat on the mat".split(),
    "the cat is here".split(),
] * 5


def test_get_string_differences_identical():
    cost, path, hl = get_string_differences("a b c", "a b c")
    assert cost == 0
    assert path == [0, 1, 2]
    assert hl == []


def test_get_string_differences_substitution():
    cost, path, hl = get_string_differences("the cat sat", "the dog sat")
    assert cost == 1
    assert path[1] == "R"
    assert hl == [(4, 7)]  # "dog" span in decoder output


def test_get_string_differences_deletion_insertion():
    cost, _, _ = get_string_differences("a b c d", "a c d")
    assert cost == 1
    cost, path, _ = get_string_differences("a c", "a b c")
    assert cost == 1
    assert "D" in path


def test_augment_nbest_swaps():
    nbest = [
        ("the cat sat", -10.0, -5.0),
        ("the dog sat", -11.0, -6.0),
    ]
    out = augment_nbest(nbest, top_candidates_to_augment=20, acoustic_scale=0.3)
    sentences = [s for s, _, _ in out]
    # originals survive; no new sentences possible (swap reproduces originals)
    assert "the cat sat" in sentences and "the dog sat" in sentences
    nbest = [
        ("the cat sat here", -10.0, -5.0),
        ("the dog sat there", -11.0, -6.0),
    ]
    out = augment_nbest(nbest, acoustic_scale=0.3)
    sentences = [s for s, _, _ in out]
    assert "the dog sat here" in sentences
    assert "the cat sat there" in sentences
    # augmented candidates carry the penalized mean scores
    row = [r for r in out if r[0] == "the dog sat here"][0]
    assert row[1] == pytest.approx(np.mean([-10, -11]) - 0.01 * abs(np.mean([-10, -11])))


def test_augment_skips_unequal_lengths():
    nbest = [("a b c", -1.0, -1.0), ("a b", -2.0, -2.0)]
    out = augment_nbest(nbest)
    assert len(out) == 2


def test_rescore_with_ngram_changes_scores():
    lm = train_ngram(CORPUS, order=3)
    nbest = [("the cat sat on the mat", -10.0, -99.0),
             ("the zzz sat on the mat", -10.0, -1.0)]
    out = rescore_nbest_with_ngram(nbest, lm)
    scores = {s: l for s, _, l in out}
    assert scores["the cat sat on the mat"] > scores["the zzz sat on the mat"]


def test_llm_rescore_blend_and_confidence():
    lm = train_ngram(CORPUS, order=2)
    scorer = NGramLLMAdapter(lm)
    nbest = [("the cat sat on the mat", -5.0, -8.0),
             ("the cat sat on the zzz", -4.9, -9.0)]
    out = llm_rescore(scorer, nbest, acoustic_scale=0.3, alpha=0.9)
    assert out.best == "the cat sat on the mat"
    assert 0.0 < out.confidence <= 1.0
    assert len(out.nbest) == 2
    s, a, n, l, t = out.nbest[0]
    np.testing.assert_allclose(t, 0.3 * a + 0.1 * n + 0.9 * l, rtol=1e-9)


def test_llm_rescore_context_roundtrip():
    lm = train_ngram(CORPUS, order=2)

    class Capture:
        def __init__(self):
            self.seen = []

        def score(self, texts, length_penalty=0.0):
            self.seen = list(texts)
            return [0.0] * len(texts)

    cap = Capture()
    out = llm_rescore(cap, [("the cat", -1.0, -1.0)], 0.3, 0.5, context="hello there")
    assert cap.seen[0].startswith("hello there the cat")
    assert out.best == "the cat"  # context stripped from output


def test_llm_rescore_error_fallback():
    class Flaky:
        def score(self, texts, length_penalty=0.0):
            raise RuntimeError("boom")

    out = llm_rescore(Flaky(), [("a b", -1.0, -2.0)], 0.3, 0.5)
    # falls back to zeros for LLM scores rather than crashing
    assert out.nbest[0][3] == 0.0


def test_llm_rescore_nonfinite_fallback():
    """NaN/inf scorer output is treated like a scorer failure (zeros), not
    blended — a NaN total would win argmax and corrupt the pick."""
    class NaNScorer:
        def score(self, texts, length_penalty=0.0):
            return [float("nan")] * len(texts)

    out = llm_rescore(NaNScorer(), [("a b", -1.0, -2.0), ("c d", -1.5, -1.0)],
                      0.3, 0.5)
    assert all(row[3] == 0.0 for row in out.nbest)
    assert np.isfinite([row[4] for row in out.nbest]).all()


def test_llm_rescore_async_sync_fallback_parity():
    """Scorers without score_async produce byte-identical RescoreOutput
    through the async entry point."""
    lm = train_ngram(CORPUS, order=2)
    nbest = [("a b", -1.0, -2.0), ("c d", -1.5, -1.0), ("", -9.0, -9.0)]
    sync = llm_rescore(NGramLLMAdapter(lm), nbest, 0.3, 0.5, length_penalty=0.1)
    out = llm_rescore_async(NGramLLMAdapter(lm), nbest, 0.3, 0.5,
                            length_penalty=0.1)()
    assert out == sync


def test_llm_rescore_async_dispatch_then_fetch():
    """With a score_async scorer the forward is dispatched at begin time and
    fetched only inside the thunk — and the blended output matches the sync
    path on the same scores."""
    calls = []

    class AsyncScorer:
        def score(self, texts, length_penalty=0.0):
            calls.append("sync")
            return [-float(len(t)) for t in texts]

        def score_async(self, texts, length_penalty=0.0):
            calls.append("begin")

            def fetch():
                calls.append("fetch")
                return [-float(len(t)) for t in texts]

            return fetch

    nbest = [("a b", -1.0, -2.0), ("c", -1.5, -1.0)]
    thunk = llm_rescore_async(AsyncScorer(), nbest, 0.3, 0.5)
    assert calls == ["begin"]
    out = thunk()
    assert calls == ["begin", "fetch"]
    assert out == llm_rescore(AsyncScorer(), nbest, 0.3, 0.5)


def test_llm_rescore_async_fetch_failure_falls_back():
    """A fetch-time failure goes through the same batched-retry path as the
    sync entry point (reference :214-226)."""
    class FailFetch:
        def score(self, texts, length_penalty=0.0):  # the retry succeeds
            return [0.5] * len(texts)

        def score_async(self, texts, length_penalty=0.0):
            def fetch():
                raise RuntimeError("tunnel dropped")

            return fetch

    out = llm_rescore_async(FailFetch(), [("a b", -1.0, -2.0)], 0.3, 0.5)()
    assert out.nbest[0][3] == 0.5


def test_llm_rescore_context_split_for_supporting_scorers():
    """A scorer advertising supports_context gets bare hypotheses plus the
    context as a separate argument (the prefix-KV path), and the result
    equals a plain scorer fed the concatenated strings — for any scoring
    function of the concatenation."""
    seen = {}

    class CtxScorer:
        supports_context = True

        def score(self, texts, length_penalty=0.0, context=None):
            seen["texts"] = list(texts)
            seen["context"] = context
            full = [(context + " " + t) if context else t for t in texts]
            return [-float(len(f)) + length_penalty for f in full]

    class PlainScorer:
        def score(self, texts, length_penalty=0.0):
            return [-float(len(t)) + length_penalty for t in texts]

    nbest = [("a b", -1.0, -2.0), ("c longer hyp", -1.5, -1.0)]
    ctx = "shared context"
    out = llm_rescore(CtxScorer(), nbest, 0.3, 0.5, length_penalty=0.2,
                      context=ctx)
    want = llm_rescore(PlainScorer(), nbest, 0.3, 0.5, length_penalty=0.2,
                       context=ctx)
    assert seen["context"] == ctx and seen["texts"] == ["a b", "c longer hyp"]
    assert out == want
    # async entry point: same split, same result
    out2 = llm_rescore_async(CtxScorer(), nbest, 0.3, 0.5,
                             length_penalty=0.2, context=ctx)()
    assert out2 == want


def test_llm_rescore_empty():
    lm = train_ngram(CORPUS, order=2)
    out = llm_rescore(NGramLLMAdapter(lm), [("", -1.0, -1.0)], 0.3, 0.5)
    assert out.best == "" and out.nbest == []
