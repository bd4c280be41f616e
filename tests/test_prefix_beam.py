"""Prefix beam search correctness: the C++ gtest fixture (hand-computed 3-frame
example from ctc_prefix_beam_search_test.cc), exhaustive-path cross-checks, and
numpy↔JAX agreement."""

import math

import numpy as np
import pytest

from b2txt_tpu.decode import (
    CtcPrefixBeamSearch,
    ctc_prefix_beam_search,
    ctc_prefix_beam_search_jax,
)


@pytest.fixture
def wenet_fixture():
    data = np.array(
        [[0.25, 0.40, 0.35], [0.40, 0.35, 0.25], [0.10, 0.50, 0.40]],
        dtype=np.float32,
    )
    return np.log(data)


def test_cpp_gtest_fixture(wenet_fixture):
    """Expected values from ctc_prefix_beam_search_test.cc:29-59."""
    s = CtcPrefixBeamSearch(blank=0, first_beam_size=3, second_beam_size=3)
    s.search(wenet_fixture)
    assert s.hypotheses[0] == [2, 1]
    assert s.hypotheses[1] == [1, 2]
    assert s.hypotheses[2] == [1]
    np.testing.assert_allclose(np.exp(s.likelihood), [0.2185, 0.1550, 0.1525], rtol=1e-5)
    np.testing.assert_allclose(
        np.exp(s.viterbi_likelihood), [0.07, 0.064, 0.07], rtol=1e-5
    )
    assert s.times[0] == [0, 2]
    assert s.times[1] == [0, 2]
    assert s.times[2] == [2]


def test_incremental_equals_oneshot(rng):
    lp = np.log(
        rng.dirichlet(np.ones(5), size=12).astype(np.float32)
    )
    full = CtcPrefixBeamSearch(blank=0, first_beam_size=5, second_beam_size=8)
    full.search(lp)
    chunked = CtcPrefixBeamSearch(blank=0, first_beam_size=5, second_beam_size=8)
    chunked.search(lp[:5])
    chunked.search(lp[5:])
    assert full.hypotheses == chunked.hypotheses
    np.testing.assert_allclose(full.likelihood, chunked.likelihood, rtol=1e-10)


def _brute_force_ctc(lp, max_len=None):
    """Exact prefix posteriors by enumerating all alignment paths."""
    T, V = lp.shape
    from itertools import product

    scores = {}
    for path in product(range(V), repeat=T):
        logp = sum(lp[t, c] for t, c in enumerate(path))
        # collapse
        out = []
        prev = None
        for c in path:
            if c != prev and c != 0:
                out.append(c)
            prev = c
        key = tuple(out)
        scores[key] = np.logaddexp(scores.get(key, -np.inf), logp)
    return scores


def test_full_beam_is_exact(rng):
    """With beam >= number of distinct prefixes, scores equal the exact sums."""
    lp = np.log(rng.dirichlet(np.ones(3), size=5).astype(np.float64))
    s = CtcPrefixBeamSearch(blank=0, first_beam_size=3, second_beam_size=1000)
    s.search(lp)
    exact = _brute_force_ctc(lp)
    checked = 0
    for hyp, like in zip(s.hypotheses, s.likelihood):
        if not math.isfinite(like):
            continue  # unreachable prefixes kept by the oversized beam
        np.testing.assert_allclose(like, exact[tuple(hyp)], rtol=1e-6)
        checked += 1
    assert checked >= len(exact) * 0.9  # essentially all reachable prefixes


def test_jax_matches_numpy_fixture(wenet_fixture):
    res = ctc_prefix_beam_search_jax(wenet_fixture, beam_width=3, nbest=3)
    assert res[0][0] == [2, 1]
    assert res[1][0] == [1, 2]
    assert res[2][0] == [1]
    np.testing.assert_allclose(
        np.exp([r[1] for r in res]), [0.2185, 0.1550, 0.1525], rtol=1e-5
    )


def test_jax_matches_numpy_random(rng):
    V, T = 6, 40
    lp = np.log(rng.dirichlet(np.ones(V), size=T).astype(np.float32))
    ref = ctc_prefix_beam_search(lp, beam_size=16)
    got = ctc_prefix_beam_search_jax(lp, beam_width=16, nbest=16)
    # same top hypothesis and score
    assert got[0][0] == ref[0][0]
    np.testing.assert_allclose(got[0][1], ref[0][1], rtol=1e-4)
    # nbest sets largely agree (tail order can differ at equal scores)
    ref_set = {tuple(h): s for h, s in ref[:8]}
    for h, s in got[:8]:
        assert tuple(h) in ref_set
        np.testing.assert_allclose(s, ref_set[tuple(h)], rtol=1e-4, atol=1e-5)


def test_jax_first_beam_pruning(rng):
    V, T = 8, 20
    lp = np.log(rng.dirichlet(np.ones(V), size=T).astype(np.float32))
    ref = ctc_prefix_beam_search(lp, beam_size=12, first_beam_size=3)
    got = ctc_prefix_beam_search_jax(lp, beam_width=12, first_beam_size=3, nbest=4)
    assert got[0][0] == ref[0][0]
    np.testing.assert_allclose(got[0][1], ref[0][1], rtol=1e-4)


def test_jax_input_length_masking(rng):
    V, T = 5, 30
    lp = np.log(rng.dirichlet(np.ones(V), size=T).astype(np.float32))
    short = ctc_prefix_beam_search_jax(lp[:18], beam_width=8)
    masked = ctc_prefix_beam_search_jax(lp, input_length=18, beam_width=8)
    assert short[0][0] == masked[0][0]
    np.testing.assert_allclose(short[0][1], masked[0][1], rtol=1e-5)
