"""Guard for the letter-spelling recipe (examples/spelling_demo.py) — the
reference capability shipped as examples/handwriting/s0 + the speech
spelling LM (spelling_lm/make_corpus.py), VERDICT r4 missing #4."""

from examples.spelling_demo import main, spelled_corpus


def test_spelling_demo_decodes_words():
    n_ok = main(n_utts=10, seed=1, verbose=False)
    # letter names are acoustically confusable (a=EY vs h=EY CH); the demo
    # must still spell the clear majority exactly
    assert n_ok >= 7, n_ok


def test_spelling_corpus_source():
    corpus = spelled_corpus()
    assert all(all(len(c) == 1 and c.isalpha() for c in w) for w in corpus)
    assert len(corpus) >= 25


def test_lattice_demo():
    """Guard for examples/lattice_demo.py — deep lattice lists through the
    standard service vs the pool finalize."""
    from examples.lattice_demo import main

    res = main(n_utts=3, seed=1, verbose=False)
    assert res["lattice"]["mean_depth"] > 3 * res["pool"]["mean_depth"]
    assert res["lattice"]["top1_wer"] <= res["pool"]["top1_wer"]
