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
