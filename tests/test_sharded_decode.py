"""Mesh-sharded device decode == single-device decode.

The batch shards over the mesh's "data" axis and the n-gram bucket table
row-shards over the same devices' HBM (lm/device_ngram.py ShardedNGram:
all_gather keys → masked local gather → psum). This is the capacity design
for reference-scale LMs — the ~300 GB-RAM 5-gram (reference README.md:101)
splits D ways instead of living on one host."""

import os
import tempfile

import numpy as np
import pytest

import jax
from jax.sharding import Mesh, PartitionSpec as P

from b2txt_tpu.data.synthetic import ctc_logprobs
from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch
from b2txt_tpu.lm import Lexicon, train_ngram
from b2txt_tpu.utils.config import DecodeConfig

LEX = {
    "the": ["DH", "AH"], "cat": ["K", "AE", "T"], "sat": ["S", "AE", "T"],
    "mat": ["M", "AE", "T"], "on": ["AA", "N"], "dog": ["D", "AO", "G"],
    "a": ["AH"], "and": ["AE", "N", "D"], "saw": ["S", "AO"],
    "their": ["DH", "EH", "R"], "there": ["DH", "EH", "R"],
    "rug": ["R", "AH", "G"], "is": ["IH", "Z"],
}
CORPUS = [
    "the cat sat on the mat".split(),
    "the dog sat on the rug".split(),
    "a cat and a dog is there".split(),
    "the cat saw their dog".split(),
    "there is a dog on the mat".split(),
] * 3


@pytest.fixture(scope="module")
def world():
    lexicon = Lexicon.from_words(LEX)
    lm = train_ngram(CORPUS, order=3)
    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=9.0, nbest=10,
                       beam_width=48, first_beam_size=8, sum_mode=False)
    dev = DeviceLexiconBeamSearch(lexicon, lm, cfg)
    rng = np.random.default_rng(3)
    sents = [
        "the cat sat on the mat", "there is a dog on the mat",
        "the cat saw their dog", "a cat and a dog is there",
        "the dog sat on the rug", "the cat sat on the rug",
        "there is a dog", "a dog saw the cat",
    ]
    utts = []
    for s in sents:
        ids = lexicon.sentence_to_phonemes(s)
        utts.append((s, ctc_logprobs(rng, ids, hot=10.0, noise=0.3)))
    T = max(lp.shape[0] for _, lp in utts)
    B = len(utts)
    arr = np.full((B, T, 41), -20.0, np.float32)
    lens = np.zeros(B, np.int32)
    for i, (_, lp) in enumerate(utts):
        arr[i, : lp.shape[0]] = lp
        lens[i] = lp.shape[0]
    return dev, arr, lens, [s for s, _ in utts]


def test_sharded_matches_single_device(world):
    dev, arr, lens, sents = world
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))

    ref = dev.decode_batch(arr, lens)
    got = dev.sharded_decode_batch(arr, lens, mesh=mesh, axis="data")

    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        assert [x.sentence for x in g] == [x.sentence for x in r]
        np.testing.assert_allclose(
            [x.ac_score for x in g], [x.ac_score for x in r], rtol=1e-5
        )
        np.testing.assert_allclose(
            [x.lm_score for x in g], [x.lm_score for x in r], rtol=1e-5
        )


def test_table_actually_shards(world, monkeypatch):
    """The capacity claim, verified against the CODE UNDER TEST: intercept
    sharded_decode_batch's own device_put and check the table it places is
    row-sharded 1/D per device over the decode mesh."""
    dev, arr, lens, sents = world
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    packed, cap = dev.dev_lm.table

    placed = []
    real_put = jax.device_put

    def spy_put(x, sharding=None, **kw):
        out = real_put(x, sharding, **kw)
        placed.append((x, sharding, out))
        return out

    import b2txt_tpu.decode.lmbeam_jax as M

    monkeypatch.setattr(M.jax, "device_put", spy_put)
    dev.sharded_decode_batch(arr, lens, mesh=mesh, axis="data")
    monkeypatch.undo()

    tables = [
        (x, out) for x, _, out in placed
        if getattr(x, "shape", None) == tuple(packed.shape)
    ]
    assert tables, "sharded_decode_batch never device_put the bucket table"
    _, table = tables[0]
    shard_rows = {s.data.shape[0] for s in table.addressable_shards}
    assert shard_rows == {packed.shape[0] // 8}
    assert {s.device for s in table.addressable_shards} == set(devices)


def test_uneven_batch_rejected(world):
    dev, arr, lens, sents = world
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    with pytest.raises(ValueError):
        dev.sharded_decode_batch(arr[:6], lens[:6], mesh=mesh, axis="data")


def test_pipelined_decode_batches_matches(world):
    """decode_batches (software-pipelined dispatch/collect) == decode_batch."""
    dev, arr, lens, sents = world
    ref = dev.decode_batch(arr, lens)
    half = arr.shape[0] // 2
    got = []
    for res in dev.decode_batches(
        [(arr[:half], lens[:half]), (arr[half:], lens[half:])]
    ):
        got.extend(res)
    assert [g[0].sentence for g in got] == [r[0].sentence for r in ref]
