"""Byte-level BPE tokenizer tests: handcrafted merges fixture, round-trip,
and parity against transformers' pure-python GPT2Tokenizer loaded from the
SAME local vocab/merges files (no downloads — the offline oracle)."""

import json
import os

import numpy as np
import pytest

from b2txt_tpu.utils.bpe import ByteBPE, bytes_to_unicode


def _fixture_files(tmp_path):
    """A small handcrafted GPT2-style vocab/merges pair covering multi-step
    merges, the Ġ space proxy, and unmergeable bytes."""
    b2u = bytes_to_unicode()
    G = b2u[ord(" ")]  # 'Ġ'
    # base tokens: every byte proxy we use, then merged units
    base = ["<unk>", "h", "e", "l", "o", "w", "r", "d", "t", "a", "c", "!", G]
    merged = ["he", "ll", "hell", "hello", G + "w", G + "wo", G + "wor",
              G + "worl", G + "world", G + "c", G + "ca", G + "cat"]
    vocab = {t: i for i, t in enumerate(base + merged)}
    merges = [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
        (G, "w"), (G + "w", "o"), (G + "wo", "r"), (G + "wor", "l"),
        (G + "worl", "d"),
        (G, "c"), (G + "c", "a"), (G + "ca", "t"),
    ]
    vocab_path = os.path.join(tmp_path, "vocab.json")
    merges_path = os.path.join(tmp_path, "merges.txt")
    with open(vocab_path, "w") as f:
        json.dump(vocab, f)
    with open(merges_path, "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return vocab_path, merges_path, vocab


def test_handcrafted_merges(tmp_path):
    vocab_path, merges_path, vocab = _fixture_files(str(tmp_path))
    bpe = ByteBPE.from_files(vocab_path, merges_path)
    ids = bpe.encode("hello world")
    assert ids == [vocab["hello"], vocab[bytes_to_unicode()[ord(" ")] + "world"]]
    # unmergeable suffix falls back to single-char tokens, rank order wins
    ids2 = bpe.encode("hello cat!")
    G = bytes_to_unicode()[ord(" ")]
    assert ids2 == [vocab["hello"], vocab[G + "cat"], vocab["!"]]
    assert bpe.decode(ids2) == "hello cat!"


def test_bos_and_call_protocol(tmp_path):
    vocab_path, merges_path, vocab = _fixture_files(str(tmp_path))
    bpe = ByteBPE.from_files(vocab_path, merges_path, bos_id=2)
    ids = bpe.encode("hello")
    assert ids[0] == 2 and ids[1:] == [vocab["hello"]]
    # the OPTRescorer `encode` callable protocol: (text, max_len)
    assert bpe("hello world", 1) == [2]
    assert bpe("hello world", 3) == ids[:2] + [
        vocab[bytes_to_unicode()[ord(" ")] + "world"]
    ]


def test_parity_vs_transformers_gpt2_slow(tmp_path):
    """transformers' GPT2Tokenizer over the same local files is the offline
    oracle (the reference uses the HF tokenizer — standalone :115-123)."""
    tr = pytest.importorskip("transformers")
    vocab_path, merges_path, _ = _fixture_files(str(tmp_path))
    hf = tr.GPT2Tokenizer(vocab_file=vocab_path, merges_file=merges_path,
                          unk_token="<unk>")
    bpe = ByteBPE.from_files(vocab_path, merges_path)
    rng = np.random.default_rng(0)
    words = ["hello", "world", "cat", "hell", "held", "chat", "!", "a", "tll"]
    for _ in range(25):
        text = " ".join(rng.choice(words, size=rng.integers(1, 6)))
        assert bpe.encode(text) == hf.encode(text), text


def test_unicode_roundtrip(tmp_path):
    """Arbitrary UTF-8 (outside the vocab) hits unk on encode but the byte
    proxy table itself is total and lossless."""
    b2u = bytes_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256
    raw = "héllo ⇒ 猫!".encode("utf-8")
    proxy = "".join(b2u[b] for b in raw)
    back = bytes(dict((c, b) for b, c in b2u.items())[c] for c in proxy)
    assert back == raw


def test_split_at_space_equals_joint_encode(tmp_path):
    """Context/continuation split at a space boundary tokenizes identically
    to the joint string — the property the OPT prefix-KV rescoring path
    relies on (GPT-2's pretokenizer attaches the space to the FOLLOWING
    chunk, and merges never cross pretoken boundaries)."""
    vocab_path, merges_path, _ = _fixture_files(str(tmp_path))
    bpe = ByteBPE.from_files(vocab_path, merges_path, bos_id=2)
    rng = np.random.default_rng(1)
    words = ["hello", "world", "cat", "hell", "held", "chat", "!", "a", "tll"]
    for _ in range(25):
        n = int(rng.integers(2, 7))
        ws = list(rng.choice(words, size=n))
        cut = int(rng.integers(1, n))
        ctx, cont = " ".join(ws[:cut]), " ".join(ws[cut:])
        joint = bpe.encode(ctx + " " + cont)
        split = bpe.encode(ctx) + bpe.encode(" " + cont, add_bos=False)
        assert joint == split, (ctx, cont)
