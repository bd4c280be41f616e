"""Device-resident n-gram model: open-addressing hash tables in HBM.

The TPU replacement for Kaldi's G.fst arcs: every (context, word) probability
and every context backoff weight is packed into flat uint32-key/float32-value
probing tables, so the fused beam search scores thousands of candidate words
per frame with pure gathers — no host callback, no FST walk. The same backoff
recursion as NGramLM.logp runs as a fixed unrolled sequence of table lookups
(order−1 backoff levels), vectorized over candidates via vmap.

Keys are 64 bits (two uint32 lanes) derived from word-id sequences by the same
xorshift-avalanche mix used for beam-prefix identity; empty slots carry key 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lexicon import Lexicon
from .ngram import BOS, EOS, NGramLM, UNK
from ..utils.config import DecodeConfig

MAX_PROBES = 16


def _mix_np(h: np.ndarray, c: np.ndarray, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):  # modular uint32 arithmetic is intended
        x = (h ^ (c.astype(np.uint32) * np.uint32(seed))).astype(np.uint32)
        x = ((x ^ (x >> np.uint32(16))) * np.uint32(0x85EBCA6B)).astype(np.uint32)
        x = ((x ^ (x >> np.uint32(13))) * np.uint32(0xC2B2AE35)).astype(np.uint32)
        return (x ^ (x >> np.uint32(16))).astype(np.uint32)


def _mix_jnp(h: jax.Array, c: jax.Array, seed: int) -> jax.Array:
    x = h ^ (c.astype(jnp.uint32) * jnp.uint32(seed))
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


SEED1, SEED2 = 0x9E3779B9, 0x7F4A7C15


def hash_ids_np(ids: Sequence[int]) -> Tuple[np.uint32, np.uint32]:
    h1 = np.uint32(0x811C9DC5)
    h2 = np.uint32(0x01000193)
    for i in ids:
        c = np.uint32(np.int64(i) + 3)
        h1 = _mix_np(h1, c, SEED1)
        h2 = _mix_np(h2, c, SEED2)
    return h1, h2


def hash_extend_jnp(h1: jax.Array, h2: jax.Array, wid: jax.Array):
    c = (wid + 3).astype(jnp.uint32)
    return _mix_jnp(h1, c, SEED1), _mix_jnp(h2, c, SEED2)


@dataclass
class HashTable:
    """Open-addressing table: (key1, key2) uint32 pair → (value, backoff)."""

    key1: np.ndarray
    key2: np.ndarray
    value: np.ndarray
    backoff: np.ndarray

    max_probe: int = 1

    @classmethod
    def build(cls, entries: Dict[Tuple[int, ...], Tuple[float, float]]) -> "HashTable":
        n = max(len(entries), 1)
        size = 1
        while size < 2 * n:
            size *= 2
        key1 = np.zeros(size, np.uint32)
        key2 = np.zeros(size, np.uint32)
        value = np.zeros(size, np.float32)
        backoff = np.zeros(size, np.float32)
        mask = size - 1
        max_probe = 1
        for ids, (v, b) in entries.items():
            h1, h2 = hash_ids_np(ids)
            if h1 == 0 and h2 == 0:
                h1 = np.uint32(1)
            slot = int(h1) & mask
            for probe in range(size):
                if key1[slot] == 0 and key2[slot] == 0:
                    key1[slot] = h1 if (h1 or h2) else 1
                    key2[slot] = h2
                    value[slot] = v
                    backoff[slot] = b
                    max_probe = max(max_probe, probe + 1)
                    break
                if key1[slot] == h1 and key2[slot] == h2:
                    break  # duplicate hash (collision) — keep first
                slot = (slot + 1) & mask
        return cls(key1, key2, value, backoff, max_probe)

    def as_device(self):
        # max_probe rides along as a static int: lookups gather exactly the
        # longest real probe chain instead of a worst-case constant.
        return (
            jnp.asarray(self.key1), jnp.asarray(self.key2),
            jnp.asarray(self.value), jnp.asarray(self.backoff),
            int(self.max_probe),
        )


def _lookup(table, h1, h2, not_found: float):
    """Probe table for key (h1, h2). Returns (value, backoff, found).

    All MAX_PROBES linear-probe slots are gathered at once (one vector gather
    instead of a sequential fori_loop — the serialized version dominated the
    fused beam search's per-frame latency). Tables never delete, so a probe
    chain ends at the first empty slot: hits past it are masked out.
    """
    key1, key2, value, backoff, max_probe = table
    mask = key1.shape[0] - 1
    h1 = jnp.where((h1 == 0) & (h2 == 0), jnp.uint32(1), h1)
    slot0 = (h1 & jnp.uint32(mask)).astype(jnp.int32)

    probes = jnp.arange(max_probe, dtype=jnp.int32)  # true per-table bound
    slots = (slot0[..., None] + probes) & mask          # (..., P)
    k1 = key1[slots]
    k2 = key2[slots]
    hit = (k1 == h1[..., None]) & (k2 == h2[..., None])
    empty = (k1 == 0) & (k2 == 0)
    # valid up to (and excluding) the first empty slot
    before_empty = jnp.cumsum(empty.astype(jnp.int32), axis=-1) == 0
    hit = hit & before_empty
    found = jnp.any(hit, axis=-1)
    idx = jnp.argmax(hit, axis=-1)
    chosen = jnp.take_along_axis(slots, idx[..., None], axis=-1)[..., 0]
    v = jnp.where(found, value[chosen], jnp.float32(not_found))
    b = jnp.where(found, backoff[chosen], 0.0)
    return v, b, found


@dataclass
class DeviceNGram:
    """Packed n-gram LM. Word ids are lexicon ids; BOS/EOS/UNK get reserved
    ids n_words, n_words+1, n_words+2."""

    order: int
    n_words: int
    tables: List[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]]
    unk_logp: float

    @property
    def bos_id(self) -> int:
        return self.n_words

    @property
    def eos_id(self) -> int:
        return self.n_words + 1

    @property
    def unk_id(self) -> int:
        return self.n_words + 2

    @classmethod
    def from_arpa_streaming(
        cls, path: str, lexicon: Lexicon, max_order: Optional[int] = None
    ) -> "DeviceNGram":
        """Build directly from an ARPA file without materializing Python dict
        tables — the large-model path (a 5-gram with hundreds of millions of
        n-grams packs at 16 bytes/entry into HBM, vs the reference's ~300 GB
        host-RAM SRILM representation, README.md:101)."""
        import gzip
        import math as _math

        from .arpa import LOG10

        n_words = len(lexicon.words)
        special = {BOS: n_words, EOS: n_words + 1, UNK: n_words + 2}

        def wid(w: str) -> int:
            if w in special:
                return special[w]
            return lexicon.word_ids.get(w, -2)

        opener = gzip.open if path.endswith(".gz") else open
        # pass 1: counts
        counts: List[int] = []
        with opener(path, "rt") as f:
            for line in f:
                line = line.strip()
                if line.startswith("ngram "):
                    counts.append(int(line.split("=")[1]))
                elif line.startswith("\\1-grams"):
                    break
        order = len(counts) if max_order is None else min(len(counts), max_order)

        tables = []
        unk_logp = -23.0
        with opener(path, "rt") as f:
            # skip to first gram section
            for line in f:
                if line.strip() == "\\1-grams:":
                    break
            cur = 1
            entries: Dict[Tuple[int, ...], Tuple[float, float]] = {}
            for line in f:
                s = line.strip()
                if s.startswith("\\") and s.endswith("-grams:"):
                    tables.append(HashTable.build(entries).as_device())
                    entries = {}
                    cur = int(s[1:].split("-")[0])
                    if cur > order:
                        break
                    continue
                if s == "\\end\\":
                    break
                if not s:
                    continue
                parts = s.split()
                try:
                    logp = float(parts[0]) * LOG10
                except ValueError:
                    continue
                words = parts[1 : 1 + cur]
                bow = (
                    float(parts[1 + cur]) * LOG10
                    if len(parts) > 1 + cur else 0.0
                )
                ids = tuple(wid(w) for w in words)
                if cur == 1 and words[0] == UNK:
                    unk_logp = logp
                if any(i == -2 for i in ids):
                    continue
                entries[ids] = (logp, bow)
            if entries and len(tables) < order:
                tables.append(HashTable.build(entries).as_device())
        while len(tables) < order:
            tables.append(HashTable.build({}).as_device())
        return cls(order=order, n_words=n_words, tables=tables,
                   unk_logp=float(unk_logp))

    @classmethod
    def build(cls, lm: NGramLM, lexicon: Lexicon) -> "DeviceNGram":
        n_words = len(lexicon.words)
        special = {BOS: n_words, EOS: n_words + 1, UNK: n_words + 2}

        def wid(w: str) -> int:
            if w in special:
                return special[w]
            return lexicon.word_ids.get(w, -1)

        tables = []
        for k in range(lm.order):
            packed: Dict[Tuple[int, ...], Tuple[float, float]] = {}
            for gram, (logp, bow) in lm.tables[k].items():
                ids = tuple(wid(w) for w in gram)
                if any(i < 0 for i in ids):
                    continue  # word not in decode lexicon
                packed[ids] = (logp, bow)
            tables.append(HashTable.build(packed).as_device())
        unk = lm.tables[0].get((UNK,), (-23.0, 0.0))[0]
        return cls(order=lm.order, n_words=n_words, tables=tables, unk_logp=float(unk))

    def logp(self, context: jax.Array, word: jax.Array) -> jax.Array:
        """log P(word | context) for one candidate.

        context: (order-1,) int32 word ids, -1 padded on the LEFT (most recent
        word last). Vectorize with vmap.
        """
        order = self.order
        ctxs = []  # hash pairs of each context suffix, longest first
        for start in range(order - 1):
            ids = context[start:]
            h1 = jnp.uint32(0x811C9DC5)
            h2 = jnp.uint32(0x01000193)
            valid = jnp.bool_(True)
            for j in range(start, order - 1):
                w = context[j]
                h1n, h2n = hash_extend_jnp(h1, h2, w)
                use = w >= 0
                h1 = jnp.where(use, h1n, h1)
                h2 = jnp.where(use, h2n, h2)
            ctxs.append((h1, h2))

        # longest-match with accumulated backoff, unrolled over orders
        result = jnp.float32(self.unk_logp)
        resolved = jnp.bool_(False)
        bo_acc = jnp.float32(0.0)
        for level in range(order - 1, -1, -1):
            # level = number of context words used
            if level > 0:
                start = (order - 1) - level
                ch1, ch2 = ctxs[start]
                # number of valid context words must be >= level
                n_valid = jnp.sum((context >= 0).astype(jnp.int32))
                level_ok = n_valid >= level
            else:
                ch1 = jnp.uint32(0x811C9DC5)
                ch2 = jnp.uint32(0x01000193)
                level_ok = jnp.bool_(True)
            gh1, gh2 = hash_extend_jnp(ch1, ch2, word)
            v, _, found = _lookup(self.tables[level], gh1, gh2, self.unk_logp)
            # NO_PROB (-99 log10) entries exist only as backoff contexts
            hit = found & (v > -200.0) & level_ok & ~resolved
            result = jnp.where(hit, bo_acc + v, result)
            resolved = resolved | hit
            if level > 0:
                # accumulate this context's backoff weight before descending
                _, bow, ctx_found = _lookup(self.tables[level - 1], ch1, ch2, 0.0)
                add = jnp.where(ctx_found & level_ok & ~resolved, bow, 0.0)
                bo_acc = bo_acc + add
        return jnp.where(resolved, result, bo_acc + self.unk_logp)
