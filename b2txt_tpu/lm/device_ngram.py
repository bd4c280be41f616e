"""Device-resident n-gram model: open-addressing hash tables in HBM.

The TPU replacement for Kaldi's G.fst arcs: every n-gram of every order lives
in ONE packed probing table in HBM, so the fused beam search scores thousands
of candidate words per frame with exactly two gathers — no host callback, no
FST walk. The same backoff recursion as NGramLM.logp resolves from the
stacked probe results as a fixed unrolled select chain.

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

MAX_PROBES = 8  # Robin-Hood bound: tables grow until every chain fits


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
    """Open-addressing table: (key1, key2) uint32 pair → (value, backoff).

    Packed layout: one (size, 4) int32 matrix with columns [key1, key2,
    value_bits, backoff_bits] so every probe is ONE gather instead of four —
    the device beam search's per-frame cost is dominated by these probes
    (measured: the LM-probe chain was 93% of the fused step before packing).
    Robin-Hood insertion bounds the worst probe chain to MAX_PROBES (the
    table grows until the bound holds), so lookups always gather a fixed,
    small window. int32 storage avoids any float-NaN canonicalization of key
    bit patterns in transfers.
    """

    packed: np.ndarray   # (size, 4) int32
    max_probe: int = 1

    @classmethod
    def build(cls, entries: Dict[Tuple[int, ...], Tuple[float, float]]) -> "HashTable":
        items = []
        for ids, (v, b) in entries.items():
            h1, h2 = hash_ids_np(ids)
            if h1 == 0 and h2 == 0:
                h1 = np.uint32(1)
            items.append((np.uint32(h1), np.uint32(h2),
                          np.float32(v), np.float32(b)))

        n = max(len(items), 1)
        # 0.5 load factor. Measured on the v5e: LOWERING load to 0.25 (smaller
        # probe windows, 2× slots) made the fused-search probes ~1.5× SLOWER —
        # table footprint beats window width for TPU gather cost. Don't
        # "optimize" this without re-measuring.
        size = 1
        while size < 2 * n:
            size *= 2
        while True:
            table = cls._try_build(items, size)
            if table is not None:
                return table
            size *= 2  # probe bound exceeded: lower the load factor

    @classmethod
    def _try_build(cls, items, size: int) -> Optional["HashTable"]:
        mask = size - 1
        key1 = np.zeros(size, np.uint32)
        key2 = np.zeros(size, np.uint32)
        value = np.zeros(size, np.float32)
        backoff = np.zeros(size, np.float32)
        dist = np.full(size, -1, np.int32)  # -1 = empty
        max_probe = 1
        for h1, h2, v, b in items:
            d = 0
            slot = int(h1) & mask
            while True:
                if d >= MAX_PROBES:
                    return None
                if dist[slot] < 0:
                    key1[slot], key2[slot] = h1, h2
                    value[slot], backoff[slot] = v, b
                    dist[slot] = d
                    max_probe = max(max_probe, d + 1)
                    break
                if key1[slot] == h1 and key2[slot] == h2:
                    break  # duplicate hash (collision) — keep first
                if dist[slot] < d:  # Robin Hood: displace the richer entry
                    key1[slot], h1 = h1, key1[slot]
                    key2[slot], h2 = h2, key2[slot]
                    value[slot], v = v, value[slot]
                    backoff[slot], b = b, backoff[slot]
                    dist[slot], d = d, dist[slot]
                    max_probe = max(max_probe, dist[slot] + 1)
                slot = (slot + 1) & mask
                d += 1
        packed = np.stack(
            [key1.view(np.int32), key2.view(np.int32),
             value.view(np.int32), backoff.view(np.int32)],
            axis=1,
        )
        return cls(packed, max_probe)

    def as_device(self):
        # The probe window is fixed at MAX_PROBES rows so the gathered block
        # is (8, 4) int32 = one aligned 32-lane tile; sub-8 windows produced
        # misaligned gathers that measured SLOWER despite fewer bytes. Wrapped
        # slots past a short chain are masked by key equality, so a full
        # window is always safe.
        P = min(MAX_PROBES, self.packed.shape[0])
        return jnp.asarray(self.packed), int(P)


def _lookup(table, h1, h2, not_found: float):
    """Probe table for key (h1, h2). Returns (value, backoff, found).

    One packed gather fetches all probe slots' [key1, key2, value, backoff]
    columns at once. Keys are unique in the table (build dedups), so the
    probe window contains AT MOST one hit — the select reduces to a masked
    sum, no cumsum/argmax/second gather.
    """
    packed, max_probe = table
    size = packed.shape[0]
    mask = size - 1
    h1 = jnp.where((h1 == 0) & (h2 == 0), jnp.uint32(1), h1)
    slot0 = (h1 & jnp.uint32(mask)).astype(jnp.int32)

    probes = jnp.arange(max_probe, dtype=jnp.int32)  # true per-table bound
    slots = (slot0[..., None] + probes) & mask          # (..., P)
    rows = packed[slots]                                # (..., P, 4) — 1 gather
    k1 = rows[..., 0].astype(jnp.uint32)
    k2 = rows[..., 1].astype(jnp.uint32)
    hit = (k1 == h1[..., None]) & (k2 == h2[..., None])
    found = jnp.any(hit, axis=-1)
    vbits = jnp.sum(jnp.where(hit, rows[..., 2], 0), axis=-1)
    bbits = jnp.sum(jnp.where(hit, rows[..., 3], 0), axis=-1)
    v = jnp.where(
        found,
        jax.lax.bitcast_convert_type(vbits, jnp.float32),
        jnp.float32(not_found),
    )
    b = jnp.where(
        found, jax.lax.bitcast_convert_type(bbits, jnp.float32), 0.0
    )
    return v, b, found


@dataclass
class DeviceNGram:
    """Packed n-gram LM. Word ids are lexicon ids; BOS/EOS/UNK get reserved
    ids n_words, n_words+1, n_words+2.

    ALL orders live in ONE unified hash table (the 64-bit sequence hash keeps
    different-length grams distinct), so a full backoff-chain query needs just
    TWO gathers: one stacked probe for every gram level and one for every
    context's backoff weight — the n-gram score is the fused beam search's
    per-frame cost driver, and gather count is what the TPU charges for.
    """

    order: int
    n_words: int
    table: Tuple[jax.Array, int]
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
        """Build directly from an ARPA file — the large-model path. Packed
        slots are 16 bytes at a ≤0.5 load factor (32-64 B per n-gram in HBM;
        a 100M-entry 5-gram ≈ 3-6 GB), vs the reference's ~300 GB host-RAM
        SRILM representation (README.md:101). For host-side decoding at that
        scale use the C++ runtime's 16 B/entry sorted tables instead."""
        import gzip

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

        unk_logp = -23.0
        entries: Dict[Tuple[int, ...], Tuple[float, float]] = {}
        with opener(path, "rt") as f:
            # skip to first gram section
            for line in f:
                if line.strip() == "\\1-grams:":
                    break
            cur = 1
            for line in f:
                s = line.strip()
                if s.startswith("\\") and s.endswith("-grams:"):
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
        return cls(order=order, n_words=n_words,
                   table=HashTable.build(entries).as_device(),
                   unk_logp=float(unk_logp))

    @classmethod
    def build(cls, lm: NGramLM, lexicon: Lexicon) -> "DeviceNGram":
        n_words = len(lexicon.words)
        special = {BOS: n_words, EOS: n_words + 1, UNK: n_words + 2}

        def wid(w: str) -> int:
            if w in special:
                return special[w]
            return lexicon.word_ids.get(w, -1)

        packed: Dict[Tuple[int, ...], Tuple[float, float]] = {}
        for k in range(lm.order):
            for gram, (logp, bow) in lm.tables[k].items():
                ids = tuple(wid(w) for w in gram)
                if any(i < 0 for i in ids):
                    continue  # word not in decode lexicon
                packed[ids] = (logp, bow)
        unk = lm.tables[0].get((UNK,), (-23.0, 0.0))[0]
        return cls(order=lm.order, n_words=n_words,
                   table=HashTable.build(packed).as_device(),
                   unk_logp=float(unk))

    def logp_words(self, context: jax.Array, words: jax.Array) -> jax.Array:
        """log P(word | context) for a SET of candidate words sharing one
        context. context: (order-1,) int32 ids, -1 padded on the LEFT (most
        recent word last); words: (H,) int32. Returns (H,) log-probs.

        Context suffix hashing and the backoff-weight probes depend only on
        the context, so they run once per beam rather than once per candidate
        word — in the fused beam search this cuts the LM-probe work on the
        homophone axis ~2× on top of the packed-table gathers.
        """
        order = self.order
        ctxs = []  # hash pairs of each context suffix, longest first
        for start in range(order - 1):
            h1 = jnp.uint32(0x811C9DC5)
            h2 = jnp.uint32(0x01000193)
            for j in range(start, order - 1):
                w = context[j]
                h1n, h2n = hash_extend_jnp(h1, h2, w)
                use = w >= 0
                h1 = jnp.where(use, h1n, h1)
                h2 = jnp.where(use, h2n, h2)
            ctxs.append((h1, h2))

        # TWO stacked probes into the unified table: one for every gram
        # level's (context + word) key, one for every context's backoff entry.
        H = words.shape[0]
        levels = list(range(order - 1, 0, -1))  # contexts, longest first
        gk1, gk2 = [], []
        for level in levels + [0]:
            if level > 0:
                ch1, ch2 = ctxs[(order - 1) - level]
            else:
                ch1 = jnp.uint32(0x811C9DC5)
                ch2 = jnp.uint32(0x01000193)
            g1, g2 = hash_extend_jnp(ch1, ch2, words)         # (H,)
            gk1.append(g1)
            gk2.append(g2)
        vg, _, fg = _lookup(
            self.table, jnp.stack(gk1), jnp.stack(gk2), self.unk_logp
        )                                                     # (order, H)
        if order > 1:
            ck1 = jnp.stack([ctxs[(order - 1) - l][0] for l in levels])
            ck2 = jnp.stack([ctxs[(order - 1) - l][1] for l in levels])
            _, bows, fcs = _lookup(self.table, ck1, ck2, 0.0)  # (order-1,)

        # longest-match with accumulated backoff, unrolled over orders
        result = jnp.full((H,), self.unk_logp, jnp.float32)
        resolved = jnp.zeros((H,), bool)
        bo_acc = jnp.zeros((H,), jnp.float32)
        n_valid = jnp.sum((context >= 0).astype(jnp.int32))
        for i, level in enumerate(levels + [0]):
            level_ok = (n_valid >= level) if level > 0 else jnp.bool_(True)
            v, found = vg[i], fg[i]
            # NO_PROB (-99 log10) entries exist only as backoff contexts
            hit = found & (v > -200.0) & level_ok & ~resolved
            result = jnp.where(hit, bo_acc + v, result)
            resolved = resolved | hit
            if level > 0:
                # this context's backoff weight, broadcast over H
                add = jnp.where(fcs[i] & level_ok & ~resolved, bows[i], 0.0)
                bo_acc = bo_acc + add
        return jnp.where(resolved, result, bo_acc + self.unk_logp)

    def logp(self, context: jax.Array, word: jax.Array) -> jax.Array:
        """log P(word | context) for one candidate (see logp_words)."""
        return self.logp_words(context, word.reshape(1))[0]
