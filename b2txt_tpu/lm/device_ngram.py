"""Device-resident n-gram model: bucketed hash table in HBM + dense unigrams.

The TPU replacement for Kaldi's G.fst arcs: every n-gram of order >= 2 lives
in ONE bucketed probing table in HBM, so the fused beam search scores
thousands of candidate words per frame with one aligned row-gather per
(gram level, word) plus a dense unigram read — no host callback, no FST walk.
The same backoff recursion as NGramLM.logp resolves from the stacked probe
results as a fixed unrolled select chain.

Layout (round-3 redesign, driven by measured v5e gather costs — see
docs/DESIGN.md): XLA TPU gathers cost ~30 ns per gathered ROW nearly
independent of row width (4 B single element = 33 ns, 512 B row = 31 ns),
while the round-2 Robin-Hood probe windows (8 rows of 16 B from an arbitrary
start slot) cost 115 ns. So the table is now an array of BUCKETS: one flat
256 B row of 16 slots per bucket, fetched with ONE row gather and resolved
with vectorized key compares in VMEM. Buckets are sized so overflow is
Poisson-negligible (mean 4 keys per 16-slot bucket); the table doubles in
the rare case a bucket overflows.

Unigrams move out of the hash table into dense arrays indexed by word id
(logp, backoff) — a word's level-0 score is one element read, and the fused
search precomputes it per trie node so the hot path pays nothing.

Keys are 64 bits (two uint32 lanes) derived from word-id sequences by the
same xorshift-avalanche mix used for beam-prefix identity; empty slots carry
key 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lexicon import Lexicon
from .ngram import BOS, EOS, NGramLM, UNK

BUCKET_CAP = 16      # slots per bucket: one (16, 4) int32 = 256 B row
BIG_TABLE_ENTRIES = 8_000_000  # above this, buckets double to 32 slots
TARGET_MEAN = 4      # keys per bucket on average (load factor 0.25)
MISSING = -1.0e9     # dense-unigram sentinel for "no entry"


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


def hash_ids_batch(ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized hash_ids_np over an (N, L) id matrix — the 100M-entry ARPA
    streaming path hashes whole chunks in L column passes."""
    n = ids.shape[0]
    h1 = np.full(n, 0x811C9DC5, np.uint32)
    h2 = np.full(n, 0x01000193, np.uint32)
    for j in range(ids.shape[1]):
        with np.errstate(over="ignore"):
            c = (ids[:, j].astype(np.int64) + 3).astype(np.uint32)
        h1 = _mix_np(h1, c, SEED1)
        h2 = _mix_np(h2, c, SEED2)
    return h1, h2


def hash_extend_jnp(h1: jax.Array, h2: jax.Array, wid: jax.Array):
    c = (wid + 3).astype(jnp.uint32)
    return _mix_jnp(h1, c, SEED1), _mix_jnp(h2, c, SEED2)


def hash_ctx_jnp(ctx: jax.Array):
    """64-bit identity hash of an LM-context window (..., CW) — the ngram
    state keying of the device searcher (Kaldi token-passing state space:
    hypotheses sharing the last order−1 words merge; see decode/lattice.py
    on why that is the lattice-depth mechanism)."""
    shape = ctx.shape[:-1]
    h1 = jnp.full(shape, jnp.uint32(0x811C9DC5))
    h2 = jnp.full(shape, jnp.uint32(0x01000193))
    for i in range(ctx.shape[-1]):  # CW is static and small (order-1)
        h1, h2 = hash_extend_jnp(h1, h2, ctx[..., i])
    return h1, h2


@dataclass
class BucketTable:
    """Bucketed open hash table: (key1, key2) uint32 pair → (value, backoff).

    Packed layout: (n_buckets, BUCKET_CAP * 4) int32 rows with slot-major
    columns [key1, key2, value_bits, backoff_bits] × BUCKET_CAP, so every
    probe is ONE aligned contiguous row gather (the device beam search's
    per-frame cost is dominated by gathered-row COUNT — measured ~30 ns/row
    on the v5e regardless of row width; see DESIGN.md round-3 notes).
    Bucket id = key1 & (n_buckets − 1). int32 storage avoids any float-NaN
    canonicalization of value bit patterns in transfers.
    """

    packed: np.ndarray   # (n_buckets, BUCKET_CAP*4) int32

    @classmethod
    def build_arrays(
        cls,
        h1: np.ndarray,
        h2: np.ndarray,
        values: np.ndarray,
        backoffs: np.ndarray,
    ) -> "BucketTable":
        """Vectorized build from parallel arrays (the 100M-entry path)."""
        h1 = h1.astype(np.uint32).copy()
        h2 = h2.astype(np.uint32)
        zero = (h1 == 0) & (h2 == 0)
        h1[zero] = 1  # key (0,0) is the empty marker

        # dedup identical 64-bit keys (keep first — matches host behavior)
        key64 = h1.astype(np.uint64) << np.uint64(32) | h2.astype(np.uint64)
        _, first_idx = np.unique(key64, return_index=True)
        if len(first_idx) != len(key64):
            keep = np.sort(first_idx)
            h1, h2 = h1[keep], h2[keep]
            values, backoffs = values[keep], backoffs[keep]

        n = max(len(h1), 1)
        # bucket capacity adapts to scale: 16 slots (256 B rows) for small
        # tables; 32 slots (512 B rows, same ~30 ns/row gather charge) once
        # tens of millions of entries make the Poisson tail of a 16-slot
        # bucket non-negligible — at mean 8 of capacity 32 the overflow
        # probability is ~1e-15/bucket, so memory stays a deterministic
        # 64 B/entry instead of doubling on one hot bucket (observed at the
        # 100M-entry drive: 8.6 → 17.2 GB from a single overflow).
        cap = BUCKET_CAP if n < BIG_TABLE_ENTRIES else 2 * BUCKET_CAP
        n_buckets = 1
        while n_buckets * (cap // 4) < n:
            n_buckets *= 2
        while True:
            bucket = (h1 & np.uint32(n_buckets - 1)).astype(np.int64)
            counts = np.bincount(bucket, minlength=n_buckets)
            if counts.max(initial=0) <= cap:
                break
            n_buckets *= 2  # Poisson-tail overflow: relax the load factor

        order = np.argsort(bucket, kind="stable")
        sorted_b = bucket[order]
        starts = np.zeros(n_buckets, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        pos = np.arange(len(h1), dtype=np.int64) - starts[sorted_b]
        slot = sorted_b * cap + pos

        flat = np.zeros((n_buckets * cap, 4), np.int32)
        flat[slot, 0] = h1[order].view(np.int32)
        flat[slot, 1] = h2[order].view(np.int32)
        flat[slot, 2] = values[order].astype(np.float32).view(np.int32)
        flat[slot, 3] = backoffs[order].astype(np.float32).view(np.int32)
        return cls(flat.reshape(n_buckets, cap * 4))

    @classmethod
    def build(
        cls, entries: Dict[Tuple[int, ...], Tuple[float, float]]
    ) -> "BucketTable":
        n = max(len(entries), 1)
        h1 = np.empty(n, np.uint32)
        h2 = np.empty(n, np.uint32)
        v = np.zeros(n, np.float32)
        b = np.zeros(n, np.float32)
        for i, (ids, (logp, bow)) in enumerate(entries.items()):
            h1[i], h2[i] = hash_ids_np(ids)
            v[i], b[i] = logp, bow
        if not entries:
            h1, h2 = h1[:0], h2[:0]
            v, b = v[:0], b[:0]
        return cls.build_arrays(h1, h2, v, b)

    def as_device(self):
        cap = self.packed.shape[1] // 4
        return jnp.asarray(self.packed), cap


def _lookup(table, h1, h2, not_found: float):
    """Probe table for key (h1, h2). Returns (value, backoff, found).

    One contiguous row gather per key fetches the whole bucket; keys are
    unique in the table (build dedups), so the bucket contains AT MOST one
    hit — the select reduces to a masked sum.
    """
    packed, cap = table
    n_buckets = packed.shape[0]
    h1 = jnp.where((h1 == 0) & (h2 == 0), jnp.uint32(1), h1)
    b = (h1 & jnp.uint32(n_buckets - 1)).astype(jnp.int32)

    rows = packed[b]                                     # (..., cap*4) — 1 row gather
    rows = rows.reshape(rows.shape[:-1] + (cap, 4))
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
    b_ = jnp.where(
        found, jax.lax.bitcast_convert_type(bbits, jnp.float32), 0.0
    )
    return v, b_, found


@dataclass
class DeviceNGram:
    """Packed n-gram LM. Word ids are lexicon ids; BOS/EOS/UNK get reserved
    ids n_words, n_words+1, n_words+2.

    Orders >= 2 live in ONE unified bucketed table (the 64-bit sequence hash
    keeps different-length grams distinct); unigrams are dense arrays indexed
    by word id (uni_logp holds MISSING for absent words, raw ARPA values —
    including NO_PROB — otherwise). A full backoff-chain query for H words
    sharing a context costs (order−1)·H bucket rows + (order−2) context rows
    + H+1 dense element reads — all single-gather ops.
    """

    order: int
    n_words: int
    table: Tuple[jax.Array, int]
    uni_logp: jax.Array   # (n_words+3,) f32, MISSING if absent
    uni_bow: jax.Array    # (n_words+3,) f32, 0 if absent
    unk_logp: float
    n_entries: int = 0    # total packed n-grams (all orders), set at build

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
        """Build directly from an ARPA file — the large-model path. Bucketed
        slots are 16 bytes at a 0.25 load factor (~64 B per n-gram in HBM;
        a 100M-entry 5-gram ≈ 6.4 GB), vs the reference's ~300 GB host-RAM
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
        uni_logp = np.full(n_words + 3, MISSING, np.float32)
        uni_bow = np.zeros(n_words + 3, np.float32)
        # preallocate from the header counts (upper bound) — a 100M-entry
        # ARPA streams through fixed arrays, never python-object lists
        n_hi = sum(counts[1:order]) if order > 1 else 0
        hi_h1 = np.empty(n_hi, np.uint32)
        hi_h2 = np.empty(n_hi, np.uint32)
        hi_v = np.empty(n_hi, np.float32)
        hi_b = np.empty(n_hi, np.float32)
        n_filled = 0
        CHUNK = 1 << 18
        ids_buf = np.empty((CHUNK, order), np.int64)
        vb_buf = np.empty((CHUNK, 2), np.float32)

        def flush(cur: int, n: int):
            nonlocal n_filled
            if n == 0 or cur == 1:
                return
            ids = ids_buf[:n, :cur]
            ok = ~(ids == -2).any(axis=1)
            ids, vb = ids[ok], vb_buf[:n][ok]
            h1, h2 = hash_ids_batch(ids)
            m = len(h1)
            hi_h1[n_filled : n_filled + m] = h1
            hi_h2[n_filled : n_filled + m] = h2
            hi_v[n_filled : n_filled + m] = vb[:, 0]
            hi_b[n_filled : n_filled + m] = vb[:, 1]
            n_filled += m

        with opener(path, "rt") as f:
            # skip to first gram section
            for line in f:
                if line.strip() == "\\1-grams:":
                    break
            cur = 1
            n_buf = 0
            for line in f:
                s = line.strip()
                if s.startswith("\\") and s.endswith("-grams:"):
                    flush(cur, n_buf)
                    n_buf = 0
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
                if cur == 1:
                    if words[0] == UNK:
                        unk_logp = logp
                    i = wid(words[0])
                    if i >= 0:
                        uni_logp[i] = logp
                        uni_bow[i] = bow
                    continue
                for j, w in enumerate(words):
                    ids_buf[n_buf, j] = wid(w)
                vb_buf[n_buf, 0] = logp
                vb_buf[n_buf, 1] = bow
                n_buf += 1
                if n_buf == CHUNK:
                    flush(cur, n_buf)
                    n_buf = 0
            flush(cur, n_buf)
        table = BucketTable.build_arrays(
            hi_h1[:n_filled], hi_h2[:n_filled],
            hi_v[:n_filled], hi_b[:n_filled],
        )
        n_uni = int(np.count_nonzero(uni_logp > MISSING / 2))
        return cls(order=order, n_words=n_words, table=table.as_device(),
                   uni_logp=jnp.asarray(uni_logp), uni_bow=jnp.asarray(uni_bow),
                   unk_logp=float(unk_logp), n_entries=n_filled + n_uni)

    @classmethod
    def build(cls, lm: NGramLM, lexicon: Lexicon) -> "DeviceNGram":
        n_words = len(lexicon.words)
        special = {BOS: n_words, EOS: n_words + 1, UNK: n_words + 2}

        def wid(w: str) -> int:
            if w in special:
                return special[w]
            return lexicon.word_ids.get(w, -1)

        uni_logp = np.full(n_words + 3, MISSING, np.float32)
        uni_bow = np.zeros(n_words + 3, np.float32)
        for gram, (logp, bow) in lm.tables[0].items():
            i = wid(gram[0])
            if i >= 0:
                uni_logp[i] = logp
                uni_bow[i] = bow

        packed: Dict[Tuple[int, ...], Tuple[float, float]] = {}
        for k in range(1, lm.order):
            for gram, (logp, bow) in lm.tables[k].items():
                ids = tuple(wid(w) for w in gram)
                if any(i < 0 for i in ids):
                    continue  # word not in decode lexicon
                packed[ids] = (logp, bow)
        unk = lm.tables[0].get((UNK,), (-23.0, 0.0))[0]
        n_uni = int(np.count_nonzero(uni_logp > MISSING / 2))
        return cls(order=lm.order, n_words=n_words,
                   table=BucketTable.build(packed).as_device(),
                   uni_logp=jnp.asarray(uni_logp), uni_bow=jnp.asarray(uni_bow),
                   unk_logp=float(unk), n_entries=len(packed) + n_uni)

    def context_hashes(self, context: jax.Array):
        """Hash pairs of each context suffix, longest first (length order−1
        down to 1). context: (order-1,) int32, -1 left-padded."""
        ctxs = []
        for start in range(self.order - 1):
            h1 = jnp.uint32(0x811C9DC5)
            h2 = jnp.uint32(0x01000193)
            for j in range(start, self.order - 1):
                w = context[j]
                h1n, h2n = hash_extend_jnp(h1, h2, w)
                use = w >= 0
                h1 = jnp.where(use, h1n, h1)
                h2 = jnp.where(use, h2n, h2)
            ctxs.append((h1, h2))
        return ctxs

    def bind_table(self, packed: jax.Array) -> None:
        """Bind a TRACER as the probe table while tracing a jitted function
        that takes the table as an argument — multi-GB tables must be jit
        ARGUMENTS, not closure constants (an 8.6 GB captured constant hung
        the remote compile service at the 100M-entry drive)."""
        self._bound_table = (packed, self.table[1])

    def unbind_table(self) -> None:
        self._bound_table = None

    def _lookup(self, h1, h2, not_found: float):
        """Probe entry point — ShardedNGram overrides this with the
        collective (all_gather + masked local gather + psum) version."""
        tab = getattr(self, "_bound_table", None)
        return _lookup(tab if tab is not None else self.table,
                       h1, h2, not_found)

    def logp_words(
        self,
        context: jax.Array,
        words: jax.Array,
        uni_logp_w: Optional[jax.Array] = None,
        n_exact: Optional[int] = None,
    ) -> jax.Array:
        """log P(word | context) for a SET of candidate words sharing one
        context. context: (order-1,) int32 ids, -1 padded on the LEFT (most
        recent word last); words: (H,) int32. Returns (H,) log-probs.

        ``uni_logp_w`` optionally supplies the words' dense unigram log-probs
        (the fused beam search pre-packs them per trie node so the hot path
        skips the dense gather). Context suffix hashing and the backoff-weight
        probes depend only on the context, so they run once per beam rather
        than once per candidate word.

        ``n_exact`` (static) probes the gram tables only for the FIRST
        n_exact words; the tail gets the full backoff-chain-to-unigram score
        (exact whenever no higher-order gram exists for that word in this
        context — the common case for rare homophone-class tails when
        words arrive unigram-sorted, see TrieArrays). Saves
        (order−1)·(H−n_exact) gathered rows per call; intended for use with
        the unpruned pool rescore, which restores exact scores on surviving
        candidates (DESIGN.md round-4 homophone notes).
        """
        order = self.order
        H = words.shape[0]
        if uni_logp_w is None:
            uni_logp_w = self.uni_logp[jnp.clip(words, 0)]          # (H,)

        n_valid = jnp.sum((context >= 0).astype(jnp.int32)) if order > 1 else 0

        if order > 1:
            ctxs = self.context_hashes(context)
            levels = list(range(order - 1, 0, -1))  # ctx suffix lengths, desc
            probe_w = (words if n_exact is None or n_exact >= H
                       else words[:n_exact])
            # gram probes for levels order−1..1 — ONE stacked row gather
            gk1 = jnp.stack([
                hash_extend_jnp(*ctxs[(order - 1) - l], probe_w)[0]
                for l in levels
            ])                                                       # (o-1, C)
            gk2 = jnp.stack([
                hash_extend_jnp(*ctxs[(order - 1) - l], probe_w)[1]
                for l in levels
            ])
            vg, _, fg = self._lookup(gk1, gk2, self.unk_logp)
            if probe_w.shape[0] < H:
                pad = H - probe_w.shape[0]
                vg = jnp.pad(vg, ((0, 0), (0, pad)))
                fg = jnp.pad(fg, ((0, 0), (0, pad)))  # False → backoff chain
            # context-backoff probes: suffix lengths order−1..2 via the table,
            # length 1 via the dense unigram backoff
            if order > 2:
                ck1 = jnp.stack([ctxs[(order - 1) - l][0] for l in levels[:-1]])
                ck2 = jnp.stack([ctxs[(order - 1) - l][1] for l in levels[:-1]])
                _, bows_hi, fcs_hi = self._lookup(ck1, ck2, 0.0)
            last = jnp.clip(context[order - 2], 0)
            bow1 = self.uni_bow[last]
            exists1 = self.uni_logp[last] > MISSING / 2

        # longest-match with accumulated backoff, unrolled over orders
        result = jnp.full((H,), self.unk_logp, jnp.float32)
        resolved = jnp.zeros((H,), bool)
        bo_acc = jnp.zeros((H,), jnp.float32)
        if order > 1:
            for i, level in enumerate(levels):
                level_ok = n_valid >= level
                v, found = vg[i], fg[i]
                # NO_PROB (-99 log10) entries exist only as backoff contexts
                hit = found & (v > -200.0) & level_ok & ~resolved
                result = jnp.where(hit, bo_acc + v, result)
                resolved = resolved | hit
                if level >= 2:
                    bow_l, exists_l = bows_hi[i], fcs_hi[i]
                else:
                    bow_l, exists_l = bow1, exists1
                add = jnp.where(exists_l & level_ok & ~resolved, bow_l, 0.0)
                bo_acc = bo_acc + add
        # level 0: dense unigram
        hit0 = (uni_logp_w > -200.0) & ~resolved
        result = jnp.where(hit0, bo_acc + uni_logp_w, result)
        resolved = resolved | hit0
        return jnp.where(resolved, result, bo_acc + self.unk_logp)

    def logp(self, context: jax.Array, word: jax.Array) -> jax.Array:
        """log P(word | context) for one candidate (see logp_words)."""
        return self.logp_words(context, word.reshape(1))[0]


@dataclass
class ShardedNGram(DeviceNGram):
    """DeviceNGram whose bucket table is ROW-SHARDED over a mesh axis — the
    capacity story for reference-scale LMs (a 300 GB-RAM SRILM 5-gram,
    README.md:101, becomes ~6.4 GB of bucket rows split across the mesh's
    HBM; 8 × v5e hold ~1.6 B entries).

    Must run inside shard_map over ``axis_name``: each device holds
    n_buckets/D consecutive bucket rows (the high bits of the bucket id pick
    the owner). A probe all_gathers the query keys over the axis, answers
    the subset it owns from its local shard (others contribute zero rows),
    and a psum reassembles every device's answers; each device then keeps
    its own slice. ``shard`` is bound at trace time by the sharded decode
    wrapper (decode/lmbeam_jax.py sharded_decode_batch).
    """

    axis_name: str = "data"

    def bind_shard(self, shard: jax.Array) -> None:
        # set while tracing the shard_mapped function; `shard` is the local
        # (n_buckets/D, cap*4) block of the table
        self._shard = shard

    def _lookup(self, h1, h2, not_found: float):
        shard = self._shard
        cap = self.table[1]
        axis = self.axis_name
        D = jax.lax.psum(1, axis)
        idx = jax.lax.axis_index(axis)
        n_buckets = shard.shape[0] * D
        local_n = shard.shape[0]

        h1 = jnp.where((h1 == 0) & (h2 == 0), jnp.uint32(1), h1)
        # every device's queries, stacked on a new leading axis
        all_h1 = jax.lax.all_gather(h1, axis)            # (D, ...)
        all_h2 = jax.lax.all_gather(h2, axis)
        bucket = (all_h1 & jnp.uint32(n_buckets - 1)).astype(jnp.int32)
        owner = bucket // local_n
        local_b = bucket % local_n
        rows = shard[jnp.where(owner == idx, local_b, 0)]     # local gather
        rows = jnp.where((owner == idx)[..., None], rows, 0)
        rows = jax.lax.psum(rows, axis)                  # (D, ..., cap*4)
        rows = rows[idx]                                 # my queries' answers
        rows = rows.reshape(rows.shape[:-1] + (cap, 4))
        k1 = rows[..., 0].astype(jnp.uint32)
        k2 = rows[..., 1].astype(jnp.uint32)
        hit = (k1 == h1[..., None]) & (k2 == all_h2[idx][..., None])
        found = jnp.any(hit, axis=-1)
        vbits = jnp.sum(jnp.where(hit, rows[..., 2], 0), axis=-1)
        bbits = jnp.sum(jnp.where(hit, rows[..., 3], 0), axis=-1)
        v = jnp.where(
            found,
            jax.lax.bitcast_convert_type(vbits, jnp.float32),
            jnp.float32(not_found),
        )
        b_ = jnp.where(
            found, jax.lax.bitcast_convert_type(bbits, jnp.float32), 0.0
        )
        return v, b_, found

    @classmethod
    def from_device_ngram(cls, dev: DeviceNGram, axis_name: str) -> "ShardedNGram":
        return cls(order=dev.order, n_words=dev.n_words, table=dev.table,
                   uni_logp=dev.uni_logp, uni_bow=dev.uni_bow,
                   unk_logp=dev.unk_logp, n_entries=dev.n_entries,
                   axis_name=axis_name)
