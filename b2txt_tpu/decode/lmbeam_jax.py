"""Lexicon-constrained CTC beam search with n-gram fusion — TPU-resident.

The device-native replacement for the reference's whole C++ decode stack
(TLG.fst + LatticeFasterOnlineDecoder token passing + lattice n-best): the
lexicon trie and the n-gram hash tables live in HBM, and each frame expands a
fixed-width beam of hypotheses in one fused program:

    stay / repeat         (K)        blank or absorbed-repeat emissions
    extend-phone          (K×V)      trie transitions (L.fst arcs)
    silence-at-root       (K)        optional-silence arcs
    close-word            (K×H)      SIL at word-final trie nodes; one
                                     candidate per homophone with its n-gram
                                     score added word-synchronously (G.fst)

Candidates sort by 64-bit prefix-identity hash (lax.sort, num_keys=2), merge
duplicate (phone-prefix, word-decomposition) states with a segmented
log-sum-exp, and top-K prune — the same sort/merge/top-k machinery as
prefix_beam_jax. The whole utterance decodes in one lax.scan; backpointers
(parent, phone, word) stream out for host-side sentence reconstruction.

Score semantics mirror the host LexiconBeamSearch (lmbeam.py): ranking score
= acoustic_scale·logP + LM contributions; unscaled acoustic and LM components
are tracked separately for DecodeResult-style (ac_score, lm_score) reporting.
The host searcher is this module's correctness oracle (tested).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..lm.device_ngram import DeviceNGram, hash_extend_jnp
from ..lm.lexicon import Lexicon
from ..lm.ngram import BOS, NGramLM
from ..utils.config import DecodeConfig
from ..utils.phonemes import BLANK_ID, SIL_ID_MODEL
from .lmbeam import DecodeResult

NEG = -1.0e30


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG)
    out = m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe))
    return jnp.where(m <= NEG, NEG, out)


def _seg_scan(op_values, starts):
    def op(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, _logaddexp(va, vb)), fa | fb

    out, _ = jax.lax.associative_scan(op, (op_values, starts))
    return out


def _seg_merge4(values, starts, sum_mode: bool):
    """ONE segmented scan merging all four score columns: [s, ns] with
    log-sum-exp (sum_mode) or max (Viterbi), [ac_s, ac_ns] always with max.
    Fusing the two scans halves the associative-scan cost of the frame step
    (measured ~0.49 ms each at (32, 1344) on the v5e)."""

    def op(a, b):
        va, fa = a
        vb, fb = b
        rank = (_logaddexp(va[..., :2], vb[..., :2]) if sum_mode
                else jnp.maximum(va[..., :2], vb[..., :2]))
        ac = jnp.maximum(va[..., 2:], vb[..., 2:])
        merged = jnp.concatenate([rank, ac], axis=-1)
        return jnp.where(fb[..., None], vb, merged), fa | fb

    out, _ = jax.lax.associative_scan(op, (values, starts))
    return out


class LmBeamState(NamedTuple):
    h1: jax.Array     # (K,) uint32 word-history hash (chained over closed words)
    h2: jax.Array     # (K,)
    node: jax.Array   # (K,) int32 trie node
    last: jax.Array   # (K,) int32 last emitted phone (-1 none)
    ctx: jax.Array    # (K, order-1) int32 LM context, -1 left-padded
    s: jax.Array      # (K,) ranking score, blank-ending
    ns: jax.Array     # (K,) ranking score, non-blank-ending
    ac_s: jax.Array   # (K,) unscaled acoustic (viterbi), blank-ending
    ac_ns: jax.Array  # (K,)
    lm: jax.Array     # (K,) accumulated LM score


@dataclass
class TrieArrays:
    """Gather-optimized trie: besides the plain next/words_at arrays (used by
    finalize), the hot frame step reads ONE packed node row per beam plus one
    8-byte [child, lookahead] pair per (beam, phone) — measured on the v5e,
    XLA charges ~30 ns per gathered ROW regardless of row width, so packing
    beats per-field element gathers ~10×:

      node_pack[node]   = [wids(H) | uni_logp_bits(H) | la_bits] (2H+1 int32)
      next_la2[node, c] = [child, la_child_bits]                 (2 int32)
    """

    next: jax.Array       # (n_nodes, V) int32
    words_at: jax.Array   # (n_nodes, H) int32, -1 padded
    node_pack: jax.Array  # (n_nodes, 2H+1) int32
    next_la2: jax.Array   # (n_nodes, V, 2) int32: [child, la_child_bits]
    n_dropped: int

    @classmethod
    def build(
        cls,
        lexicon: Lexicon,
        max_homophones: int,
        la: np.ndarray,
        uni_logp: np.ndarray,
    ) -> "TrieArrays":
        n_nodes = lexicon.n_nodes
        counts = np.diff(lexicon.word_offsets).astype(np.int64)
        # cap H at the lexicon's LARGEST homophone class: probing empty
        # homophone slots costs real gather rows every frame, and results
        # are identical whenever the cap covers the actual maximum
        H = max(1, min(max_homophones, int(counts.max(initial=1))))
        # vectorized CSR → (n_nodes, H) scatter (a python per-node loop costs
        # minutes at the 125k-word scale). Within each node the class members
        # are ordered by DESCENDING unigram log-prob first, so a cap below
        # the real class size drops the least-likely homophones (the
        # homophone-dense quality/speed knob — see DESIGN.md round-4).
        uni_of_word = np.asarray(uni_logp)[
            np.clip(lexicon.word_list, 0, None)]
        order = np.lexsort(
            (-uni_of_word,
             np.repeat(np.arange(n_nodes, dtype=np.int64), counts))
        )
        word_list = lexicon.word_list[order]
        words_at = np.full((n_nodes, H), -1, np.int32)
        node_of = np.repeat(np.arange(n_nodes, dtype=np.int64), counts)
        pos = (np.arange(len(word_list), dtype=np.int64)
               - np.repeat(lexicon.word_offsets[:-1].astype(np.int64), counts))
        keep = pos < H
        words_at[node_of[keep], pos[keep]] = word_list[keep]
        dropped = int(np.maximum(counts - H, 0).sum())

        la32 = np.asarray(la, np.float32)
        uni_w = uni_logp[np.clip(words_at, 0, None)].astype(np.float32)
        node_pack = np.concatenate(
            [words_at, uni_w.view(np.int32), la32.view(np.int32)[:, None]],
            axis=1,
        ).astype(np.int32)
        la_child = la32[np.clip(lexicon.next, 0, None)]
        next_la2 = np.stack(
            [lexicon.next, la_child.view(np.int32)], axis=2
        ).astype(np.int32)
        return cls(
            next=jnp.asarray(lexicon.next),
            words_at=jnp.asarray(words_at),
            node_pack=jnp.asarray(node_pack),
            next_la2=jnp.asarray(next_la2),
            n_dropped=dropped,
        )


def compact_blank_skip(
    lp: np.ndarray,
    lengths: np.ndarray,
    blank: int,
    thresh: float,
    log_blank_penalty: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Blank-skip frame compaction for batched decode.

    Applies the blank penalty, then per utterance drops frames whose
    (penalized) blank probability exceeds ``thresh`` and re-inserts ONE
    synthetic blank frame before the next processed frame — exactly the
    streaming skip semantics (reference: ctc_wfst_beam_search.cc:70-121;
    host oracle: lmbeam.py decode()). On trained (peaked) posteriors most
    frames are blank-dominated, so the compacted scan is several times
    shorter — this is what makes the skip trick pay on TPU, where the scan
    length (not per-frame width) is the latency driver.

    lp: (B, T, C) log-probs. Returns (lp_out (B, T', C), new_lengths) with
    the blank penalty already applied (run the scan with log_blank_penalty=0).
    """
    lp = np.array(lp, np.float32, copy=True)
    B, T, C = lp.shape
    if log_blank_penalty != 0.0:
        lp[:, :, blank] -= log_blank_penalty

    # Vectorized compaction (one mask/cumsum pass, no per-frame Python):
    # within each utterance every frame is either kept or skipped, so a
    # synthetic blank precedes kept frame t iff frame t-1 was skipped
    # (covers both leading skips and any skip run between kept frames);
    # trailing skipped frames emit nothing — identical to the streaming
    # pending-blank semantics above.
    valid = np.arange(T)[None, :] < np.asarray(lengths)[:, None]   # (B, T)
    skip = valid & (np.exp(lp[:, :, blank]) > thresh)
    keep = valid & ~skip
    insert = keep & np.pad(skip[:, :-1], ((0, 0), (1, 0)))
    end = np.cumsum(keep.astype(np.int64) + insert.astype(np.int64), axis=1)
    lens_out = end[:, -1].astype(np.int32) if T else np.zeros((B,), np.int32)

    T_out = max(1, int(lens_out.max(initial=0)))
    out = np.full((B, T_out, C), -30.0, np.float32)
    out[:, :, blank] = 0.0  # padding AND inserted-blank rows are this template
    bidx, tidx = np.nonzero(keep)
    out[bidx, end[bidx, tidx] - 1] = lp[bidx, tidx]
    return out, lens_out


def _compress_traces(traces: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(T, B, K) word-emission traces (−1 = none) → per-beam word-id lists
    (B, K, L) int32 −1-padded plus their lengths (B, K). One vectorized numpy
    pass (stable argsort floats kept words to the front per column); L is
    bucketed to a multiple of 8 to bound rescore-jit recompiles."""
    mask = traces >= 0
    lens = mask.sum(axis=0).astype(np.int32)                    # (B, K)
    L = -(-max(1, int(lens.max(initial=0))) // 8) * 8
    if traces.shape[0] < L:  # short streaming decodes: pad T up to the bucket
        pad = L - traces.shape[0]
        traces = np.concatenate(
            [traces, np.full((pad,) + traces.shape[1:], -1, traces.dtype)]
        )
        mask = np.concatenate(
            [mask, np.zeros((pad,) + mask.shape[1:], bool)]
        )
    order = np.argsort(~mask, axis=0, kind="stable")            # kept first
    gathered = np.take_along_axis(traces, order[:L], axis=0)    # (L, B, K)
    out = np.where(np.arange(L)[:, None, None] < lens[None], gathered, -1)
    return np.moveaxis(out, 0, -1).astype(np.int32), lens


def _backtrace_all(parents: np.ndarray, words: np.ndarray) -> np.ndarray:
    """Vectorized word backtrace for every final beam of every utterance.

    parents/words: (T, B, K). Returns (T, B, K) int32 where [:, b, k] is the
    chronological word-emission trace of final beam k (−1 = no word). One
    numpy pass over T replaces per-candidate Python loops (the host-side
    n-best extraction was costing more than the device scan)."""
    T, B, K = parents.shape
    b_idx = np.arange(B)[:, None]
    cur = np.broadcast_to(np.arange(K, dtype=np.int64)[None], (B, K)).copy()
    out = np.empty((T, B, K), np.int32)
    for t in range(T - 1, -1, -1):
        out[t] = words[t][b_idx, cur]
        cur = parents[t][b_idx, cur]
    return out


class DeviceLexiconBeamSearch:
    """Stateful streaming decoder with the reset/decode/finalize protocol,
    running the search itself on device."""

    def __init__(
        self,
        lexicon: Lexicon,
        lm: Optional[NGramLM],
        config: Optional[DecodeConfig] = None,
        blank: int = BLANK_ID,
        sil: int = SIL_ID_MODEL,
        max_homophones: int = 4,
        dev_lm: Optional[DeviceNGram] = None,
        rescore_lm=None,
        close_probe_top: Optional[int] = None,
        state_key: str = "history",
    ):
        """Pass either a host NGramLM (packed onto the device here) or a
        prebuilt DeviceNGram (``dev_lm`` — the from_arpa_streaming path for
        LMs too large to hold as host dicts). ``rescore_lm`` (NGramLM or
        DeviceNGram) enables unpruned-LM finalize rescoring — see
        attach_rescore_lm. ``close_probe_top`` probes the n-gram tables for
        only the top-C unigram-ranked homophones per close (the homophone-
        dense speed knob; tail slots take the exact backoff-chain score —
        see DeviceNGram.logp_words n_exact); use with rescore_lm so
        surviving candidates regain exact scores."""
        self.lexicon = lexicon
        self.config = config or DecodeConfig()
        self.blank = blank
        self.sil = sil
        self.H = max_homophones
        self.dev_lm = dev_lm if dev_lm is not None else DeviceNGram.build(
            lm, lexicon
        )
        self.close_top = close_probe_top
        # hypothesis state space: "history" merges only identical full word
        # histories (the legacy contract); "ngram" truncates identity to the
        # LM context hash (Kaldi token-passing state space) — different
        # histories merge, freeing beam slots for genuine alternatives.
        # Viterbi-only: under sum_mode, merging different sentences would
        # pool their path mass incorrectly. Readout caveat: a merged beam
        # stores ONE (lm, ctx, backpointer) — the overall-best path's at
        # merge time. If the blank/non-blank components later cross over,
        # the reported sentence can lag the true Viterbi argmax by one merge
        # (scores stay exact; the python oracle tracks per-component
        # lineage and is exact — lmbeam.py LmHyp.words_s/words_ns).
        if state_key not in ("history", "ngram"):
            raise ValueError(f"state_key must be history|ngram: {state_key}")
        if state_key == "ngram" and self.config.sum_mode:
            raise ValueError("state_key='ngram' requires sum_mode=False")
        self.state_key = state_key
        # LM lookahead smearing over the trie (see lmbeam.py) — ranking only,
        # cancels at word close.
        if lm is not None:
            la_np = lexicon.lookahead_scores(lambda w: lm.logp([], w))
        else:
            uni = np.asarray(self.dev_lm.uni_logp)
            unk = self.dev_lm.unk_logp
            ids = lexicon.word_ids

            def uni_lp(w: str) -> float:
                v = uni[ids[w]]
                return float(v) if v > -1e8 else unk

            la_np = lexicon.lookahead_scores(uni_lp)
        self.la = jnp.asarray(la_np)
        self.la0 = float(la_np[0])
        self.trie = TrieArrays.build(
            lexicon, max_homophones, la_np, np.asarray(self.dev_lm.uni_logp)
        )
        # TrieArrays caps H at the lexicon's largest homophone class
        self.H = self.trie.words_at.shape[1]
        self.order = self.dev_lm.order
        self._scan = self._build_scan()
        self._finalize_fn, self._finalize_batch = self._build_finalize()
        self._batch_scan = self._build_batch_scan()
        self.rescore_lm: Optional[DeviceNGram] = None
        if rescore_lm is not None:
            self.attach_rescore_lm(rescore_lm)
        self.reset()

    def attach_rescore_lm(self, lm) -> None:
        """Enable unpruned-LM rescoring of the FULL finalize candidate pool,
        on device — the TPU analogue of the native decoder's pool rescore
        (runtime/decoder.cc:675-690; reference
        brain_speech_decoder.cc:61-101): each candidate's decode-LM score is
        replaced by the unpruned model's full-sentence log-probability
        (+ length_penalty·n_words) and the ranking score shifts by the
        difference before the n-best cut. ``lm`` is a host NGramLM (packed
        into HBM bucket tables here) or a prebuilt DeviceNGram sharing this
        searcher's lexicon word ids.

        Cost model: one L-step scan scores every beam's word prefix once
        (probes batch over B·K beams), then the H+1 final-word variants
        reuse the shared context — a handful of gathered rows per beam,
        ~ms per decode batch (see DESIGN.md round-3 cost model)."""
        rlm = lm if isinstance(lm, DeviceNGram) else DeviceNGram.build(
            lm, self.lexicon
        )
        self.rescore_lm = rlm
        CW = max(rlm.order - 1, 1)

        def one(trace, n, fw):
            # trace (L,) word ids of this beam, n = live count, fw (H+1,)
            # final-word variants (−1 = sentence ends at the traced words)
            ctx0 = jnp.full((CW,), -1, jnp.int32).at[CW - 1].set(rlm.bos_id)
            L = trace.shape[0]

            def step(carry, tw):
                ctx, acc = carry
                t, w = tw
                valid = t < n
                wc = jnp.maximum(w, 0)
                lp = rlm.logp(ctx, wc)
                acc = acc + jnp.where(valid, lp, 0.0)
                new_ctx = (jnp.concatenate([ctx[1:], wc[None]]) if CW > 1
                           else wc[None])
                ctx = jnp.where(valid, new_ctx, ctx)
                return (ctx, acc), None

            (ctx, acc), _ = jax.lax.scan(
                step, (ctx0, jnp.float32(0.0)),
                (jnp.arange(L, dtype=jnp.int32), trace),
            )
            eos = jnp.asarray(rlm.eos_id, jnp.int32)
            fw_ok = fw >= 0
            wc = jnp.maximum(fw, 0)
            wlp = rlm.logp_words(ctx, wc)                        # (H+1,)
            new_ctx = (
                jnp.concatenate(
                    [jnp.broadcast_to(ctx[None, 1:], (fw.shape[0], CW - 1)),
                     wc[:, None]], axis=1)
                if CW > 1 else wc[:, None]
            )
            eos_close = jax.vmap(rlm.logp, in_axes=(0, None))(new_ctx, eos)
            eos_root = rlm.logp(ctx, eos)
            return jnp.where(fw_ok, acc + wlp + eos_close, acc + eos_root)

        def run(table, traces, lens, fwords):
            rlm.bind_table(table)
            try:
                return jax.vmap(jax.vmap(one))(traces, lens, fwords)
            finally:
                rlm.unbind_table()

        self._rescore_fn = jax.jit(run)

    def _apply_rescore(self, scores, lms, fwords, traces):
        """Shift (scores, lms) in place per the pool rescore semantics.
        traces: (T, B, K); scores/lms/fwords: (B, K, H+1). Returns the
        updated (scores, lms)."""
        cfg = self.config
        tr, tr_lens = _compress_traces(traces)
        new_lm = np.asarray(
            self._rescore_fn(
                self.rescore_lm.table[0], jnp.asarray(tr),
                jnp.asarray(tr_lens), jnp.asarray(fwords),
            )
        )
        n_words = tr_lens[:, :, None] + (fwords >= 0)
        new_lm = new_lm + float(cfg.length_penalty) * n_words
        finite = np.isfinite(scores)
        scores = np.where(finite, scores + (new_lm - lms), scores)
        lms = np.where(finite, new_lm, lms)
        return scores, lms

    # ---------------------------------------------------------------- state
    def set_opt(self, config: DecodeConfig) -> None:
        # mirror the constructor's validation: runtime reconfiguration
        # (SetOpt parity) must not reach states the constructor rejects
        if self.state_key == "ngram" and config.sum_mode:
            raise ValueError("state_key='ngram' requires sum_mode=False")
        if config.lattice_nbest:
            raise ValueError(
                "lattice_nbest needs the 'native' or 'python' backend; "
                "the device searcher returns the beam pool"
            )
        self.config = config

    def _make_state(self) -> LmBeamState:
        K = self.config.beam_width
        k = jnp.arange(K, dtype=jnp.uint32)
        ctx = np.full((K, max(self.order - 1, 1)), -1, np.int32)
        ctx[:, -1] = self.dev_lm.bos_id
        return LmBeamState(
            h1=jnp.where(k == 0, jnp.uint32(0x811C9DC5), jnp.uint32(0x80000000) | k),
            h2=jnp.where(k == 0, jnp.uint32(0x01000193), jnp.uint32(0x40000000) | k),
            node=jnp.zeros((K,), jnp.int32),
            last=jnp.full((K,), -1, jnp.int32),
            ctx=jnp.asarray(ctx),
            s=jnp.where(jnp.arange(K) == 0, 0.0, NEG).astype(jnp.float32),
            ns=jnp.full((K,), NEG, jnp.float32),
            ac_s=jnp.where(jnp.arange(K) == 0, 0.0, NEG).astype(jnp.float32),
            ac_ns=jnp.full((K,), NEG, jnp.float32),
            lm=jnp.zeros((K,), jnp.float32),
        )

    def reset(self) -> None:
        self.state = self._make_state()
        self.records: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self.n_frames = 0
        self._final_cache = None

    # ------------------------------------------------------------ expansion
    def _expand(self, state: LmBeamState, lp: jax.Array, scale: float,
                length_penalty: float, first_beam: Optional[int] = None,
                sum_mode: bool = True):
        """One frame of expansion. ``first_beam`` statically restricts the
        phone-extension candidates to the top-k log-prob phones of this frame
        (the reference's first-beam prune) — shrinking the per-frame sort from
        K·(V+H+2) to K·(first_beam+H+2) candidates. ``sum_mode`` selects the
        CTC-proper log-sum path merge (True, matching ctc_prefix_beam_search)
        or Kaldi-style Viterbi max (False, matching token passing over TLG)."""
        K = state.s.shape[0]
        V = lp.shape[0]
        H = self.H
        CW = state.ctx.shape[1]
        blank, sil = self.blank, self.sil
        score = (_logaddexp(state.s, state.ns) if sum_mode
                 else jnp.maximum(state.s, state.ns))
        ac = _logaddexp(state.ac_s, state.ac_ns)

        arangeK = jnp.arange(K, dtype=jnp.int32)
        lp_last = jnp.where(state.last >= 0, lp[jnp.clip(state.last, 0, V - 1)], NEG)

        def full(v, shape=(K,)):
            return jnp.full(shape, v)

        def sort_keys(wh1, wh2, node, last):
            """Merge identity = (word history, trie node, last phone) — the
            word-lattice state space of the reference's TLG decoding; silence
            repetitions and alignment variants collapse into one hypothesis."""
            code = (node * (V + 2) + last + 2).astype(jnp.int32)
            return hash_extend_jnp(wh1, wh2, code)

        # ---- 1. stay: blank emission (s-path) + absorbed repeat (ns-path)
        k1, k2 = sort_keys(state.h1, state.h2, state.node, state.last)
        stay = dict(
            k1=k1, k2=k2,
            h1=state.h1, h2=state.h2, node=state.node, last=state.last,
            ctx=state.ctx,
            s=score + scale * lp[blank],
            ns=jnp.where(state.last >= 0, state.ns + scale * lp_last, NEG),
            ac_s=ac + lp[blank],
            ac_ns=jnp.where(state.last >= 0, state.ac_ns + lp_last, NEG),
            lm=state.lm,
            parent=arangeK, sym=full(-1, (K,)).astype(jnp.int32),
            word=full(-1, (K,)).astype(jnp.int32),
        )

        # ---- packed per-node rows: ONE gather each for the close-branch data
        # (homophone word ids + their dense unigram log-probs + node
        # lookahead) and for the extension data (children + child lookahead).
        # Measured on the v5e: XLA charges ~30 ns per gathered ROW regardless
        # of width, so these two row gathers replace ~5 element/window
        # gathers per beam (see DESIGN.md round-3 notes).
        H2 = 2 * H
        nrow = self.trie.node_pack[state.node]                # (K, 2H+1)
        wids = nrow[:, :H]                                    # (K, H)
        uni_w = jax.lax.bitcast_convert_type(nrow[:, H:H2], jnp.float32)
        la_node = jax.lax.bitcast_convert_type(nrow[:, H2], jnp.float32)

        # ---- 2. extend with phone c (non-blank, non-SIL)
        if first_beam is not None and first_beam < V - 2:
            # restrict extensions to this frame's top phones (blank/SIL are
            # handled by the stay/silence/close branches)
            masked = lp.at[blank].set(-jnp.inf).at[sil].set(-jnp.inf)
            lp_fb, c_fb = jax.lax.top_k(masked, first_beam)   # (FB,)
            FB = first_beam
            c = jnp.broadcast_to(c_fb[None, :], (K, FB)).astype(jnp.int32)
            lp_ext = jnp.broadcast_to(lp_fb[None, :], (K, FB))
            # ONE paired-row gather [(child, la_bits)] per (beam, phone):
            # an 8-byte row gather costs the same ~30 ns as a scalar gather
            # on the v5e (cost is per gathered ROW), it is exact (unlike an
            # MXU one-hot matmul, bf16 by default — mangles node ids), and
            # it avoids minor-dim selects (~28 ns/element) and broadcast
            # one-hot reduces (measured 28x slower — lane-axis reductions).
            pair = self.trie.next_la2[state.node[:, None], c]  # (K, FB, 2)
        else:
            FB = V
            c = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32)[None, :], (K, V))
            lp_ext = jnp.broadcast_to(lp[None, :], (K, V))
            pair = self.trie.next_la2[state.node]              # (K, V, 2)
        child = pair[..., 0]
        la_child = jax.lax.bitcast_convert_type(pair[..., 1], jnp.float32)
        is_rep = c == state.last[:, None]
        base = jnp.where(is_rep, state.s[:, None], score[:, None])
        ac_base = jnp.where(is_rep, state.ac_s[:, None], ac[:, None])
        phone_ok = (c != blank) & (c != sil) & (child >= 0) & jnp.isfinite(lp_ext)
        ek1, ek2 = sort_keys(
            state.h1[:, None], state.h2[:, None], jnp.maximum(child, 0), c
        )
        la_delta = la_child - la_node[:, None]
        ext = dict(
            k1=ek1, k2=ek2,
            h1=jnp.broadcast_to(state.h1[:, None], (K, FB)),
            h2=jnp.broadcast_to(state.h2[:, None], (K, FB)),
            node=jnp.maximum(child, 0), last=c,
            ctx=jnp.broadcast_to(state.ctx[:, None, :], (K, FB, CW)),
            s=jnp.full((K, FB), NEG),
            ns=jnp.where(phone_ok, base + scale * lp_ext + la_delta, NEG),
            ac_s=jnp.full((K, FB), NEG),
            ac_ns=jnp.where(phone_ok, ac_base + lp_ext, NEG),
            lm=jnp.broadcast_to(state.lm[:, None], (K, FB)),
            parent=jnp.broadcast_to(arangeK[:, None], (K, FB)),
            sym=jnp.where(phone_ok, c, -1),
            word=jnp.full((K, FB), -1, jnp.int32),
        )

        # ---- 3. SIL at root: extra/leading silence
        sil_base = jnp.where(state.last == sil, state.s, score)
        sil_ac_base = jnp.where(state.last == sil, state.ac_s, ac)
        at_root = state.node == 0
        rk1, rk2 = sort_keys(
            state.h1, state.h2, jnp.zeros((K,), jnp.int32), jnp.int32(sil)
        )
        silroot = dict(
            k1=rk1, k2=rk2,
            h1=state.h1, h2=state.h2, node=jnp.zeros((K,), jnp.int32),
            last=full(sil, (K,)).astype(jnp.int32), ctx=state.ctx,
            s=jnp.full((K,), NEG),
            ns=jnp.where(at_root, sil_base + scale * lp[sil], NEG),
            ac_s=jnp.full((K,), NEG),
            ac_ns=jnp.where(at_root, sil_ac_base + lp[sil], NEG),
            lm=state.lm,
            parent=arangeK, sym=jnp.where(at_root, sil, -1).astype(jnp.int32),
            word=full(-1, (K,)).astype(jnp.int32),
        )

        # ---- 4. close word(s): SIL at word-final node, n-gram scored
        w_ok = wids >= 0                              # (K, H) from node_pack
        # one logp_words call per beam: context hashing + backoff probes run
        # once per K, gram probes per (K, H); level-0 unigram log-probs come
        # precomputed from node_pack (zero extra gathers)
        wlp = jax.vmap(
            lambda c, w, u: self.dev_lm.logp_words(
                c, w, u, n_exact=self.close_top
            )
        )(state.ctx, jnp.maximum(wids, 0), uni_w)     # (K, H)
        wlp = wlp + length_penalty
        new_ctx = jnp.concatenate(
            [
                jnp.broadcast_to(state.ctx[:, None, 1:], (K, H, CW - 1)),
                jnp.maximum(wids, 0)[:, :, None],
            ],
            axis=2,
        ) if CW > 1 else jnp.maximum(wids, 0)[:, :, None]
        if self.state_key == "ngram":
            # identity = the new LM context window (hypotheses with
            # different full histories but the same last order−1 words
            # merge — the Kaldi token-passing state space)
            from ..lm.device_ngram import hash_ctx_jnp

            wh1, wh2 = hash_ctx_jnp(new_ctx)
        else:
            wh1, wh2 = hash_extend_jnp(
                state.h1[:, None], state.h2[:, None], wids + V + 2
            )
        ck1, ck2 = sort_keys(
            wh1, wh2, jnp.zeros((K, H), jnp.int32), jnp.int32(sil)
        )
        la_close = self.la0 - la_node[:, None]        # (K, 1) broadcast
        close = dict(
            k1=ck1, k2=ck2,
            h1=wh1, h2=wh2, node=jnp.zeros((K, H), jnp.int32),
            last=jnp.full((K, H), sil, jnp.int32),
            ctx=new_ctx,
            s=jnp.full((K, H), NEG),
            ns=jnp.where(
                w_ok, sil_base[:, None] + scale * lp[sil] + wlp + la_close, NEG
            ),
            ac_s=jnp.full((K, H), NEG),
            ac_ns=jnp.where(w_ok, sil_ac_base[:, None] + lp[sil], NEG),
            lm=jnp.where(w_ok, state.lm[:, None] + wlp, state.lm[:, None]),
            parent=jnp.broadcast_to(arangeK[:, None], (K, H)),
            sym=jnp.where(w_ok, sil, -1),
            word=jnp.where(w_ok, wids, -1),
        )

        def flat(d):
            out = {}
            for key, v in d.items():
                if key == "ctx":
                    out[key] = v.reshape(-1, CW)
                else:
                    out[key] = v.reshape(-1)
            return out

        parts = [flat(stay), flat(ext), flat(silroot), flat(close)]
        cand = {
            key: jnp.concatenate([p[key] for p in parts], axis=0)
            for key in parts[0]
        }

        # ---- dedupe + merge + prune
        # TPU-measured cost model (see DESIGN.md): batched take_along_axis
        # gathers dominate this step (~0.2 ms each), while extra sort operands
        # and MXU/VPU work are nearly free. So: (1) the four score components
        # ride THROUGH the sort as operands (no post-sort gathers), (2) every
        # other per-candidate field is packed into ONE int32 payload matrix
        # gathered once for the K winners. Merged duplicates share identical
        # (h1, h2, node, last, ctx, lm) by construction, and any member's
        # parent backtraces to the same word history, so the segment-end
        # representative is exact.
        N = cand["k1"].shape[0]
        payload = jnp.concatenate(
            [
                jnp.stack(
                    [
                        jax.lax.bitcast_convert_type(cand["h1"], jnp.int32),
                        jax.lax.bitcast_convert_type(cand["h2"], jnp.int32),
                        cand["node"], cand["last"], cand["parent"],
                        cand["sym"], cand["word"],
                        jax.lax.bitcast_convert_type(cand["lm"], jnp.int32),
                    ],
                    axis=-1,
                ),
                cand["ctx"],
            ],
            axis=-1,
        )  # (N, 8 + CW)

        # third sort key = the candidate's Viterbi rank, so each segment's
        # LAST element (the representative whose payload the winner gather
        # takes) is the segment's best path. Under history keying all
        # payload fields are equal within a segment so this is free either
        # way; under ngram keying different word histories share a segment
        # and the representative's (parent, word, lm, ctx) MUST be the
        # winner's (extra lax.sort operands measured nearly free, DESIGN.md)
        mkey = jnp.maximum(cand["s"], cand["ns"])
        k1s, k2s, _mks, ss, nss, acss, acnss, perm = jax.lax.sort(
            (cand["k1"], cand["k2"], mkey, cand["s"], cand["ns"],
             cand["ac_s"], cand["ac_ns"], jnp.arange(N, dtype=jnp.int32)),
            num_keys=3,
        )

        starts = jnp.concatenate(
            [jnp.ones((1,), bool), (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])]
        )
        all4 = jnp.stack([ss, nss, acss, acnss], axis=-1)  # (N, 4)
        merged4 = _seg_merge4(all4, starts, sum_mode)
        merged, ac_merged = merged4[:, :2], merged4[:, 2:]
        seg_end = jnp.concatenate([starts[1:], jnp.ones((1,), bool)])
        combined = (_logaddexp(merged[:, 0], merged[:, 1]) if sum_mode
                    else jnp.maximum(merged[:, 0], merged[:, 1]))
        total = jnp.where(seg_end, combined, -jnp.inf)

        top_total, top_idx = jax.lax.top_k(total, K)
        valid = top_total > -jnp.inf
        # two K-wide gathers total: merged scores (+perm) and the payload
        scores_and_perm = jnp.concatenate(
            [merged, ac_merged, perm[:, None].astype(jnp.float32)], axis=-1
        )[top_idx]                   # (K, 5); perm fits f32 exactly (N small)
        win = scores_and_perm[:, 4].astype(jnp.int32)
        pw = payload[win]            # (K, 8 + CW)
        new_state = LmBeamState(
            h1=jax.lax.bitcast_convert_type(pw[:, 0], jnp.uint32),
            h2=jax.lax.bitcast_convert_type(pw[:, 1], jnp.uint32),
            node=pw[:, 2], last=pw[:, 3],
            ctx=pw[:, 8:],
            s=jnp.where(valid, scores_and_perm[:, 0], NEG),
            ns=jnp.where(valid, scores_and_perm[:, 1], NEG),
            ac_s=jnp.where(valid, scores_and_perm[:, 2], NEG),
            ac_ns=jnp.where(valid, scores_and_perm[:, 3], NEG),
            lm=jax.lax.bitcast_convert_type(pw[:, 7], jnp.float32),
        )
        return new_state, pw[:, 4], pw[:, 5], pw[:, 6]

    # ----------------------------------------------------------------- scan
    def _build_scan(self):
        @functools.partial(jax.jit, static_argnames=("scale", "length_penalty",
                                                     "log_blank_penalty",
                                                     "blank_skip_thresh",
                                                     "first_beam", "sum_mode"))
        def scan_chunk(table, state, lp_chunk, scale: float,
                       length_penalty: float,
                       log_blank_penalty: float, blank_skip_thresh: float,
                       first_beam=None, sum_mode: bool = True):
            self.dev_lm.bind_table(table)
            if log_blank_penalty != 0.0:
                lp_chunk = lp_chunk.at[:, self.blank].add(-log_blank_penalty)

            use_skip = blank_skip_thresh < 1.0
            if use_skip:
                skip = jnp.exp(lp_chunk[:, self.blank]) > blank_skip_thresh
                prev_skip = jnp.concatenate([jnp.zeros((1,), bool), skip[:-1]])
                reinsert = prev_skip & ~skip
                blank_row = jnp.full((lp_chunk.shape[1],), -30.0)
                blank_row = blank_row.at[self.blank].set(0.0)

            def step(state, inputs):
                if use_skip:
                    lp, do_skip, do_reinsert = inputs
                    st_b, pb, sb, wb = self._expand(
                        state, blank_row, scale, length_penalty, first_beam,
                        sum_mode,
                    )
                    state = jax.tree_util.tree_map(
                        lambda n, o: jnp.where(
                            jnp.reshape(do_reinsert, (-1,) + (1,) * (n.ndim - 1)), n, o
                        ) if n.ndim else jnp.where(do_reinsert, n, o),
                        st_b, state,
                    )
                else:
                    lp, do_skip = inputs[0], None
                new_state, parents, syms, words = self._expand(
                    state, lp, scale, length_penalty, first_beam, sum_mode
                )
                if use_skip:
                    keepmask = ~do_skip
                    new_state = jax.tree_util.tree_map(
                        lambda n, o: jnp.where(
                            jnp.reshape(keepmask, (-1,) + (1,) * (n.ndim - 1)), n, o
                        ) if n.ndim else jnp.where(keepmask, n, o),
                        new_state, state,
                    )
                    K = parents.shape[0]
                    parents = jnp.where(do_skip, jnp.arange(K, dtype=jnp.int32), parents)
                    syms = jnp.where(do_skip, -1, syms)
                    words = jnp.where(do_skip, -1, words)
                return new_state, (parents, syms, words)

            xs = (lp_chunk, skip, reinsert) if use_skip else (lp_chunk,)
            try:
                state, recs = jax.lax.scan(step, state, xs)
            finally:
                self.dev_lm.unbind_table()
            return state, recs

        return scan_chunk

    def _build_finalize(self):
        def finalize(state: LmBeamState, sum_mode: bool = True,
                     length_penalty=0.0):
            """Close open words (no acoustic cost) + </s>; returns per-
            candidate scores over (K, H+1) [slot H = already-at-root].
            length_penalty applies to the final word close, as in the host
            oracle (lmbeam.py:304) and native (decoder.cc:654)."""
            K, H = state.node.shape[0], self.H
            CW = state.ctx.shape[1]
            wids = self.trie.words_at[state.node]      # (K, H)
            w_ok = wids >= 0
            wlp = jax.vmap(self.dev_lm.logp_words)(
                state.ctx, jnp.maximum(wids, 0)
            ) + length_penalty
            new_ctx = jnp.concatenate(
                [jnp.broadcast_to(state.ctx[:, None, 1:], (K, H, CW - 1)),
                 jnp.maximum(wids, 0)[:, :, None]], axis=2
            ) if CW > 1 else jnp.maximum(wids, 0)[:, :, None]
            eos = jnp.asarray(self.dev_lm.eos_id, jnp.int32)
            eos_close = jax.vmap(jax.vmap(self.dev_lm.logp, in_axes=(0, None)),
                                 in_axes=(0, None))(new_ctx, eos)   # (K, H)
            eos_root = jax.vmap(self.dev_lm.logp, in_axes=(0, None))(
                state.ctx, eos
            )                                                       # (K,)

            score = (_logaddexp(state.s, state.ns) if sum_mode
                     else jnp.maximum(state.s, state.ns))
            at_root = state.node == 0
            la_adj = (self.la[0] - self.la[state.node])[:, None]
            close_score = jnp.where(
                w_ok & ~at_root[:, None],
                score[:, None] + wlp + la_adj + eos_close, -jnp.inf,
            )
            root_score = jnp.where(at_root, score + eos_root, -jnp.inf)
            all_scores = jnp.concatenate([close_score, root_score[:, None]], axis=1)
            all_words = jnp.concatenate(
                [jnp.where(w_ok, wids, -1), jnp.full((K, 1), -1, jnp.int32)], axis=1
            )
            all_lm = jnp.concatenate(
                [jnp.where(w_ok, state.lm[:, None] + wlp + eos_close, 0.0),
                 (state.lm + eos_root)[:, None]], axis=1
            )
            ac = _logaddexp(state.ac_s, state.ac_ns)
            all_ac = jnp.broadcast_to(ac[:, None], (K, H + 1))
            return all_scores, all_words, all_lm, all_ac

        def finalize_batch(state, sum_mode: bool = True, length_penalty=0.0):
            return jax.vmap(
                lambda s: finalize(s, sum_mode, length_penalty)
            )(state)

        self._finalize_impl = finalize_batch  # unjitted, for the sharded path

        def finalize_bound(table, state, sum_mode=True, length_penalty=0.0):
            self.dev_lm.bind_table(table)
            try:
                return finalize(state, sum_mode, length_penalty)
            finally:
                self.dev_lm.unbind_table()

        def finalize_batch_bound(table, state, sum_mode=True,
                                 length_penalty=0.0):
            self.dev_lm.bind_table(table)
            try:
                return finalize_batch(state, sum_mode, length_penalty)
            finally:
                self.dev_lm.unbind_table()

        return (
            jax.jit(finalize_bound, static_argnames=("sum_mode",)),
            jax.jit(finalize_batch_bound, static_argnames=("sum_mode",)),
        )

    def _build_batch_scan(self):
        """Batched utterance decode: vmap the expansion over B utterances and
        scan once over time — fills the VPU with B×K×V candidate lanes, which
        is where the TPU's throughput advantage over per-utterance decoding
        comes from."""

        def scan_batch_impl(state, lp_btv, lengths, scale: float,
                            length_penalty: float, log_blank_penalty: float,
                            first_beam=None, sum_mode: bool = True):
            B, T, V = lp_btv.shape
            K = state.s.shape[1]
            if log_blank_penalty != 0.0:
                lp_btv = lp_btv.at[:, :, self.blank].add(-log_blank_penalty)

            expand = jax.vmap(
                lambda st, lp: self._expand(st, lp, scale, length_penalty,
                                            first_beam, sum_mode)
            )

            def step(state, tl):
                t, lp_b = tl
                new_state, parents, syms, words = expand(state, lp_b)
                active = t < lengths  # (B,)

                def sel(n, o):
                    mask = active.reshape((-1,) + (1,) * (n.ndim - 1))
                    return jnp.where(mask, n, o)

                state = jax.tree_util.tree_map(sel, new_state, state)
                parents = jnp.where(
                    active[:, None], parents,
                    jnp.arange(K, dtype=jnp.int32)[None, :],
                )
                syms = jnp.where(active[:, None], syms, -1)
                words = jnp.where(active[:, None], words, -1)
                # int16 backpointers: halves the per-utterance record fetch
                # through the (slow) host link; K is bounded well below 2^15
                return state, (parents.astype(jnp.int16),
                               syms.astype(jnp.int16), words)

            ts = jnp.arange(T, dtype=jnp.int32)
            state, recs = jax.lax.scan(
                step, state, (ts, jnp.moveaxis(lp_btv, 1, 0))
            )
            return state, recs

        self._scan_impl = scan_batch_impl  # unjitted, for the sharded path

        def scan_batch_bound(table, state, lp_btv, lengths, scale,
                             length_penalty, log_blank_penalty,
                             first_beam=None, sum_mode=True):
            # the LM table is a jit ARGUMENT (multi-GB closure constants hang
            # the remote compiler); bound onto dev_lm while tracing
            self.dev_lm.bind_table(table)
            try:
                return scan_batch_impl(state, lp_btv, lengths, scale,
                                       length_penalty, log_blank_penalty,
                                       first_beam, sum_mode)
            finally:
                self.dev_lm.unbind_table()

        return jax.jit(
            scan_batch_bound,
            static_argnames=("scale", "length_penalty", "log_blank_penalty",
                             "first_beam", "sum_mode"),
        )

    def decode_batch(
        self,
        log_probs: np.ndarray,
        input_lengths: Optional[np.ndarray] = None,
        nbest: Optional[int] = None,
    ) -> List[List[DecodeResult]]:
        """One-shot decode of (B, T, 41) utterances → per-utterance n-best.

        Frames past input_lengths are ignored. Blank skipping is handled by
        host-side frame compaction (compact_blank_skip) so the device scan
        only runs over informative frames.
        """
        import os
        import time as _time

        if not os.environ.get("B2TXT_DECODE_TIMING"):
            return self._collect_batch(
                self._dispatch_batch(log_probs, input_lengths), nbest
            )
        # stage-timed variant (debug): sync after the device work, then fetch
        t0 = _time.perf_counter()
        final, recs = self._dispatch_batch(log_probs, input_lengths)
        t_disp = _time.perf_counter()
        float(np.asarray(final[0][0, 0, 0]))
        t_scan = _time.perf_counter()
        final = tuple(np.asarray(x) for x in final)
        recs = (np.asarray(recs[0]), None, np.asarray(recs[2]))
        t_fetch = _time.perf_counter()
        out = self._extract_results(final, recs, nbest)
        print(f"decode_batch timing: prep+dispatch={t_disp - t0:.2f}s "
              f"scan+finalize={t_scan - t_disp:.2f}s "
              f"fetch={t_fetch - t_scan:.2f}s "
              f"extract={_time.perf_counter() - t_fetch:.2f}s", flush=True)
        return out

    def _dispatch_batch(self, log_probs, input_lengths):
        """Issue the device scan + finalize WITHOUT fetching (JAX dispatch is
        async — the arrays materialize on device while the host does other
        work). Pair with _collect_batch."""
        cfg = self.config
        lp_np, input_lengths, log_bp = self._prep_batch(log_probs, input_lengths)
        B = lp_np.shape[0]
        single = self._make_state()
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), single
        )
        state, recs = self._batch_scan(
            self.dev_lm.table[0], state, jnp.asarray(lp_np),
            jnp.asarray(input_lengths, jnp.int32),
            scale=float(cfg.acoustic_scale),
            length_penalty=float(cfg.length_penalty),
            log_blank_penalty=log_bp,
            first_beam=cfg.first_beam_size or None,
            sum_mode=bool(cfg.sum_mode),
        )
        final = self._finalize_batch(
            self.dev_lm.table[0], state, sum_mode=bool(cfg.sum_mode),
            length_penalty=float(cfg.length_penalty),
        )
        return final, recs

    def _collect_batch(self, handle, nbest=None):
        final, recs = handle
        return self._extract_results(final, recs, nbest)

    def decode_batches(self, batches, nbest=None):
        """Software-pipelined decode over [(log_probs, lengths), ...]: the
        next batch's device scan is dispatched BEFORE the previous batch's
        outputs are fetched and extracted, hiding the host-side n-best work
        (measured ~25% of wall at 125k/B=128) under device compute. Yields
        per-batch result lists in order."""
        pending = None
        for item in batches:
            handle = self._dispatch_batch(item[0], item[1])
            if pending is not None:
                yield self._collect_batch(pending, nbest)
            pending = handle
        if pending is not None:
            yield self._collect_batch(pending, nbest)

    def _prep_batch(self, log_probs, input_lengths):
        """Batch prep shared by the plain and sharded decodes: blank-skip
        frame compaction + T bucketing (static scan shapes).

        When the blank penalty alone makes the skip threshold unreachable —
        exp(lp_blank − log(penalty)) ≤ 1/penalty < threshold, the CANONICAL
        production regime (penalty 90, threshold 0.98; see DESIGN.md on the
        reference's latent blank-skip) — compaction is provably a no-op and
        the input never round-trips to the host: a device-resident logits
        array (e.g. straight from the RNN forward) stays on device."""
        cfg = self.config
        B, T, V = log_probs.shape
        if input_lengths is None:
            input_lengths = np.full((B,), T, np.int32)
        log_bp = float(math.log(cfg.blank_penalty))
        thresh = float(cfg.ctc_blank_skip_threshold)
        skip_possible = thresh < 1.0 and (1.0 / cfg.blank_penalty) > thresh
        if thresh < 1.0 and skip_possible:
            lp_np = np.asarray(log_probs, np.float32)
            lp_np, input_lengths = compact_blank_skip(
                lp_np, np.asarray(input_lengths),
                self.blank, thresh, log_bp,
            )
            log_bp = 0.0  # penalty already applied during compaction
        else:
            lp_np = log_probs  # device array stays device-resident
        # bucket T to limit scan recompiles across varying utterance lengths
        T_cur = lp_np.shape[1]
        T_pad = max(32, -(-T_cur // 32) * 32)
        if T_pad != T_cur:
            if isinstance(lp_np, np.ndarray):
                pad = np.full((B, T_pad - T_cur, V), -30.0, np.float32)
                pad[:, :, self.blank] = 0.0
                lp_np = np.concatenate([lp_np, pad], axis=1)
            else:
                pad = jnp.full((B, T_pad - T_cur, V), -30.0, jnp.float32)
                pad = pad.at[:, :, self.blank].set(0.0)
                lp_np = jnp.concatenate([lp_np.astype(jnp.float32), pad],
                                        axis=1)
        return lp_np, np.asarray(input_lengths, np.int32), log_bp

    def _extract_results(self, final, recs, nbest):
        cfg = self.config
        scores, fwords, lms, acs = (np.asarray(x) for x in final)
        B = scores.shape[0]
        # syms are not needed for batched n-best extraction — don't fetch them
        parents = np.asarray(recs[0]).astype(np.int64)        # (T, B, K)
        words = np.asarray(recs[2])
        traces = _backtrace_all(parents, words)               # (T, B, K)

        if self.rescore_lm is not None:
            scores, lms = self._apply_rescore(scores, lms, fwords, traces)

        n_out = nbest or cfg.nbest
        results: List[List[DecodeResult]] = []
        for b in range(B):
            flat = scores[b].reshape(-1)
            order = np.argsort(-flat)
            out: List[DecodeResult] = []
            seen = set()
            H1 = scores.shape[2]
            for idx in order:
                if len(out) >= n_out or not np.isfinite(flat[idx]):
                    break
                k, j = divmod(int(idx), H1)
                col = traces[:, b, k]
                ws = col[col >= 0].tolist()
                if fwords[b, k, j] >= 0:
                    ws = ws + [int(fwords[b, k, j])]
                if not ws:
                    continue
                sentence = " ".join(self.lexicon.words[w] for w in ws)
                if sentence in seen:
                    continue
                seen.add(sentence)
                out.append(
                    DecodeResult(
                        sentence=sentence,
                        ac_score=float(acs[b, k, j]),
                        lm_score=float(lms[b, k, j]),
                    )
                )
            results.append(out)
        return results

    # -------------------------------------------------------------- sharded
    def sharded_decode_batch(
        self,
        log_probs: np.ndarray,
        input_lengths: Optional[np.ndarray] = None,
        *,
        mesh,
        axis: str = "data",
        nbest: Optional[int] = None,
    ) -> List[List[DecodeResult]]:
        """decode_batch over a jax.sharding.Mesh: the utterance batch shards
        over ``axis`` AND the n-gram bucket table row-shards over the same
        devices' HBM (ShardedNGram). This is the capacity scaling for
        reference-scale LMs — the ~300 GB-RAM SRILM 5-gram (README.md:101)
        becomes bucket rows split D ways; probes exchange keys with
        all_gather and reassemble answers with a psum over the axis.

        Results are bit-identical to decode_batch (tested on the virtual
        8-device mesh). B must be divisible by the axis size.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = self.config
        D = mesh.shape[axis]
        lp_np, lengths, log_bp = self._prep_batch(log_probs, input_lengths)
        B = lp_np.shape[0]
        if B % D:
            raise ValueError(f"batch {B} not divisible by mesh axis size {D}")

        # cache key by device identity, not the Mesh object: two Mesh objects
        # over the same devices share one compiled runner (the FIRST such
        # Mesh stays captured by that runner's shard_map closure; later
        # equal meshes are no longer pinned)
        key = (tuple(d.id for d in mesh.devices.flat), mesh.axis_names, axis)
        if getattr(self, "_sharded_cache", None) is None:
            self._sharded_cache = {}
        if key not in self._sharded_cache:
            self._sharded_cache[key] = self._build_sharded_scan(mesh, axis)
        run = self._sharded_cache[key]

        packed, cap = self.dev_lm.table
        table = jax.device_put(packed, NamedSharding(mesh, P(axis, None)))
        single = self._make_state()
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), single
        )
        final_and_recs = run(
            table, state, jnp.asarray(lp_np), jnp.asarray(lengths),
            scale=float(cfg.acoustic_scale),
            length_penalty=float(cfg.length_penalty),
            log_blank_penalty=log_bp,
            first_beam=cfg.first_beam_size or None,
            sum_mode=bool(cfg.sum_mode),
        )
        final, recs = final_and_recs
        return self._extract_results(final, recs, nbest)

    def _build_sharded_scan(self, mesh, axis: str):
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from ..lm.device_ngram import ShardedNGram

        sharded_lm = ShardedNGram.from_device_ngram(self.dev_lm, axis)
        base_lm = self.dev_lm

        def local_fn(table_shard, state, lp_btv, lengths, *, scale,
                     length_penalty, log_blank_penalty, first_beam, sum_mode):
            # swap the LM view for the collective one while TRACING the scan
            # and finalize bodies (shard_map traces this function once per
            # shape; the swap is trace-time only)
            sharded_lm.bind_shard(table_shard)
            self.dev_lm = sharded_lm
            try:
                state, recs = self._scan_impl(
                    state, lp_btv, lengths, scale, length_penalty,
                    log_blank_penalty, first_beam, sum_mode,
                )
                final = self._finalize_impl(state, sum_mode, length_penalty)
            finally:
                self.dev_lm = base_lm
            return final, recs

        state_spec = P(axis)
        rec_spec = (P(None, axis), P(None, axis), P(None, axis))
        final_spec = (P(axis), P(axis), P(axis), P(axis))

        @functools.partial(jax.jit, static_argnames=(
            "scale", "length_penalty", "log_blank_penalty", "first_beam",
            "sum_mode"))
        def run(table, state, lp_btv, lengths, scale, length_penalty,
                log_blank_penalty, first_beam, sum_mode):
            fn = functools.partial(
                local_fn, scale=scale, length_penalty=length_penalty,
                log_blank_penalty=log_blank_penalty, first_beam=first_beam,
                sum_mode=sum_mode,
            )
            wrapped = shard_map(
                fn, mesh=mesh,
                in_specs=(P(axis, None), state_spec, P(axis, None, None),
                          P(axis)),
                out_specs=(final_spec, rec_spec),
            )
            return wrapped(table, state, lp_btv, lengths)

        return run

    # ------------------------------------------------------------- protocol
    def decode(self, log_probs: np.ndarray) -> None:
        """Advance over a (T, 41) chunk of log-probs (model channel order)."""
        cfg = self.config
        lp = jnp.asarray(log_probs, jnp.float32)
        self.state, recs = self._scan(
            self.dev_lm.table[0], self.state, lp,
            scale=float(cfg.acoustic_scale),
            length_penalty=float(cfg.length_penalty),
            log_blank_penalty=float(math.log(cfg.blank_penalty)),
            blank_skip_thresh=float(cfg.ctc_blank_skip_threshold),
            first_beam=cfg.first_beam_size or None,
            sum_mode=bool(cfg.sum_mode),
        )
        self.records.append(tuple(np.asarray(r) for r in recs))
        self.n_frames += lp.shape[0]
        self._final_cache = None

    def decoded_something(self) -> bool:
        return self.n_frames > 0

    def _backtrace_words(self, beam: int) -> List[int]:
        words: List[int] = []
        k = beam
        for parents, syms, wrec in reversed(self.records):
            for t in range(parents.shape[0] - 1, -1, -1):
                w = wrec[t, k]
                if w >= 0:
                    words.append(int(w))
                k = int(parents[t, k])
        words.reverse()
        return words

    def finish_decoding(self) -> List[DecodeResult]:
        cfg = self.config
        scores, fwords, lms, acs = (
            np.asarray(x)
            for x in self._finalize_fn(self.dev_lm.table[0], self.state,
                                       sum_mode=bool(cfg.sum_mode),
                                       length_penalty=float(cfg.length_penalty))
        )
        if self.rescore_lm is not None and self.records:
            # streaming path: reconstruct every beam's word trace, then run
            # the same pool rescore as the batched path on (1, K, ·) shapes
            K = scores.shape[0]
            T_tot = sum(r[0].shape[0] for r in self.records)
            traces = np.full((T_tot, 1, K), -1, np.int32)
            for k in range(K):
                ws = self._backtrace_words(k)
                traces[: len(ws), 0, k] = ws
            s2, l2 = self._apply_rescore(
                scores[None], lms[None], fwords[None], traces
            )
            scores, lms = s2[0], l2[0]
        flat = scores.reshape(-1)
        order = np.argsort(-flat)
        results: List[DecodeResult] = []
        seen = set()
        H1 = scores.shape[1]
        for idx in order:
            if len(results) >= cfg.nbest or not np.isfinite(flat[idx]):
                break
            k, j = divmod(int(idx), H1)
            words = self._backtrace_words(k)
            if fwords[k, j] >= 0:
                words = words + [int(fwords[k, j])]
            if not words:
                continue
            sentence = " ".join(self.lexicon.words[w] for w in words)
            if sentence in seen:
                continue
            seen.add(sentence)
            results.append(
                DecodeResult(
                    sentence=sentence,
                    ac_score=float(acs[k, j]),
                    lm_score=float(lms[k, j]),
                )
            )
        self._final_cache = results
        return results

    def result(self) -> List[DecodeResult]:
        if self._final_cache is not None:
            return self._final_cache
        if self.n_frames == 0:
            return []
        score = np.asarray(_logaddexp(self.state.s, self.state.ns))
        k = int(np.argmax(score))
        words = self._backtrace_words(k)
        if not np.isfinite(score[k]):
            return []
        sentence = " ".join(self.lexicon.words[w] for w in words)
        return [
            DecodeResult(
                sentence=sentence,
                ac_score=float(np.asarray(_logaddexp(self.state.ac_s, self.state.ac_ns))[k]),
                lm_score=float(np.asarray(self.state.lm)[k]),
            )
        ]
