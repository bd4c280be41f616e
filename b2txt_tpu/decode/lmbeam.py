"""Lexicon-constrained CTC beam search with n-gram fusion — host reference.

This is the TPU-framework replacement for the reference's WFST pipeline
(T∘L∘G composition + Kaldi token passing: ctc_wfst_beam_search.cc +
lattice-faster-online-decoder): instead of compiling the CTC topology, lexicon
and LM into TLG.fst, hypotheses walk the phoneme trie directly and the n-gram
LM is queried word-synchronously when SIL (the word separator) closes a word.

Semantics carried over from the reference decoder:
  * acoustic_scale multiplies acoustic log-probs during search
    (CtcWfstBeamSearchOptions, lm_decoder.cc:30-35)
  * blank_penalty subtracts log(penalty) from the blank log-prob before search
    (DecodeNumpy, lm_decoder.cc:14-37)
  * blank-frame skipping above ctc_blank_skip_threshold, with one blank frame
    re-inserted before a repeated symbol (ctc_wfst_beam_search.cc:70-121)
  * length_penalty added per emitted word
  * nbest results carry (sentence, ac_score, lm_score) like DecodeResult
    (brain_speech_decoder.h:100-108)
  * homophones branch into distinct hypotheses (the role of alternative L arcs)

The search merges alignment paths per (word history, trie node) state in
log-sum (CTC-proper) or max (Kaldi-style Viterbi) mode. A vectorized device
version lives in lmbeam_jax.py; this module is its oracle and the
small-vocabulary fallback.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..lm.lexicon import Lexicon
from ..lm.ngram import BOS, EOS, NGramLM
from ..utils.config import DecodeConfig
from ..utils.phonemes import BLANK_ID, SIL_ID_MODEL

NEG_INF = -float("inf")


def log_add(a: float, b: float) -> float:
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = max(a, b)
    return m + math.log1p(math.exp(min(a, b) - m))


@dataclass
class LmHyp:
    """One hypothesis: word history + partial-word trie position.

    Ranking score r = acoustic_scale·(acoustic) + lm, kept split into
    blank-ending (s) / non-blank-ending (ns) CTC components. ac_* track the
    unscaled acoustic part for DecodeResult-style reporting.
    """

    words: Tuple[int, ...] = ()
    node: int = 0
    last: int = -1
    s: float = NEG_INF
    ns: float = NEG_INF
    ac_s: float = NEG_INF
    ac_ns: float = NEG_INF
    lm: float = 0.0

    @property
    def score(self) -> float:
        return log_add(self.s, self.ns) if self.s != NEG_INF or self.ns != NEG_INF else NEG_INF

    @property
    def ac_score(self) -> float:
        return log_add(self.ac_s, self.ac_ns)


@dataclass
class DecodeResult:
    """Mirror of the reference DecodeResult (brain_speech_decoder.h:100-108)."""

    sentence: str
    ac_score: float
    lm_score: float


Key = Tuple[Tuple[int, ...], int, int]


class LexiconBeamSearch:
    """Stateful incremental decoder (reset / decode-chunk / finalize)."""

    def __init__(
        self,
        lexicon: Lexicon,
        lm: NGramLM,
        config: Optional[DecodeConfig] = None,
        blank: int = BLANK_ID,
        sil: int = SIL_ID_MODEL,
        sum_mode: Optional[bool] = None,
        max_homophones: int = 4,
        lm_lookahead: bool = True,
    ):
        self.lexicon = lexicon
        self.lm = lm
        self.config = config or DecodeConfig()
        if sum_mode is not None:
            self.config = self.config.replace(sum_mode=sum_mode)
        self.blank = blank
        self.sil = sil
        self.max_homophones = max_homophones
        # LM lookahead smearing over the trie: partial words carry the best
        # reachable unigram score so they compete fairly with closed words
        # (cancels exactly at word close — net final scores are unchanged).
        if lm_lookahead:
            self.la = lexicon.lookahead_scores(lambda w: lm.logp([], w))
        else:
            import numpy as _np

            self.la = _np.zeros(lexicon.n_nodes, _np.float32)
        # per-node homophone-class members ordered by DESCENDING unigram
        # log-prob (stable: ties keep CSR order), so the max_homophones cap
        # drops the least-likely members — the SAME drop policy as the
        # device TrieArrays and the native decoder (cross-backend parity
        # when a class exceeds the cap).
        self._node_words_cache: dict = {}
        self.reset()

    def _node_words(self, node: int):
        ws = self._node_words_cache.get(node)
        if ws is None:
            ws = sorted(
                self.lexicon.node_words(node),
                key=lambda w: -self.lm.logp([], self.lexicon.words[w]),
            )
            self._node_words_cache[node] = ws
        return ws

    def set_opt(self, config: DecodeConfig) -> None:
        """Runtime reconfiguration (parity: BrainSpeechDecoder::SetOpt)."""
        self.config = config

    def reset(self) -> None:
        root = LmHyp(s=0.0, ns=NEG_INF, ac_s=0.0, ac_ns=NEG_INF)
        self.hyps: Dict[Key, LmHyp] = {((), 0, -1): root}
        self.n_frames = 0
        self._finalized: Optional[List[DecodeResult]] = None
        self._pending_blank = False  # blank-skip bookkeeping

    # ----------------------------------------------------------------- core
    def _score(self, h: LmHyp) -> float:
        """Ranking score under the configured merge mode: CTC-proper log-sum
        of the blank/non-blank components, or Viterbi max (Kaldi token
        passing takes the best path through a state)."""
        if self.config.sum_mode:
            return h.score
        return max(h.s, h.ns)

    def _merge(self, into: Dict[Key, LmHyp], hyp: LmHyp) -> None:
        key = (hyp.words, hyp.node, hyp.last)
        cur = into.get(key)
        if cur is None:
            into[key] = hyp
            return
        if self.config.sum_mode:
            cur.s = log_add(cur.s, hyp.s)
            cur.ns = log_add(cur.ns, hyp.ns)
            cur.ac_s = max(cur.ac_s, hyp.ac_s)
            cur.ac_ns = max(cur.ac_ns, hyp.ac_ns)
        else:
            if hyp.s > cur.s:
                cur.s, cur.ac_s = hyp.s, hyp.ac_s
            if hyp.ns > cur.ns:
                cur.ns, cur.ac_ns = hyp.ns, hyp.ac_ns
        # lm equal by construction for identical word history

    def _lm_context(self, words: Tuple[int, ...]) -> List[str]:
        # Sentence-start conditioning: G.fst decoding starts in the <s>
        # context state, so the first word scores as P(w | <s>).
        return [BOS] + [self.lexicon.words[w] for w in words]

    def _step(self, lp: np.ndarray) -> None:
        cfg = self.config
        scale = cfg.acoustic_scale
        next_hyps: Dict[Key, LmHyp] = {}

        # first-beam prune: restrict phone extensions to this frame's top-k
        # phones (threshold at the k-th best non-blank/non-SIL log-prob; SIL
        # always kept) — the reference first-pass beam, mirrored by the C++
        # (decoder.cc Step) and device (lmbeam_jax._expand) searchers.
        V = lp.shape[0]
        fb = cfg.first_beam_size
        fb_thresh = NEG_INF
        if fb > 0 and fb < V - 2:
            vals = sorted(
                (float(lp[c]) for c in range(1, V) if c != self.sil),
                reverse=True,
            )
            fb_thresh = vals[fb - 1]

        for (words, node, last), h in self.hyps.items():
            score = self._score(h)
            ac = h.ac_score
            # ---- blank: stay ----
            lb = float(lp[self.blank])
            self._merge(
                next_hyps,
                LmHyp(words, node, last,
                      s=score + scale * lb, ns=NEG_INF,
                      ac_s=ac + lb, ac_ns=NEG_INF, lm=h.lm),
            )
            # ---- repeat of last symbol (absorbed, non-blank path) ----
            if last >= 0 and h.ns != NEG_INF:
                lc = float(lp[last])
                self._merge(
                    next_hyps,
                    LmHyp(words, node, last,
                          s=NEG_INF, ns=h.ns + scale * lc,
                          ac_s=NEG_INF, ac_ns=h.ac_ns + lc, lm=h.lm),
                )
            # ---- extend with a new (or blank-separated repeated) symbol ----
            for c in range(1, lp.shape[0]):
                lc = float(lp[c])
                if c != self.sil and lc < fb_thresh:
                    continue
                base = h.s if c == last else score            # ranking base
                ac_base = h.ac_s if c == last else ac
                if base == NEG_INF:
                    continue
                if c == self.sil:
                    # SIL at root = leading/extra silence (optional-sil arc)
                    if node == 0:
                        self._merge(
                            next_hyps,
                            LmHyp(words, 0, self.sil,
                                  s=NEG_INF, ns=base + scale * lc,
                                  ac_s=NEG_INF, ac_ns=ac_base + lc, lm=h.lm),
                        )
                    # SIL at a word-final node closes the word(s)
                    wlist = self._node_words(node)
                    ctx = self._lm_context(words)
                    for wid in wlist[: self.max_homophones]:
                        wlp = self.lm.logp(ctx, self.lexicon.words[wid])
                        lm_add = wlp + cfg.length_penalty
                        # swap this word's lookahead for its true LM score,
                        # re-enter the root lookahead for the next word
                        la_adj = float(self.la[0]) - float(self.la[node])
                        self._merge(
                            next_hyps,
                            LmHyp(words + (wid,), 0, self.sil,
                                  s=NEG_INF,
                                  ns=base + scale * lc + lm_add + la_adj,
                                  ac_s=NEG_INF, ac_ns=ac_base + lc,
                                  lm=h.lm + lm_add),
                        )
                else:
                    child = int(self.lexicon.next[node, c])
                    if child < 0:
                        continue
                    la_adj = float(self.la[child]) - float(self.la[node])
                    self._merge(
                        next_hyps,
                        LmHyp(words, child, c,
                              s=NEG_INF, ns=base + scale * lc + la_adj,
                              ac_s=NEG_INF, ac_ns=ac_base + lc, lm=h.lm),
                    )

        ranked = sorted(next_hyps.values(), key=self._score, reverse=True)
        keep = ranked[: self.config.beam_width]
        if keep and self.config.beam > 0:
            cutoff = self._score(keep[0]) - self.config.beam
            keep = [h for h in keep if self._score(h) >= cutoff]
        self.hyps = {(h.words, h.node, h.last): h for h in keep}

    def decode(self, log_probs: np.ndarray) -> None:
        """Advance over a (T, C) chunk of *log-probs* in model channel order
        ([BLANK, phones..., SIL]). Blank penalty + blank skipping applied here
        (parity: DecodeNumpy + CtcWfstBeamSearch::Search)."""
        cfg = self.config
        lp = np.asarray(log_probs, np.float64)
        if cfg.blank_penalty != 1.0:
            lp = lp.copy()
            lp[:, self.blank] -= math.log(cfg.blank_penalty)
        for t in range(lp.shape[0]):
            row = lp[t]
            if (
                cfg.ctc_blank_skip_threshold < 1.0
                and math.exp(row[self.blank]) > cfg.ctc_blank_skip_threshold
            ):
                self._pending_blank = True
                self.n_frames += 1
                continue
            if self._pending_blank:
                # re-insert one blank frame so repeated symbols stay separated
                blank_row = np.full_like(row, -30.0)
                blank_row[self.blank] = 0.0
                self._step(blank_row)
                self._pending_blank = False
            self._step(row)
            self.n_frames += 1
        self._finalized = None

    # ------------------------------------------------------------- results
    def decoded_something(self) -> bool:
        return self.n_frames > 0 and len(self.hyps) > 0

    def _close_final_words(self) -> List[LmHyp]:
        """End-of-utterance: close hyps at word-final nodes (trailing SIL is
        optional, as in L.fst), keep root hyps, add </s> LM score."""
        cfg = self.config
        out: Dict[Key, LmHyp] = {}
        for (words, node, last), h in self.hyps.items():
            candidates: List[LmHyp] = []
            if node == 0:
                candidates.append(h)
            else:
                ctx = self._lm_context(words)
                for wid in self._node_words(node)[: self.max_homophones]:
                    wlp = self.lm.logp(ctx, self.lexicon.words[wid]) + cfg.length_penalty
                    # same lookahead cancellation as in-search word closes, so
                    # final candidates all share the root-lookahead offset
                    adj = wlp + float(self.la[0]) - float(self.la[node])
                    candidates.append(
                        replace(h, words=words + (wid,), node=0,
                                s=(h.s + adj if h.s != NEG_INF else NEG_INF),
                                ns=(h.ns + adj if h.ns != NEG_INF else NEG_INF),
                                lm=h.lm + wlp)
                    )
            for cand in candidates:
                eos_lp = self.lm.logp(self._lm_context(cand.words), EOS)
                cand = replace(
                    cand,
                    s=(cand.s + eos_lp if cand.s != NEG_INF else NEG_INF),
                    ns=(cand.ns + eos_lp if cand.ns != NEG_INF else NEG_INF),
                    lm=cand.lm + eos_lp,
                )
                key = (cand.words, 0, cand.last)
                prev = out.get(key)
                if prev is None or self._score(cand) > self._score(prev):
                    out[key] = cand
        return sorted(out.values(), key=self._score, reverse=True)

    def finish_decoding(self) -> List[DecodeResult]:
        """Parity: FinishDecoding → FinalizeSearch n-best extraction.
        Duplicate sentences (same words, different alignment tail) keep only
        their best-scoring entry — matching the native/device searchers."""
        finals = self._close_final_words()
        self._finalized = []
        seen = set()
        for h in finals:
            if len(self._finalized) >= self.config.nbest:
                break
            if not h.words:
                continue
            sentence = " ".join(self.lexicon.words[w] for w in h.words)
            if sentence in seen:
                continue
            seen.add(sentence)
            self._finalized.append(
                DecodeResult(sentence=sentence, ac_score=h.ac_score, lm_score=h.lm)
            )
        return self._finalized

    def result(self) -> List[DecodeResult]:
        """Best-first results; partial (greedy word path) before finalize."""
        if self._finalized is not None:
            return self._finalized
        if not self.hyps:
            return []
        best = max(self.hyps.values(), key=self._score)
        return [
            DecodeResult(
                sentence=" ".join(self.lexicon.words[w] for w in best.words),
                ac_score=best.ac_score,
                lm_score=best.lm,
            )
        ]


def decode_numpy(
    searcher: LexiconBeamSearch, logits: np.ndarray, priors: Optional[np.ndarray] = None
) -> None:
    """Free-function mirror of lm_decoder.DecodeNumpy: log_softmax(logits) −
    priors, then advance the searcher (blank penalty handled in decode())."""
    x = np.asarray(logits, np.float64)
    x = x - x.max(axis=-1, keepdims=True)
    lp = x - np.log(np.exp(x).sum(axis=-1, keepdims=True))
    if priors is not None:
        lp = lp - priors
    searcher.decode(lp)
