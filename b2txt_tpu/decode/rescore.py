"""N-best rescoring: word-swap augmentation, unpruned n-gram rescoring, and
LLM rescoring with the α-blended total score.

Parity targets in ``language_model/language-model-standalone.py``:
  * get_string_differences (:273-310) — word-level alignment with backtrace
  * augment_nbest (:327-411) — swap differing words between equal-length
    candidate pairs, score = mean − penalty_percent·|mean|
  * Rescore (brain_speech_decoder.cc:61-101) — lattice −pruned+unpruned G
    rescoring, realized here as n-best rescoring against the unpruned n-gram
  * rescore_with_gpt2 / gpt2_lm_decode (:127-251) — token-logprob sums minus
    length penalty, total = acoustic_scale·ac + (1−α)·ngram + α·llm, optional
    context prefix and softmax confidence

The LLM backend is pluggable: a torch/transformers causal LM (the reference's
OPT-6.7b path, CPU/GPU), or any object with ``score(texts) → List[float]``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Protocol, Sequence, Tuple

import numpy as np

from ..lm.ngram import NGramLM
from .lmbeam import DecodeResult


def get_string_differences(cue: str, decoder_output: str):
    """Word-level minimum-edit alignment of decoder_output against cue.

    Returns (cost, path, indices_to_highlight) with path entries 'I'/'D'/'R'
    or the matched word index — same contract and tie-breaking
    (insertion ≼ deletion ≼ substitution) as the reference (:273-310), but an
    iterative DP instead of the memoized recursion (the recursive path
    concatenation is quadratic and dominated finalize profiles).
    """
    h = decoder_output.split()  # rows
    r = cue.split()             # columns
    I, J = len(h), len(r)

    dp = np.empty((I + 1, J + 1), dtype=np.int32)
    dp[0, :] = np.arange(J + 1)
    dp[:, 0] = np.arange(I + 1)
    for i in range(1, I + 1):
        row = dp[i]
        prev = dp[i - 1]
        hi = h[i - 1]
        for j in range(1, J + 1):
            if hi == r[j - 1]:
                row[j] = prev[j - 1]
            else:
                row[j] = 1 + min(row[j - 1], prev[j], prev[j - 1])

    cost = int(dp[I, J])
    # Forward path reconstruction == the recursion's choice order: at (i, j)
    # the recursion prefers match, then insertion (j-1), deletion (i-1),
    # substitution (i-1, j-1) — walk backward applying the same preferences.
    rev = []
    i, j = I, J
    while i > 0 or j > 0:
        if i > 0 and j > 0 and h[i - 1] == r[j - 1] and dp[i, j] == dp[i - 1, j - 1]:
            rev.append(i - 1)
            i -= 1
            j -= 1
            continue
        ins_c = dp[i, j - 1] if j > 0 else np.iinfo(np.int32).max
        del_c = dp[i - 1, j] if i > 0 else np.iinfo(np.int32).max
        sub_c = dp[i - 1, j - 1] if (i > 0 and j > 0) else np.iinfo(np.int32).max
        if ins_c <= del_c and ins_c <= sub_c:
            rev.append("I")
            j -= 1
        elif del_c <= ins_c and del_c <= sub_c:
            rev.append("D")
            i -= 1
        else:
            rev.append("R")
            i -= 1
            j -= 1
    path = [p for p in reversed(rev) if p != "I"]

    indices = []
    cur = 0
    for label, word in zip(path, h):
        if label in ("R", "D"):
            indices.append((cur, cur + len(word)))
        cur += len(word) + 1
    return cost, list(path), indices


NBest = List[Tuple[str, float, float]]  # (sentence, ac_score, lm_score)


def results_to_nbest(results: Sequence[DecodeResult]) -> NBest:
    return [(r.sentence, r.ac_score, r.lm_score) for r in results]


def augment_nbest(
    nbest: NBest,
    top_candidates_to_augment: int = 20,
    acoustic_scale: float = 0.3,
    score_penalty_percent: float = 0.01,
) -> NBest:
    """Generate extra candidates by swapping substituted words between
    equal-length candidate pairs (reference :327-411)."""
    sentences = [s.strip() for s, _, _ in nbest]
    ac = [a for _, a, _ in nbest]
    lm = [l for _, _, l in nbest]
    total = [acoustic_scale * a + l for _, a, l in nbest]

    order = np.argsort(total)[::-1]
    sentences = [sentences[i] for i in order]
    ac = [ac[i] for i in order]
    lm = [lm[i] for i in order]
    total = [total[i] for i in order]

    new_s: List[str] = []
    new_ac: List[float] = []
    new_lm: List[float] = []
    new_total: List[float] = []

    top = top_candidates_to_augment
    for i1 in range(min(len(sentences) - 1, top)):
        w1 = sentences[i1].split()
        for i2 in range(i1 + 1, min(len(sentences), top)):
            w2 = sentences[i2].split()
            if len(w1) != len(w2):
                continue
            _, path1, _ = get_string_differences(sentences[i1], sentences[i2])
            _, path2, _ = get_string_differences(sentences[i2], sentences[i1])
            r1 = [i for i, p in enumerate(path2) if p == "R"]
            r2 = [i for i, p in enumerate(path1) if p == "R"]
            for a, b in zip(r1, r2):
                for nw1, nw2 in (
                    (w1[:a] + [w2[b]] + w1[a + 1:], None),
                    (None, w2[:b] + [w1[a]] + w2[b + 1:]),
                ):
                    cand = " ".join(nw1 if nw1 is not None else nw2)
                    if cand in sentences or cand in new_s:
                        continue
                    mean_ac = float(np.mean([ac[i1], ac[i2]]))
                    mean_lm = float(np.mean([lm[i1], lm[i2]]))
                    pa = mean_ac - score_penalty_percent * abs(mean_ac)
                    pl = mean_lm - score_penalty_percent * abs(mean_lm)
                    new_s.append(cand)
                    new_ac.append(pa)
                    new_lm.append(pl)
                    new_total.append(acoustic_scale * pa + pl)

    sentences += new_s
    ac += new_ac
    lm += new_lm
    total += new_total
    order = np.argsort(total)[::-1]
    return [(sentences[i], ac[i], lm[i]) for i in order]


def rescore_nbest_with_ngram(nbest: NBest, lm: NGramLM) -> NBest:
    """Replace each candidate's n-gram score with the unpruned model's full
    sentence log-probability — the n-best analogue of the reference's lattice
    −G_pruned +G_unpruned rescore (brain_speech_decoder.cc:61-101)."""
    out = []
    for sentence, ac_score, _ in nbest:
        words = sentence.strip().split()
        out.append((sentence, ac_score, lm.sentence_logp(words)))
    return out


class LLMScorer(Protocol):
    def score(self, texts: Sequence[str], length_penalty: float = 0.0) -> List[float]:
        ...


class TorchCausalLMRescorer:
    """transformers causal-LM rescorer (the reference's OPT path, :92-161).

    Works with any AutoModelForCausalLM id; fp16 on CUDA, fp32 on CPU.
    """

    def __init__(
        self,
        model_name: str = "facebook/opt-6.7b",
        cache_dir: Optional[str] = None,
        device: Optional[str] = None,
        model=None,
        tokenizer=None,
    ):
        """Load by hub id, or pass instantiated (model, tokenizer) — the
        offline path (no downloads) used by tests and custom deployments."""
        import torch

        self.torch = torch
        self.device = device or ("cuda" if torch.cuda.is_available() else "cpu")
        if model is not None and tokenizer is not None:
            self.model = model
            self.tokenizer = tokenizer
        else:
            from transformers import AutoModelForCausalLM, AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(
                model_name, cache_dir=cache_dir
            )
            self.model = AutoModelForCausalLM.from_pretrained(
                model_name,
                cache_dir=cache_dir,
                torch_dtype=torch.float16 if self.device != "cpu" else torch.float32,
            )
        if self.device != "cpu":
            self.model = self.model.to(self.device)
        self.model.eval()
        self.tokenizer.padding_side = "right"
        if self.tokenizer.pad_token is None:
            self.tokenizer.pad_token = self.tokenizer.eos_token

    def score(self, texts: Sequence[str], length_penalty: float = 0.0) -> List[float]:
        torch = self.torch
        with torch.inference_mode():
            inputs = self.tokenizer(list(texts), return_tensors="pt", padding=True)
            inputs = {k: v.to(self.device) for k, v in inputs.items()}
            logits = self.model(**inputs).logits
            log_probs = torch.nn.functional.log_softmax(logits.float(), dim=-1)
            ids = inputs["input_ids"]
            mask = inputs["attention_mask"]
            tok_lp = torch.gather(
                log_probs[:, :-1], 2, ids[:, 1:, None]
            ).squeeze(-1)
            tok_lp = tok_lp * mask[:, 1:]
            sums = tok_lp.sum(dim=1)
            n_tokens = mask.sum(dim=1)
            return (sums - n_tokens * length_penalty).cpu().tolist()


class NGramLLMAdapter:
    """Test/offline stand-in: any NGramLM behind the LLMScorer protocol."""

    def __init__(self, lm: NGramLM):
        self.lm = lm

    def score(self, texts: Sequence[str], length_penalty: float = 0.0) -> List[float]:
        out = []
        for t in texts:
            words = t.lower().split()
            out.append(self.lm.sentence_logp(words) - len(words) * length_penalty)
        return out


@dataclass
class RescoreOutput:
    best: str
    nbest: List[Tuple[str, float, float, float, float]]  # s, ac, ngram, llm, total
    confidence: Optional[float] = None


def _clean_text(t: str) -> str:
    return (
        t.replace(">", "").replace("  ", " ").replace(" ,", ",")
        .replace(" .", ".").replace(" ?", "?")
    )


def _prep_hyps(nbest: NBest, context: Optional[str]):
    """Drop empty candidates, prepend context, clean text (gpt2_lm_decode
    :165-199). Returns (hyps to score, kept rows, ac scores, ngram scores)."""
    hyps: List[str] = []
    ac: List[float] = []
    ngram: List[float] = []
    kept: List[Tuple[str, float, float]] = []
    for s, a, l in nbest:
        hyp = s.strip()
        if not hyp:
            continue
        if context and context.split():
            hyp = context + " " + hyp
        hyps.append(_clean_text(hyp))
        ac.append(a)
        ngram.append(l)
        kept.append((s, a, l))
    return hyps, kept, ac, ngram


def _split_context(scorer: LLMScorer, context: Optional[str]):
    """Scorers advertising ``supports_context`` (the JAX OPT rescorer's
    prefix-KV path) take the shared context separately and run its forward
    ONCE instead of once per candidate. Cleaning context and hypothesis
    separately equals cleaning the concatenation: the joiner is a single
    space and decoder hypotheses start with word characters, so no replace
    pattern spans the boundary."""
    if (context and context.split()
            and getattr(scorer, "supports_context", False)):
        return _clean_text(context), None
    return None, context


def _call_score(scorer: LLMScorer, hyps: List[str], length_penalty: float,
                ctx: Optional[str]) -> List[float]:
    if ctx is not None:
        return scorer.score(hyps, length_penalty, context=ctx)
    return scorer.score(hyps, length_penalty)


def _fallback_scores(
    scorer: LLMScorer, hyps: List[str], length_penalty: float,
    batch_fallback: int, err: Exception, ctx: Optional[str] = None,
) -> np.ndarray:
    """Batched retry then zeros (reference :214-226)."""
    logging.error(f"Error during LLM rescore: {err}")
    try:
        llm_scores: List[float] = []
        step = int(np.ceil(len(hyps) / batch_fallback))
        for i in range(0, len(hyps), step):
            llm_scores.extend(
                _call_score(scorer, hyps[i : i + step], length_penalty, ctx))
        arr = np.asarray(llm_scores)
        if not np.all(np.isfinite(arr)):
            raise FloatingPointError("non-finite LLM scores")
        return arr
    except Exception as e2:
        logging.error(f"Error during LLM rescore: {e2}")
        return np.zeros(len(hyps))


def _blend(
    kept: List[Tuple[str, float, float]],
    ac: List[float],
    ngram: List[float],
    llm_scores: np.ndarray,
    acoustic_scale: float,
    alpha: float,
) -> RescoreOutput:
    """total = acoustic_scale·ac + (1−α)·ngram + α·llm (:231-251)."""
    ac_arr = np.asarray(ac)
    ngram_arr = np.asarray(ngram)
    totals = acoustic_scale * ac_arr + (1 - alpha) * ngram_arr + alpha * llm_scores
    best_idx = int(np.argmax(totals))

    out_rows = [
        (kept[i][0], float(ac_arr[i]), float(ngram_arr[i]),
         float(llm_scores[i]), float(totals[i]))
        for i in range(len(kept))
    ]
    shifted = totals - totals.max()
    probs = np.exp(shifted)
    conf = float(probs[best_idx] / probs.sum())
    return RescoreOutput(best=kept[best_idx][0].strip(), nbest=out_rows, confidence=conf)


def llm_rescore(
    scorer: LLMScorer,
    nbest: NBest,
    acoustic_scale: float,
    alpha: float,
    length_penalty: float = 0.0,
    context: Optional[str] = None,
    batch_fallback: int = 5,
) -> RescoreOutput:
    """α-blend LLM rescoring of an n-best list (gpt2_lm_decode parity,
    :165-251): total = acoustic_scale·ac + (1−α)·ngram + α·llm.

    Exactly :func:`llm_rescore_async` fetched immediately (one code path
    for the failure semantics — finite guard, batched retry, zeros)."""
    return llm_rescore_async(scorer, nbest, acoustic_scale, alpha,
                             length_penalty=length_penalty, context=context,
                             batch_fallback=batch_fallback)()


def _begin_async(scorer: LLMScorer, hyps: List[str], length_penalty: float,
                 ctx: Optional[str]):
    """Dispatch via ``score_async`` when the scorer has it; returns the fetch
    thunk, or None (no async support / dispatch failed → sync path)."""
    begin = getattr(scorer, "score_async", None)
    if begin is None:
        return None
    try:
        if ctx is not None:
            return begin(hyps, length_penalty, context=ctx)
        return begin(hyps, length_penalty)
    except Exception as e:  # dispatch failure → sync fallback in finish
        logging.error(f"Error dispatching LLM rescore: {e}")
        return None


def _fetch_scores(scorer: LLMScorer, hyps: List[str], length_penalty: float,
                  ctx: Optional[str], fetch) -> np.ndarray:
    """Fetch dispatched scores (or score synchronously) with the finite
    guard; raises so callers apply :func:`_fallback_scores`."""
    if fetch is None:
        scores = np.asarray(_call_score(scorer, hyps, length_penalty, ctx))
    else:
        scores = np.asarray(fetch())
    if not np.all(np.isfinite(scores)):
        raise FloatingPointError("non-finite LLM scores")
    return scores


def llm_rescore_async(
    scorer: LLMScorer,
    nbest: NBest,
    acoustic_scale: float,
    alpha: float,
    length_penalty: float = 0.0,
    context: Optional[str] = None,
    batch_fallback: int = 5,
):
    """Begin an LLM rescore; returns a zero-arg callable producing the
    RescoreOutput.

    With a scorer exposing ``score_async`` (the JAX OPT rescorer), the device
    forward is DISPATCHED now and fetched inside the returned thunk — so the
    caller can overlap the next utterance's host work (unpruned rescore,
    augment_nbest, token packing) under this utterance's 6.7b forward.
    Scorers without ``score_async`` fall back to a thunk that runs the
    synchronous :func:`llm_rescore` path. Identical outputs and failure
    semantics (finite-guard, batched retry, zeros) either way.
    """
    ctx, prepend = _split_context(scorer, context)
    hyps, kept, ac, ngram = _prep_hyps(nbest, prepend)
    if not hyps:
        return lambda: RescoreOutput(best="", nbest=[], confidence=0.0)

    fetch = _begin_async(scorer, hyps, length_penalty, ctx)

    def finish() -> RescoreOutput:
        try:
            llm_scores = _fetch_scores(scorer, hyps, length_penalty, ctx,
                                       fetch)
        except Exception as e:
            llm_scores = _fallback_scores(scorer, hyps, length_penalty,
                                          batch_fallback, e, ctx)
        return _blend(kept, ac, ngram, llm_scores, acoustic_scale, alpha)

    return finish


def llm_rescore_group_async(
    scorer: LLMScorer,
    nbests: Sequence[NBest],
    acoustic_scale: float,
    alpha: float,
    length_penalty: float = 0.0,
    context: Optional[str] = None,
    batch_fallback: int = 5,
) -> List:
    """Group-dispatch the LLM rescore of SEVERAL utterances' n-best lists in
    ONE scorer call; returns one zero-arg finish thunk per utterance, each
    producing that utterance's RescoreOutput.

    Per-utterance outputs are IDENTICAL to :func:`llm_rescore_async` — the
    packed OPT scorer (opt_lm.score_packed_fn) scores independent segments
    under block-diagonal attention, so which call a hypothesis rides in
    cannot change its score. What grouping changes is economics: one 6.7b
    forward must stream all ~13.4 GB of bf16 weights from HBM (~16 ms floor
    on a v5e) and one remote dispatch pays the tunnel RPC once — at ~10-30
    candidates per utterance a per-utterance call is weight-stream-bound,
    while a ~100-candidate group runs near the forward's compute roofline
    (the reference pays this cost per candidate BATCH too, standalone
    :127-161, but on a dedicated second GPU).

    ``context`` (if any) must be SHARED by every utterance in the group —
    the batched-eval path has none; conversational decoding (per-utterance
    context) must use :func:`llm_rescore_async`. Failure semantics per
    utterance match llm_rescore_async: a group-fetch failure falls back to
    per-utterance batched retry then zeros.
    """
    ctx, prepend = _split_context(scorer, context)
    preps = [_prep_hyps(nb, prepend) for nb in nbests]
    all_hyps: List[str] = [h for hyps, _, _, _ in preps for h in hyps]
    offsets = []
    lo = 0
    for hyps, _, _, _ in preps:
        offsets.append((lo, lo + len(hyps)))
        lo += len(hyps)

    fetch = (_begin_async(scorer, all_hyps, length_penalty, ctx)
             if all_hyps else None)

    shared: dict = {}

    def group_scores() -> np.ndarray:
        """Fetch (once) the whole group's scores; raises on failure — and
        keeps raising for later thunks without re-fetching."""
        if "err" in shared:
            raise shared["err"]
        if "scores" not in shared:
            try:
                shared["scores"] = _fetch_scores(
                    scorer, all_hyps, length_penalty, ctx, fetch)
            except Exception as e:
                shared["err"] = e
                raise
        return shared["scores"]

    def make_finish(i: int):
        hyps, kept, ac, ngram = preps[i]
        lo, hi = offsets[i]

        def finish() -> RescoreOutput:
            if not hyps:
                return RescoreOutput(best="", nbest=[], confidence=0.0)
            try:
                llm_scores = group_scores()[lo:hi]
            except Exception as e:
                llm_scores = _fallback_scores(scorer, hyps, length_penalty,
                                              batch_fallback, e, ctx)
            return _blend(kept, ac, ngram, llm_scores, acoustic_scale, alpha)

        return finish

    return [make_finish(i) for i in range(len(preps))]
