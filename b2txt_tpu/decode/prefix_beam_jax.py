"""Vectorized CTC prefix beam search — TPU-resident.

The re-architecture of the reference's pointer-chasing C++ searchers
(ctc_prefix_beam_search.cc, and the search layer of ctc_wfst_beam_search.cc):
instead of hash maps of prefix vectors, the beam is a fixed-width set of K
hypotheses held in device arrays:

    s, ns     (K,)  blank-/non-blank-ending log scores
    h1, h2    (K,)  64 bits of rolling prefix hash (dedupe identity)
    last      (K,)  last emitted symbol

Each frame expands K×V candidates (stay + extend-with-c), lexicographically
sorts them by hash (lax.sort, num_keys=2), merges duplicate prefixes with a
segmented log-sum-exp (lax.associative_scan), and keeps the top-K. Everything
is sort/top_k/gather — native TPU ops — and the whole time loop is one
lax.scan, so a full utterance decodes in a single device program.
Backpointers (parent beam, emitted symbol) stream out of the scan for O(T·K)
host-side sequence reconstruction.

Equivalent first-beam pruning (top symbols per frame) is applied by masking
log-probs outside the top ``first_beam_size`` to -inf, which drops the same
candidates the reference's topk loop skips.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1.0e30


def _mix(h: jax.Array, c: jax.Array, seed: int) -> jax.Array:
    """One xorshift-multiply avalanche round combining hash h with symbol c."""
    x = h ^ (c.astype(jnp.uint32) * jnp.uint32(seed))
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG)
    out = m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe))
    return jnp.where(m <= NEG, NEG, out)


def _segmented_logsumexp(values: jax.Array, starts: jax.Array) -> jax.Array:
    """Inclusive segmented log-sum-exp along axis 0; segment totals land on
    each segment's last element."""

    def op(a, b):
        va, fa = a
        vb, fb = b
        v = jnp.where(fb, vb, _logaddexp(va, vb))
        return v, fa | fb

    out, _ = jax.lax.associative_scan(op, (values, starts))
    return out


class BeamState(NamedTuple):
    s: jax.Array      # (K,)
    ns: jax.Array     # (K,)
    h1: jax.Array     # (K,) uint32
    h2: jax.Array     # (K,) uint32
    last: jax.Array   # (K,) int32, -1 for empty prefix


def init_state(beam_width: int) -> BeamState:
    k = jnp.arange(beam_width, dtype=jnp.uint32)
    return BeamState(
        s=jnp.where(jnp.arange(beam_width) == 0, 0.0, NEG).astype(jnp.float32),
        ns=jnp.full((beam_width,), NEG, jnp.float32),
        # Distinct sentinel hashes for unused slots so they never merge with
        # real prefixes; slot 0 (the empty prefix) hashes to a fixed seed pair.
        h1=jnp.where(k == 0, jnp.uint32(0x12345678), jnp.uint32(0x80000000) | k),
        h2=jnp.where(k == 0, jnp.uint32(0x9ABCDEF0), jnp.uint32(0x40000000) | k),
        last=jnp.full((beam_width,), -1, jnp.int32),
    )


def _expand_step(
    state: BeamState,
    lp: jax.Array,
    blank: int,
    lm_bonus: Optional[jax.Array] = None,
) -> Tuple[BeamState, jax.Array, jax.Array]:
    """One frame of beam expansion. lp: (V,) masked log-probs.

    lm_bonus, if given, is a (K, V) additive shallow-fusion score applied to
    extend-candidates (used by the n-gram fused searcher).

    Returns (new_state, parents (K,), syms (K,)).
    """
    K = state.s.shape[0]
    V = lp.shape[0]
    score = _logaddexp(state.s, state.ns)

    # --- stay candidates: same prefix -----------------------------------
    lp_last = jnp.where(
        state.last >= 0, lp[jnp.clip(state.last, 0, V - 1)], NEG
    )
    stay_s = score + lp[blank]
    stay_ns = jnp.where(state.last >= 0, state.ns + lp_last, NEG)
    stay = dict(
        h1=state.h1, h2=state.h2,
        s=stay_s, ns=stay_ns, last=state.last,
        parent=jnp.arange(K, dtype=jnp.int32),
        sym=jnp.full((K,), -1, jnp.int32),
    )

    # --- extend candidates: prefix + c for every non-blank symbol -------
    syms = jnp.arange(V, dtype=jnp.int32)
    nonblank = syms != blank
    c = jnp.broadcast_to(syms[None, :], (K, V))
    is_repeat = c == state.last[:, None]
    base = jnp.where(is_repeat, state.s[:, None], score[:, None])
    ext_ns = base + lp[None, :]
    if lm_bonus is not None:
        ext_ns = ext_ns + lm_bonus
    ext_ns = jnp.where(nonblank[None, :], ext_ns, NEG)
    ext = dict(
        h1=_mix(state.h1[:, None], c, 0x9E3779B9),
        h2=_mix(state.h2[:, None], c, 0x7F4A7C15),
        s=jnp.full((K, V), NEG, jnp.float32),
        ns=ext_ns,
        last=c,
        parent=jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, V)),
        sym=jnp.where(nonblank[None, :], c, -1),
    )

    cand = {
        k: jnp.concatenate([stay[k], ext[k].reshape(-1)], axis=0)
        for k in stay
    }

    # --- dedupe: sort by (h1, h2), segmented log-sum-exp merge ----------
    # narrow 3-operand sort + gathers (cheap to compile/run on TPU)
    N = cand["h1"].shape[0]
    h1s, h2s, perm = jax.lax.sort(
        (cand["h1"], cand["h2"], jnp.arange(N, dtype=jnp.int32)), num_keys=2
    )
    ss = cand["s"][perm]
    nss = cand["ns"][perm]
    lasts = cand["last"][perm]
    parents = cand["parent"][perm]
    symss = cand["sym"][perm]
    starts = jnp.concatenate(
        [jnp.ones((1,), bool),
         (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
    )
    s_tot = _segmented_logsumexp(ss, starts)
    ns_tot = _segmented_logsumexp(nss, starts)
    seg_end = jnp.concatenate([starts[1:], jnp.ones((1,), bool)])
    total = jnp.where(seg_end, _logaddexp(s_tot, ns_tot), -jnp.inf)

    top_total, top_idx = jax.lax.top_k(total, K)
    new_state = BeamState(
        s=jnp.where(top_total > -jnp.inf, s_tot[top_idx], NEG),
        ns=jnp.where(top_total > -jnp.inf, ns_tot[top_idx], NEG),
        h1=h1s[top_idx],
        h2=h2s[top_idx],
        last=lasts[top_idx],
    )
    return new_state, parents[top_idx], symss[top_idx]


@functools.partial(
    jax.jit, static_argnames=("beam_width", "blank", "first_beam_size")
)
def beam_search_scan(
    log_probs: jax.Array,
    input_length: jax.Array,
    beam_width: int = 64,
    blank: int = 0,
    first_beam_size: Optional[int] = None,
):
    """Run the full search over (T, V) log-probs; frames past input_length are
    frozen. Returns (final BeamState, parents (T, K), syms (T, K))."""
    T, V = log_probs.shape
    state0 = init_state(beam_width)

    def step(state, tl):
        t, lp = tl
        if first_beam_size is not None and first_beam_size < V:
            kth = jax.lax.top_k(lp, first_beam_size)[0][-1]
            lp = jnp.where(lp >= kth, lp, -jnp.inf)
        new_state, parents, syms = _expand_step(state, lp, blank)
        active = t < input_length
        keep = lambda n, o: jnp.where(active, n, o)
        state = BeamState(*(keep(n, o) for n, o in zip(new_state, state)))
        parents = jnp.where(active, parents, jnp.arange(beam_width, dtype=jnp.int32))
        syms = jnp.where(active, syms, -1)
        return state, (parents, syms)

    ts = jnp.arange(T, dtype=jnp.int32)
    state, (parents, syms) = jax.lax.scan(step, state0, (ts, log_probs))
    return state, parents, syms


def backtrace(parents: np.ndarray, syms: np.ndarray, beam: int) -> List[int]:
    """Reconstruct the symbol sequence of ``beam`` from the backpointer arrays."""
    seq: List[int] = []
    k = beam
    for t in range(parents.shape[0] - 1, -1, -1):
        if syms[t, k] >= 0:
            seq.append(int(syms[t, k]))
        k = int(parents[t, k])
    seq.reverse()
    return seq


def ctc_prefix_beam_search_jax(
    log_probs: np.ndarray,
    input_length: Optional[int] = None,
    beam_width: int = 64,
    blank: int = 0,
    first_beam_size: Optional[int] = None,
    nbest: int = 10,
) -> List[Tuple[List[int], float]]:
    """One-shot decode of a (T, V) utterance → [(ids, log_prob)] best-first."""
    T = log_probs.shape[0]
    if input_length is None:
        input_length = T
    state, parents, syms = beam_search_scan(
        jnp.asarray(log_probs, jnp.float32),
        jnp.asarray(input_length, jnp.int32),
        beam_width=beam_width, blank=blank, first_beam_size=first_beam_size,
    )
    s = np.asarray(state.s)
    ns = np.asarray(state.ns)
    score = np.logaddexp(
        np.where(s <= NEG, -np.inf, s), np.where(ns <= NEG, -np.inf, ns)
    )
    parents = np.asarray(parents)
    syms = np.asarray(syms)
    order = np.argsort(-score)[:nbest]
    return [
        (backtrace(parents, syms, int(k)), float(score[k]))
        for k in order
        if np.isfinite(score[k])
    ]
