"""Connectionist Temporal Classification loss in pure JAX.

Parity target: ``torch.nn.CTCLoss(blank=0, reduction='none', zero_infinity=False)``
as used at ``rnn_trainer.py:242,538-545``. Per-sample negative log-likelihoods
over the padded batch, with static shapes (targets padded to S_max, alphas over
the 2*S_max+1 extended label row) so the whole loss jits into one fused scan.

The forward recursion runs in log space over time via ``lax.scan``; gradients
come from JAX autodiff through the scan, which XLA turns into the standard
alpha-beta computation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite stand-in for -inf: keeps grads NaN-free through logaddexp


def _logaddexp3(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(m <= NEG_INF, NEG_INF, out)


def _ctc_setup(log_probs, targets, input_lengths, target_lengths, blank):
    B, T, C = log_probs.shape
    S = targets.shape[1]
    L = 2 * S + 1

    targets = targets.astype(jnp.int32)
    input_lengths = input_lengths.astype(jnp.int32)
    target_lengths = target_lengths.astype(jnp.int32)

    # Extended label row: [blank, y1, blank, y2, ..., yS, blank], shape (B, L).
    ext = jnp.full((B, L), blank, dtype=jnp.int32)
    ext = ext.at[:, 1::2].set(targets)

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    is_label = (pos % 2) == 1
    within = pos < (2 * target_lengths[:, None] + 1)

    # Skip transition s-2 → s allowed when z_s is a label differing from z_{s-2}.
    ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :L]
    skip_ok = is_label & (pos >= 2) & (ext != ext_m2)
    return ext, pos, within, skip_ok, input_lengths, target_lengths


def _select_emissions(log_probs: jax.Array, ext: jax.Array) -> jax.Array:
    """(B, T, C), (B, L) → (B, T, L) emissions lp[b, t, ext[b, s]].

    Hoisted OUT of the time scan as one one-hot contraction: a per-step
    take_along_axis costs ~28 ns per gathered element on the v5e (it was
    ~60% of the whole training step); the einsum runs on the MXU at
    precision=HIGHEST so log-probs keep f32 accuracy (default TPU matmul
    precision is bf16)."""
    C = log_probs.shape[2]
    onehot = jax.nn.one_hot(ext, C, dtype=log_probs.dtype)  # (B, L, C)
    return jnp.einsum(
        "btc,blc->btl", log_probs, onehot,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=log_probs.dtype,
    )


def _ctc_forward(log_probs, targets, input_lengths, target_lengths, blank,
                 keep_alphas: bool):
    B, T, C = log_probs.shape
    ext, pos, within, skip_ok, input_lengths, target_lengths = _ctc_setup(
        log_probs, targets, input_lengths, target_lengths, blank
    )
    L = ext.shape[1]
    emit_all = _select_emissions(log_probs, ext)                # (B, T, L)

    # Initial alpha: positions 0 (blank) and 1 (first label) at t=0 get log_probs.
    alpha0 = jnp.where((pos == 0) | ((pos == 1) & within), emit_all[:, 0],
                       NEG_INF)

    def step(alpha, lp_t):
        t, emit = lp_t
        a_prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :L]
        a_prev2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :L]
        a_prev2 = jnp.where(skip_ok, a_prev2, NEG_INF)
        new = _logaddexp3(alpha, a_prev1, a_prev2) + emit
        new = jnp.where(within, new, NEG_INF)
        # Freeze once past this sample's input length.
        active = (t < input_lengths)[:, None]
        new = jnp.where(active, new, alpha)
        return new, (new if keep_alphas else None)

    ts = jnp.arange(1, T, dtype=jnp.int32)
    alpha, alphas_rest = jax.lax.scan(
        step, alpha0, (ts, jnp.moveaxis(emit_all[:, 1:], 1, 0))
    )

    # Loss = -logadd(alpha[2*len], alpha[2*len-1]); handle len==0 (blank-only path).
    last = 2 * target_lengths
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(last - 1, 0)[:, None], axis=1
    )[:, 0]
    a_prev = jnp.where(target_lengths > 0, a_prev, NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    m_safe = jnp.maximum(m, NEG_INF)
    total = m_safe + jnp.log(jnp.exp(a_last - m_safe) + jnp.exp(a_prev - m_safe))
    total = jnp.where(m <= NEG_INF, NEG_INF, total)

    alphas = None
    if keep_alphas:
        alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)  # (T, B, L)
    return -total, total, alphas, ext, within, skip_ok, input_lengths, target_lengths


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_loss_vjp(log_probs, targets, input_lengths, target_lengths, blank):
    losses, *_ = _ctc_forward(
        log_probs, targets, input_lengths, target_lengths, blank, False
    )
    return losses


def _ctc_vjp_fwd(log_probs, targets, input_lengths, target_lengths, blank):
    losses, total, alphas, ext, within, skip_ok, il, tl = _ctc_forward(
        log_probs, targets, input_lengths, target_lengths, blank, True
    )
    return losses, (log_probs, total, alphas, ext, within, skip_ok, il, tl)


def _ctc_vjp_bwd(blank, res, g):
    """Analytic gradient via the beta (backward) recursion:
    d(-log p)/d lp[t,k] = -Σ_{s: ext[s]=k} exp(alpha_t(s) + beta_t(s) − log p),
    with beta defined excluding the emission at t. One backward scan instead
    of autodiff replaying the forward (the CTC term was ~40% of the train
    step; this halves it)."""
    log_probs, total, alphas, ext, within, skip_ok, il, tl = res
    B, T, C = log_probs.shape
    L = ext.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    # beta init at t = len-1: positions 2*len and 2*len-1 get 0.
    end = 2 * tl
    init_beta = jnp.where(
        (pos == end[:, None]) | ((pos == end[:, None] - 1) & (tl[:, None] > 0)),
        0.0, NEG_INF,
    )
    # mask for s → s+2 backward transitions: allowed iff skip_ok at s+2
    skip_shift = jnp.pad(skip_ok, ((0, 0), (0, 2)))[:, 2:]

    # valid posterior only when the alignment is feasible; the 1/p factor is
    # already inside exp(alpha + beta - total)
    ok = total > NEG_INF / 2
    scale = jnp.where(ok, g, 0.0)

    emit_all = _select_emissions(log_probs, ext)      # (B, T, L)
    lp_tm = jnp.moveaxis(emit_all, 1, 0)              # (T, B, L)

    def step(beta_next, inputs):
        t, emit_t1, alpha_t = inputs
        # q = beta_{t+1} + emit_{t+1}; emit_t1 is the emission row at t+1
        # (dummy at T-1, masked by the is_last init)
        q = beta_next + emit_t1
        q1 = jnp.pad(q, ((0, 0), (0, 1)), constant_values=NEG_INF)[:, 1:]
        q2 = jnp.pad(q, ((0, 0), (0, 2)), constant_values=NEG_INF)[:, 2:]
        q2 = jnp.where(skip_shift, q2, NEG_INF)
        rec = _logaddexp3(q, q1, q2)
        is_last = (t == il - 1)[:, None]
        before = (t < il - 1)[:, None]
        beta = jnp.where(is_last, init_beta, jnp.where(before, rec, NEG_INF))
        beta = jnp.where(within, beta, NEG_INF)

        # posterior weight over extended-label positions (projected to class
        # space AFTER the scan — a per-step scatter serializes on TPU)
        w = jnp.exp(jnp.clip(alpha_t + beta - total[:, None], NEG_INF, 0.0))
        w = jnp.where(within & ((t < il)[:, None]), w, 0.0)
        return beta, w

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    # lp at t+1 for each t (dummy row at the end; masked by is_last init)
    lp_next = jnp.concatenate([lp_tm[1:], lp_tm[-1:]], axis=0)
    beta_init = jnp.full((B, L), NEG_INF)
    _, w_rev = jax.lax.scan(
        step, beta_init,
        (ts, lp_next[::-1], jnp.flip(alphas, axis=0)),
    )
    w_all = jnp.moveaxis(w_rev[::-1], 0, 1)  # (B, T, L)
    onehot = jax.nn.one_hot(ext, C, dtype=log_probs.dtype)  # (B, L, C)
    d_lp = -jnp.einsum(
        "btl,blc->btc", w_all, onehot,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=log_probs.dtype,
    ) * scale[:, None, None]
    return d_lp, None, None, None


_ctc_loss_vjp.defvjp(_ctc_vjp_fwd, _ctc_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("blank",))
def ctc_loss(
    log_probs: jax.Array,
    targets: jax.Array,
    input_lengths: jax.Array,
    target_lengths: jax.Array,
    blank: int = 0,
) -> jax.Array:
    """Per-sample CTC negative log-likelihood.

    Args:
      log_probs: (B, T, C) log-softmax outputs.
      targets: (B, S) int labels, padded arbitrarily past target_lengths.
      input_lengths: (B,) valid time steps per sample.
      target_lengths: (B,) valid labels per sample.
      blank: blank id (reference uses 0).

    Returns (B,) losses. Impossible alignments (input too short) yield +inf-like
    large values, matching torch with zero_infinity=False. Gradients come from
    the analytic alpha-beta recursion (custom VJP).
    """
    return _ctc_loss_vjp(log_probs, targets, input_lengths, target_lengths, blank)


def ctc_loss_from_logits(
    logits: jax.Array,
    targets: jax.Array,
    input_lengths: jax.Array,
    target_lengths: jax.Array,
    blank: int = 0,
) -> jax.Array:
    """Convenience wrapper matching the trainer call pattern
    (log_softmax over classes, then CTC) — rnn_trainer.py:538-545."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return ctc_loss(log_probs, targets, input_lengths, target_lengths, blank=blank)


@jax.jit
def greedy_decode_ids(logits: jax.Array, input_lengths: jax.Array) -> jax.Array:
    """Per-frame argmax ids, with frames past input_length forced to blank (0).

    Collapse/blank-removal (unique_consecutive) happens host-side via
    ``utils.phonemes.greedy_collapse`` — parity with rnn_trainer.py:724-728.
    """
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    B, T = ids.shape
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    return jnp.where(t_idx < input_lengths[:, None], ids, 0)


def batched_greedy_collapse(ids, input_lengths) -> list:
    """Host-side: collapse repeats + drop blanks for each row of (B, T) ids."""
    import numpy as np

    from ..utils.phonemes import greedy_collapse

    ids = np.asarray(ids)
    lens = np.asarray(input_lengths)
    return [greedy_collapse(ids[i, : lens[i]]) for i in range(ids.shape[0])]
