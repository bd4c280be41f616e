"""Error-rate metrics: Levenshtein edit distance, PER/WER aggregation with
bootstrap confidence intervals.

Parity targets: ``nejm_b2txt_utils/general_utils.py:78-156`` (calculate_error_rate,
calculate_aggregate_error_rate) and the torchaudio edit_distance used at
``rnn_trainer.py:734``. Unlike the reference's uint8 DP table (which silently
overflows past 254 edits), we use int32.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance between two sequences (two-row DP, O(len(ref)*len(hyp)))."""
    r, h = list(ref), list(hyp)
    if not r:
        return len(h)
    if not h:
        return len(r)
    prev = np.arange(len(h) + 1, dtype=np.int32)
    cur = np.zeros(len(h) + 1, dtype=np.int32)
    for i in range(1, len(r) + 1):
        cur[0] = i
        for j in range(1, len(h) + 1):
            sub = prev[j - 1] + (r[i - 1] != h[j - 1])
            cur[j] = min(sub, prev[j] + 1, cur[j - 1] + 1)
        prev, cur = cur, prev
    return int(prev[len(h)])


# Reference-compatible alias (general_utils.py:78-120 returns the raw count).
calculate_error_rate = edit_distance


def calculate_aggregate_error_rate(
    refs: Sequence[Sequence],
    hyps: Sequence[Sequence],
    n_resamples: int = 10000,
    seed: int | None = None,
) -> Tuple[float, float, float, List[float]]:
    """Aggregate error rate = sum(errors)/sum(lengths), with a bootstrap 95% CI.

    Returns (aggregate_rate, ci_low, ci_high, per_item_rates) — same tuple shape
    as general_utils.py:124-156.
    """
    err_count = []
    item_count = []
    per_item = []
    for r, h in zip(refs, hyps):
        n_err = edit_distance(r, h)
        err_count.append(n_err)
        item_count.append(len(r))
        per_item.append(n_err / len(r) if len(r) else 0.0)

    err = np.asarray(err_count, dtype=np.float64)
    cnt = np.asarray(item_count, dtype=np.float64)
    agg = float(err.sum() / cnt.sum()) if cnt.sum() else 0.0

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(cnt), size=(n_resamples, len(cnt)))
    resampled = err[idx].sum(axis=1) / np.maximum(cnt[idx].sum(axis=1), 1e-12)
    lo, hi = np.percentile(resampled, [2.5, 97.5])
    return agg, float(lo), float(hi), per_item


def batch_greedy_per(
    decoded: Sequence[Sequence[int]], targets: Sequence[Sequence[int]]
) -> Tuple[int, int]:
    """Total (edit_distance, target_length) over a batch — the accumulation
    used by validation PER (rnn_trainer.py:722-745)."""
    total_ed = 0
    total_len = 0
    for d, t in zip(decoded, targets):
        total_ed += edit_distance(d, t)
        total_len += len(t)
    return total_ed, total_len
