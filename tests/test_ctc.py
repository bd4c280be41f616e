"""CTC loss parity vs torch.nn.CTCLoss(blank=0, reduction='none')."""

import numpy as np
import pytest

from b2txt_tpu.ops.ctc import ctc_loss, ctc_loss_from_logits, greedy_decode_ids, batched_greedy_collapse


def _torch_ctc(log_probs, targets, input_lengths, target_lengths):
    import torch

    loss = torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=False)
    lp = torch.tensor(log_probs).permute(1, 0, 2)  # (T, B, C)
    return loss(
        lp,
        torch.tensor(targets),
        torch.tensor(input_lengths),
        torch.tensor(target_lengths),
    ).numpy()


def _random_case(rng, B=4, T=25, C=8, S=6):
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    targets = rng.integers(1, C, size=(B, S)).astype(np.int32)
    target_lengths = rng.integers(1, S + 1, size=(B,)).astype(np.int32)
    input_lengths = np.clip(
        rng.integers(2 * S + 2, T + 1, size=(B,)), None, T
    ).astype(np.int32)
    return log_probs, targets, input_lengths, target_lengths


def test_ctc_loss_matches_torch(rng):
    log_probs, targets, il, tl = _random_case(rng)
    ours = np.asarray(ctc_loss(log_probs, targets, il, tl))
    ref = _torch_ctc(log_probs, targets, il, tl)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_loss_repeated_labels(rng):
    # Repeats force the skip-transition mask to matter.
    B, T, C, S = 3, 30, 6, 8
    log_probs = rng.standard_normal((B, T, C)).astype(np.float32)
    log_probs -= np.log(np.exp(log_probs).sum(-1, keepdims=True))
    targets = np.tile(np.array([1, 1, 2, 2, 3, 3, 1, 1], dtype=np.int32), (B, 1))
    tl = np.array([8, 6, 4], dtype=np.int32)
    il = np.array([30, 25, 20], dtype=np.int32)
    ours = np.asarray(ctc_loss(log_probs, targets, il, tl))
    ref = _torch_ctc(log_probs, targets, il, tl)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_loss_from_logits_matches_torch(rng):
    B, T, C, S = 2, 20, 5, 4
    logits = (5 * rng.standard_normal((B, T, C))).astype(np.float32)
    targets = rng.integers(1, C, size=(B, S)).astype(np.int32)
    tl = np.array([4, 2], dtype=np.int32)
    il = np.array([20, 15], dtype=np.int32)
    ours = np.asarray(ctc_loss_from_logits(logits, targets, il, tl))

    import torch

    lp = torch.tensor(logits).log_softmax(2).permute(1, 0, 2)
    ref = torch.nn.CTCLoss(blank=0, reduction="none")(
        lp, torch.tensor(targets), torch.tensor(il), torch.tensor(tl)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_grad_matches_torch(rng):
    import jax
    import torch

    B, T, C, S = 2, 12, 5, 3
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    targets = rng.integers(1, C, size=(B, S)).astype(np.int32)
    tl = np.array([3, 2], dtype=np.int32)
    il = np.array([12, 10], dtype=np.int32)

    g_ours = jax.grad(
        lambda lg: ctc_loss_from_logits(lg, targets, il, tl).mean()
    )(logits)

    lt = torch.tensor(logits, requires_grad=True)
    loss = torch.nn.CTCLoss(blank=0, reduction="none")(
        lt.log_softmax(2).permute(1, 0, 2),
        torch.tensor(targets), torch.tensor(il), torch.tensor(tl),
    ).mean()
    loss.backward()
    np.testing.assert_allclose(np.asarray(g_ours), lt.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_greedy_decode_and_collapse():
    T, C = 7, 4
    logits = np.full((1, T, C), -5.0, dtype=np.float32)
    path = [1, 1, 0, 2, 2, 0, 1]
    for t, c in enumerate(path):
        logits[0, t, c] = 5.0
    ids = np.asarray(greedy_decode_ids(logits, np.array([7])))
    assert list(ids[0]) == path
    collapsed = batched_greedy_collapse(ids, np.array([7]))
    assert collapsed[0] == [1, 2, 1]
    # truncation by input_length
    collapsed = batched_greedy_collapse(
        np.asarray(greedy_decode_ids(logits, np.array([5]))), np.array([5])
    )
    assert collapsed[0] == [1, 2]


def test_ctc_zero_length_target(rng):
    """Empty target: loss = -sum log P(blank) over valid frames (torch parity)."""
    B, T, C = 2, 10, 5
    log_probs = rng.standard_normal((B, T, C)).astype(np.float32)
    log_probs -= np.log(np.exp(log_probs).sum(-1, keepdims=True))
    targets = np.zeros((B, 3), np.int32)
    tl = np.array([0, 2], np.int32)
    targets[1, :2] = [1, 2]
    il = np.array([10, 10], np.int32)
    ours = np.asarray(ctc_loss(log_probs, targets, il, tl))
    ref = _torch_ctc(log_probs, targets, il, tl)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_impossible_alignment():
    """Target longer than CTC can fit in the input -> huge/infinite loss."""
    B, T, C = 1, 4, 5
    log_probs = np.full((B, T, C), np.log(1.0 / C), np.float32)
    targets = np.array([[1, 1, 1]], np.int32)  # repeats need blanks: needs T>=5
    tl = np.array([3], np.int32)
    il = np.array([4], np.int32)
    ours = float(ctc_loss(log_probs, targets, il, tl)[0])
    assert ours > 1e20  # torch returns inf; we return the finite stand-in
