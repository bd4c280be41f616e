"""Handcrafted full-size GRU weights over planted phoneme-code features —
the connected-pipeline bench fixture.

Problem: the real t15 checkpoint isn't available in this image, yet the
headline bench must feed the RNN's ACTUAL device-resident posteriors into
the beam search (the reference streams real logits into its decoder —
model_training/evaluate_model.py:158-237). Random weights produce soft
garbage posteriors with no known transcript; training a 45M-param model
inside the bench is slow and nondeterministic.

Solution: the synthetic-feature trick of data/synthetic.py (features = a
per-phoneme linear code + noise), paired with an ANALYTICALLY constructed
full-architecture parameter pytree under which the production forward pass
computes a phoneme readout of that code:

  * day layers: identity + zero bias — exactly the reference's init
    (rnn_model.py:47-55), so the softsign nonlinearity still applies;
  * every GRU layer's update gate is driven to 0 (b_ih_z = −30) and its
    recurrent matrix to 0, so h_t = tanh(W_ih_n · x_t + b) — the layer acts
    as a feedforward tanh stage. Layer 1's n-gate rows hold one matched
    filter per phoneme class reading the patch's center frame; layers 2–5
    pass the 41 detector channels through identity tanh stages (tanh is
    monotone per-channel, so the argmax ordering is preserved exactly);
  * the head scales the detector channels up and biases BLANK so silence
    frames (zero code) emit blank — yielding peaked, trained-model-like CTC
    posteriors whose transcripts are known by construction.

Every matmul keeps its production shape (512×512 day layers, 7168→2304
first layer, 5×768 GRU, 768→41 head), so the stage-1 wall-clock measured
through these weights is the true full-size forward cost — XLA's compute
does not depend on weight VALUES. This module is bench/test infrastructure,
not a model-training shortcut.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import ModelConfig

# layer-1 detector pre-activation for the true class (tanh(1.5) ≈ 0.905)
_TARGET_PREACT = 1.5
# pass-through layers keep tanh near-linear for the small off-class values;
# the winner contracts 0.905 → tanh³(0.905) ≈ 0.55, recovered by the head.
# Gains calibrated on the 125k bench world so deletion economics match a
# trained model: with gain 45 / blank bias 12 a hot frame prices "emit blank
# instead" at ~0.325·(12+log 90) ≈ 5.3 nats — skipping a 1-2-frame phoneme
# (~8-11 nats) costs more than the ~11.7-nat LM saving of dropping one
# 125k-vocab word PLUS its SIL (~16 nats total), so word-merge parses lose,
# as they do under the reference's trained posteriors. (At the earlier gain
# 25 the beam search correctly preferred fewer-word parses: 370/512 exact
# with only 1 search error — a fixture property, not a searcher bug.)
_HEAD_GAIN = 45.0
_BLANK_BIAS = 12.0


def planted_params(
    cfg: ModelConfig,
    n_days: int,
    code: np.ndarray,
    n_classes: int = 41,
    center_frame: Optional[int] = None,
    head_gain: float = _HEAD_GAIN,
    blank_bias: float = _BLANK_BIAS,
) -> Dict:
    """Full-size parameter pytree implementing the phoneme-code readout.

    code: (n_classes, neural_dim) float32 — the planted feature codes
    (data/synthetic.phoneme_code at neural_dim=512 for the bench).
    ``head_gain``/``blank_bias`` soften or sharpen the posteriors (the
    quality-ladder knob, scripts/quality_ladder.py): lower gains produce
    soft, ambiguous posteriors where beam diversity and rescoring matter —
    the regime the fixed canonical calibration (45/12) is tested AGAINST.
    """
    D = cfg.n_input_features
    H = cfg.n_units
    P = cfg.patch_size
    L = cfg.n_layers
    assert code.shape == (n_classes, D)
    if center_frame is None:
        center_frame = P // 2
    in_dim = D * P if P > 0 else D

    # matched filters against the softsign-compressed code: row scale chosen
    # per class so the true-class pre-activation lands at _TARGET_PREACT
    soft = code / (1.0 + np.abs(code))
    resp = np.sum(code * soft, axis=1)          # (n_classes,) ⟨c, softsign(c)⟩
    filt = code * (_TARGET_PREACT / resp)[:, None]

    def layer_arrays(in_d: int, w_n: np.ndarray) -> Dict:
        w_ih = np.zeros((3 * H, in_d), np.float32)
        w_ih[2 * H : 2 * H + w_n.shape[0], : w_n.shape[1]] = w_n
        b_ih = np.zeros((3 * H,), np.float32)
        b_ih[H : 2 * H] = -30.0                 # z → 0: h_t = tanh(n)
        return {
            "w_ih": jnp.asarray(w_ih),
            "w_hh": jnp.zeros((3 * H, H), jnp.float32),
            "b_ih": jnp.asarray(b_ih),
            "b_hh": jnp.zeros((3 * H,), jnp.float32),
        }

    # layer 1: detectors read the patch's center frame slice
    w1 = np.zeros((n_classes, in_dim), np.float32)
    if P > 0:
        w1[:, center_frame * D : (center_frame + 1) * D] = filt
    else:
        w1[:, :D] = filt
    layers = [layer_arrays(in_dim, w1)]
    eye = np.eye(n_classes, dtype=np.float32)
    for _ in range(L - 1):
        layers.append(layer_arrays(H, eye))

    out_w = np.zeros((n_classes, H), np.float32)
    out_w[:, :n_classes] = eye * head_gain
    out_b = np.zeros((n_classes,), np.float32)
    out_b[0] = blank_bias                       # BLANK wins on silence frames

    return {
        "day_w": jnp.tile(jnp.eye(D, dtype=jnp.float32)[None], (n_days, 1, 1)),
        "day_b": jnp.zeros((n_days, D), jnp.float32),
        "layers": layers,
        "out_w": jnp.asarray(out_w),
        "out_b": jnp.asarray(out_b),
        "h0": jnp.zeros((H,), jnp.float32),
    }


def plant_frame_labels(
    rng: np.random.Generator,
    phoneme_ids: Sequence[int],
    T: int,
    min_hot: int = 5,
    max_hot: int = 7,
    min_gap: int = 2,
    max_gap: int = 4,
    lead: int = 8,
) -> Tuple[np.ndarray, int]:
    """(T,) int32 per-frame phoneme labels (−1 = silence) with hot runs long
    enough that every phoneme catches ≥1 patch center at stride 4 — the
    feature-space analogue of data/synthetic.ctc_logprobs' trained-model
    temporal statistics (~9 frames = 180 ms per phoneme emission).

    CTC only needs a blank-argmax frame between REPEATED phonemes, so the
    default inter-phoneme gap is short (a gap center's smeared response just
    merges into a neighboring run — harmless under collapse) and the gap
    before a repeat is widened so a clean silence center is guaranteed.
    Returns (labels, n_planted) — callers must check n_planted ==
    len(phoneme_ids) (a too-long sequence is truncated, not squeezed)."""
    labels = np.full((T,), -1, np.int32)
    t = lead
    prev = -1
    n_planted = 0
    for pid in phoneme_ids:
        if pid == prev:
            t += 8
        n = int(rng.integers(min_hot, max_hot + 1))
        if t + n > T - 12:   # the last run must still catch a patch center
            break            # after the 'valid' smoothing trim
        labels[t : t + n] = pid
        n_planted += 1
        t += n + int(rng.integers(min_gap, max_gap + 1))
        prev = pid
    return labels, n_planted


def features_on_device(
    code: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    noise: float = 0.3,
) -> jax.Array:
    """(B, T) labels → (B, T, D) planted features, generated ON DEVICE (a
    big feature batch never crosses the host link — the bench's stage-1
    inputs materialize in HBM from a tiny int32 label array)."""
    x = jnp.where(
        (labels >= 0)[..., None],
        code[jnp.clip(labels, 0)],
        0.0,
    )
    return x + noise * jax.random.normal(key, x.shape, jnp.float32)
