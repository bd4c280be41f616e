"""Gaussian temporal smoothing of neural features, TPU-native.

Parity target: ``model_training/data_augmentations.py:6-37`` (gauss_smooth).
The reference builds its kernel by running scipy's ``gaussian_filter1d`` on an
impulse, truncating taps <= 0.01 and renormalizing, then applies a grouped
conv1d. We compute the identical kernel analytically (scipy's gaussian filter
uses exact normalized Gaussian weights over radius ``int(4*sigma + 0.5)``) and
apply it as a sum of shifted scaled copies — a handful of fused VPU
multiply-adds instead of a depthwise conv, which XLA fuses into one pass over
the (B, T, C) tensor.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def gaussian_kernel(std: float = 2.0, size: int = 100, trunc_thresh: float = 0.01) -> Tuple[float, ...]:
    """Build the truncated, renormalized smoothing kernel.

    Matches the reference construction exactly: an impulse at ``size // 2``
    filtered with a Gaussian of ``std`` (scipy default truncate=4.0), then taps
    with value <= ``trunc_thresh`` removed and the rest renormalized to sum 1.
    Returned as a tuple so it is hashable/static under jit.
    """
    radius = int(4.0 * std + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / std) ** 2)
    phi = phi / phi.sum()
    # Place on the impulse response grid of length `size` (impulse at size//2),
    # mirroring how the reference materializes it before thresholding.
    imp = np.zeros(size, dtype=np.float64)
    center = size // 2
    lo = max(0, center - radius)
    hi = min(size, center + radius + 1)
    imp[lo:hi] = phi[(lo - (center - radius)):(hi - (center - radius))]
    keep = imp > trunc_thresh
    kernel = imp[keep]
    kernel = kernel / kernel.sum()
    return tuple(float(v) for v in kernel.astype(np.float32))


def kernel_array(std: float = 2.0, size: int = 100) -> np.ndarray:
    return np.asarray(gaussian_kernel(std, size), dtype=np.float32)


@functools.partial(jax.jit, static_argnames=("std", "size", "padding"))
def gauss_smooth(
    inputs: jax.Array,
    std: float = 2.0,
    size: int = 100,
    padding: str = "same",
) -> jax.Array:
    """Smooth ``inputs`` of shape (B, T, C) (or (T, C)) along the time axis.

    padding='same'  → output T matches input T, zero-padded at the edges
                      (training path, rnn_trainer.py:473-481).
    padding='valid' → output T = T - K + 1 (inference path,
                      evaluate_model_helpers.py:92-98).
    """
    kern = gaussian_kernel(std, size)
    K = len(kern)
    squeeze = inputs.ndim == 2
    if squeeze:
        inputs = inputs[None]
    B, T, C = inputs.shape

    if padding == "same":
        half = K // 2
        padded = jnp.pad(inputs, ((0, 0), (half, K - 1 - half), (0, 0)))
        out_T = T
    elif padding == "valid":
        padded = inputs
        out_T = T - K + 1
    else:
        raise ValueError(f"padding must be 'same' or 'valid', got {padding!r}")

    out = jnp.zeros((B, out_T, C), dtype=inputs.dtype)
    for k, w in enumerate(kern):
        out = out + jnp.asarray(w, inputs.dtype) * jax.lax.dynamic_slice_in_dim(padded, k, out_T, axis=1)

    if squeeze:
        out = out[0]
    return out
