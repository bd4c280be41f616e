"""Training-time data augmentations, static-shaped for XLA.

Parity target: ``model_training/rnn_trainer.py:436-484`` (transform_data): in
order — static gain, white noise, constant offset, random walk, random time
cut, then Gaussian smoothing. All randomness is counter-based (jax PRNG keys)
so training is reproducible under jit.

The reference's random cut slices ``features[:, cut:, :]``, shrinking T by a
per-batch random amount — a dynamic shape XLA cannot compile. We instead shift
the sequence left by ``cut`` and zero+mask the tail, keeping T static; the
time-step counts are decremented identically, so CTC masking sees the same
effective sequence.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .smoothing import gauss_smooth
from ..utils.config import DataTransforms


class TransformArgs(NamedTuple):
    """Static hyperparameters of the augmentation pipeline (hashable for jit)."""

    white_noise_std: float = 1.0
    constant_offset_std: float = 0.2
    random_walk_std: float = 0.0
    random_walk_axis: int = -1
    static_gain_std: float = 0.0
    random_cut: int = 3
    smooth_data: bool = True
    smooth_kernel_std: float = 2.0
    smooth_kernel_size: int = 100

    @classmethod
    def from_config(cls, c: DataTransforms) -> "TransformArgs":
        return cls(
            white_noise_std=float(c.white_noise_std),
            constant_offset_std=float(c.constant_offset_std),
            random_walk_std=float(c.random_walk_std),
            random_walk_axis=int(c.random_walk_axis),
            static_gain_std=float(c.static_gain_std),
            random_cut=int(c.random_cut),
            smooth_data=bool(c.smooth_data),
            smooth_kernel_std=float(c.smooth_kernel_std),
            smooth_kernel_size=int(c.smooth_kernel_size),
        )


def shift_left_and_zero(features: jax.Array, cut: jax.Array) -> jax.Array:
    """features[:, t, :] := features[:, t+cut, :], zeros past T-cut. Static shape."""
    B, T, C = features.shape
    rolled = jnp.roll(features, -cut, axis=1)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
    return jnp.where(t_idx < (T - cut), rolled, jnp.zeros((), features.dtype))


def transform_data(
    key: jax.Array,
    features: jax.Array,
    n_time_steps: jax.Array,
    args: TransformArgs,
    training: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Apply augmentations (train only) + smoothing (always) to a (B, T, C) batch.

    Returns (features, n_time_steps); n_time_steps is reduced by the random cut.
    """
    B, T, C = features.shape
    dtype = features.dtype

    if training:
        k_gain, k_white, k_offset, k_walk, k_cut = jax.random.split(key, 5)

        if args.static_gain_std > 0:
            warp = jnp.eye(C, dtype=dtype)[None] + (
                jax.random.normal(k_gain, (B, C, C), dtype) * args.static_gain_std
            )
            features = jnp.einsum(
                "btc,bcd->btd", features, warp, preferred_element_type=dtype
            )

        if args.white_noise_std > 0:
            features = features + jax.random.normal(k_white, (B, T, C), dtype) * args.white_noise_std

        if args.constant_offset_std > 0:
            features = features + (
                jax.random.normal(k_offset, (B, 1, C), dtype) * args.constant_offset_std
            )

        if args.random_walk_std > 0:
            walk = jnp.cumsum(
                jax.random.normal(k_walk, (B, T, C), dtype) * args.random_walk_std,
                axis=args.random_walk_axis,
            )
            features = features + walk

        if args.random_cut > 0:
            cut = jax.random.randint(k_cut, (), 0, args.random_cut)
            features = shift_left_and_zero(features, cut)
            n_time_steps = n_time_steps - cut

    if args.smooth_data:
        features = gauss_smooth(
            features,
            std=args.smooth_kernel_std,
            size=args.smooth_kernel_size,
            padding="same",
        )

    return features, n_time_steps
