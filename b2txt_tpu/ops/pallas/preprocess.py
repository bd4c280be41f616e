"""Fused Pallas preprocessing kernel: augmentations + Gaussian smoothing in
one pass over HBM.

The reference runs separate GPU kernels per augmentation (white/offset/walk
adds at rnn_trainer.py:436-471) plus a grouped conv1d for smoothing — each a
full HBM round trip over the (B, T, C) tensor. This kernel does one read and
one write per element: per-core PRNG (pltpu.prng_random_bits + Box-Muller)
generates the noise in VMEM, the random-cut shift happens on-chip, and the
9-tap truncated-Gaussian smoothing is applied as shifted adds before the
single store.

Grid: one program per batch row — a (T, C) block (512×512 f32 = 1 MB) fits
VMEM comfortably. Static-gain (a per-row C×C matmul) stays on the XLA/MXU
path before the kernel; random-walk cumsum is fused (off by default in
rnn_args.yaml:64-66).

Distribution parity (not bit parity — RNG streams differ by design) is tested
against the XLA path statistically; the deterministic parts (smoothing, cut
shifting) are tested exactly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..augment import TransformArgs
from ..smoothing import gaussian_kernel


def _normals(shape):
    """Standard normals via Box-Muller over on-chip PRNG bits."""
    # uniforms in [1, 2) by splicing random mantissa bits under a fixed
    # exponent (single bitcast; Mosaic lacks a uint32→f32 convert)
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    f1 = pltpu.bitcast(jnp.uint32(0x3F800000) | (bits1 >> 9), jnp.float32)
    f2 = pltpu.bitcast(jnp.uint32(0x3F800000) | (bits2 >> 9), jnp.float32)
    u1 = (f1 - 1.0) + 1e-7
    u2 = f2 - 1.0
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * np.pi * u2)


def _make_kernel(T: int, C: int, args: TransformArgs, training: bool,
                 kern: Tuple[float, ...], on_chip_rng: bool):
    K = len(kern)
    half = K // 2
    needs_noise = training and (
        args.white_noise_std > 0 or args.constant_offset_std > 0
        or args.random_walk_std > 0
    )

    def kernel(seed_ref, x_ref, *rest):
        if needs_noise and not on_chip_rng:
            noise_ref, out_ref = rest
        else:
            (out_ref,) = rest
        b = pl.program_id(0)
        x = x_ref[0]  # (T, C)

        if training:
            if needs_noise and on_chip_rng:
                pltpu.prng_seed(seed_ref[0] + b * jnp.int32(7919))
                draw = lambda shape: _normals(shape)
            elif needs_noise:
                # host-provided normals (CPU/interpret path): layout
                # [white (T,C); offset (1,C); walk (T,C)] stacked on axis 0
                off = 0

                def draw(shape):
                    nonlocal off
                    n = noise_ref[0, off : off + shape[0], :]
                    off += shape[0]
                    return n[:, : shape[1]]

            if args.white_noise_std > 0:
                x = x + args.white_noise_std * draw((T, C))
            if args.constant_offset_std > 0:
                x = x + args.constant_offset_std * draw((1, C))
            if args.random_walk_std > 0:
                x = x + jnp.cumsum(
                    args.random_walk_std * draw((T, C)),
                    axis=args.random_walk_axis,
                )

        if args.smooth_data:
            padded = jnp.pad(x, ((half, K - 1 - half), (0, 0)))
            acc = jnp.zeros((T, C), jnp.float32)
            for k, w in enumerate(kern):
                # static slices — Mosaic has no dynamic_slice-of-values rule
                acc = acc + np.float32(w) * padded[k : k + T, :]
            x = acc

        out_ref[0] = x

    return kernel, needs_noise


@functools.partial(
    jax.jit, static_argnames=("args", "training", "interpret", "on_chip_rng")
)
def fused_preprocess(
    key: jax.Array,
    features: jax.Array,       # (B, T, C) float32
    n_time_steps: jax.Array,   # (B,) int32
    args: TransformArgs,
    training: bool = True,
    interpret: bool = False,
    on_chip_rng: bool = True,
):
    """Drop-in fused replacement for ops.augment.transform_data.

    ``on_chip_rng=False`` generates noise with jax.random on the host side and
    streams it into the kernel — used on CPU/interpret (the TPU PRNG
    primitives have no CPU lowering) and for reproducibility experiments.
    """
    if interpret:
        on_chip_rng = False
    B, T, C = features.shape
    kern = gaussian_kernel(args.smooth_kernel_std, args.smooth_kernel_size)

    k_gain, k_cut, k_seed, k_noise = jax.random.split(key, 4)
    if training and args.static_gain_std > 0:
        warp = jnp.eye(C, dtype=features.dtype)[None] + (
            jax.random.normal(k_gain, (B, C, C), features.dtype)
            * args.static_gain_std
        )
        features = jnp.einsum("btc,bcd->btd", features, warp)

    if training and args.random_cut > 0:
        # The cut shift stays on the XLA side: Mosaic has no dynamic-shift
        # lowering for values, and a roll+mask over (B, T, C) fuses into the
        # surrounding program anyway.
        from ..augment import shift_left_and_zero

        cut = jax.random.randint(k_cut, (), 0, args.random_cut, jnp.int32)
        features = shift_left_and_zero(features, cut)
        n_time_steps = n_time_steps - cut

    seed = jax.random.randint(k_seed, (), 0, 2**31 - 1, jnp.int32)

    kernel, needs_noise = _make_kernel(T, C, args, training, kern, on_chip_rng)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, T, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [seed.reshape(1), features.astype(jnp.float32)]

    if needs_noise and not on_chip_rng:
        # [white (T,C); offset (1,C); walk (T,C)] stacked along time axis
        n_rows = 2 * T + 1
        noise = jax.random.normal(k_noise, (B, n_rows, C), jnp.float32)
        in_specs.append(
            pl.BlockSpec((1, n_rows, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(noise)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)
    return out, n_time_steps
