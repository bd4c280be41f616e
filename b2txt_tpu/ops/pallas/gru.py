"""Pallas GRU sequence kernel: the time recurrence with gate weights pinned in
VMEM.

XLA's lax.scan re-reads W_hh (3H×H ≈ 3.5 MB at H=768) from HBM every timestep,
making the recurrence HBM-bound (~4.4 µs/step at 800 GB/s vs ~1 µs of MXU
work). This kernel keeps W_hh/biases resident in VMEM for the whole sequence
and double-buffers the per-step input projections from HBM, so each step costs
one (B, H) × (H, 3H) MXU matmul plus a ~300 KB stream — the speed-of-light
pattern for RNNs on TPU.

Used on the inference/decode path (models.gru_decoder selects it via
``use_pallas``); training keeps the XLA scan for autodiff until the custom
VJP kernel lands. Gate math is exactly torch.nn.GRU's (r/z/n, b_hh_n inside
the reset product) — parity-tested against the XLA scan implementation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_seq_kernel(xp_hbm, wt_ref, b_ref, h0_ref, out_hbm, hf_ref,
                    h_scr, x_scr, sems):
    """xp_hbm: (T, B, 3H) input projections (x @ W_ih^T + b_ih), in HBM.
    wt_ref: (H, 3H) transposed W_hh in VMEM. b_ref: (1, 3H) b_hh.
    h0_ref: (B, H). out_hbm: (T, B, H). hf_ref: (B, H) final state.
    h_scr: (B, H) VMEM carry. x_scr: (2, B, 3H) double buffer.
    """
    T = xp_hbm.shape[0]
    H = wt_ref.shape[0]

    h_scr[:] = h0_ref[:]

    def get_in(slot, t):
        return pltpu.make_async_copy(xp_hbm.at[t], x_scr.at[slot], sems.at[slot])

    get_in(0, 0).start()

    def body(t, _):
        slot = t % 2

        @pl.when(t + 1 < T)
        def _():
            get_in((t + 1) % 2, t + 1).start()

        get_in(slot, t).wait()

        h = h_scr[:]
        hh = (
            jnp.dot(h, wt_ref[:], preferred_element_type=jnp.float32)
            + b_ref[0, :]
        )
        xp = x_scr[slot]
        r = jax.nn.sigmoid(xp[:, :H] + hh[:, :H])
        z = jax.nn.sigmoid(xp[:, H : 2 * H] + hh[:, H : 2 * H])
        n = jnp.tanh(xp[:, 2 * H :] + r * hh[:, 2 * H :])
        h_new = ((1.0 - z) * n + z * h).astype(h_scr.dtype)
        h_scr[:] = h_new

        out_dma = pltpu.make_async_copy(h_scr, out_hbm.at[t], sems.at[2])
        out_dma.start()
        out_dma.wait()
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    hf_ref[:] = h_scr[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_layer_pallas(
    x_proj: jax.Array,    # (B, T, 3H): x @ W_ih^T + b_ih
    w_hh: jax.Array,      # (3H, H)
    b_hh: jax.Array,      # (3H,)
    h0: jax.Array,        # (B, H)
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run one GRU layer's recurrence. Returns (outputs (B, T, H), h_final)."""
    B, T, threeH = x_proj.shape
    H = threeH // 3
    dtype = x_proj.dtype

    xp = jnp.moveaxis(x_proj, 1, 0)  # (T, B, 3H) — time-major streaming
    wt = w_hh.T.astype(dtype)        # (H, 3H)
    b = b_hh.reshape(1, -1).astype(dtype)

    out, hf = pl.pallas_call(
        _gru_seq_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # W_hh^T resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),    # outputs written via DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), dtype),               # h carry
            pltpu.VMEM((2, B, threeH), dtype),       # input double buffer
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(xp, wt, b, h0.astype(dtype))

    return jnp.moveaxis(out, 0, 1), hf
