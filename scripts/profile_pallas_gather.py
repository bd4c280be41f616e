#!/usr/bin/env python
"""Can a Pallas async-DMA gather beat XLA's gather for the decode searcher?

The device beam search is bound by gathered-ROW count (~30 ns/row on the
v5e, DESIGN.md cost model) — random single-row reads of 8-256 B from HBM
tables (trie pairs, n-gram buckets). This measures a Mosaic kernel keeping a
ring of W async copies in flight (pltpu.make_async_copy, per-slot
semaphores, indices scalar-prefetched to SMEM) against plain XLA
`table[idx]` on the same access pattern.

Mosaic constraint found on the way: VMEM DMA destinations are (1,128)-lane
tiled — single-row copies must be 128-int32-wide (512 B), so the comparison
runs at 512 B rows (if DMAs lose there, they lose harder at the searcher's
256/8 B rows — per-copy overhead only grows relatively).

Timing is done INSIDE one jit (lax.scan over reps, index rotation defeats
caching) — per-call timing through the axon tunnel measures RPC dispatch,
not the kernel (measured: the same gather "cost" 19,000 ns/row per-call vs
~30 ns in-scan).

  nohup timeout 1800 python scripts/profile_pallas_gather.py > /tmp/pg.log &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.makedirs(os.path.expanduser("~/.cache/jax_comp_cache"), exist_ok=True)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

REPS = 32


def make_dma_gather(rw: int, g: int, w: int):
    def kernel(idx_ref, table_ref, out_ref, sem):
        def dma(slot, i):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[i]], out_ref.at[i], sem.at[slot]
            )

        def body(i, _):
            @pl.when(i >= w)
            def _():
                dma((i - w) % w, i - w).wait()

            dma(i % w, i).start()
            return 0

        jax.lax.fori_loop(0, g, body, 0)

        def epi(j, _):
            i = g - w + j
            dma(i % w, i).wait()
            return 0

        jax.lax.fori_loop(0, w, epi, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((w,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, rw), jnp.int32),
        grid_spec=grid_spec,
    )


def bench_case(rows: int, rw: int, g: int, w: int):
    table = jax.random.randint(jax.random.PRNGKey(0), (rows, rw), 0,
                               1 << 20, jnp.int32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (g,), 0, rows, jnp.int32)
    pallas_gather = make_dma_gather(rw, g, w)

    def timed(gather):
        @jax.jit
        def run(table, idx):
            def body(c, _):
                ix = (idx + c) % rows       # rotate to defeat caching
                r = gather(ix, table)
                return c + r[0, 0], 0

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=REPS)
            return c

        float(run(table, idx))  # compile+warm
        t0 = time.perf_counter()
        float(run(table, idx))
        return (time.perf_counter() - t0) / REPS

    out = {"rows": rows, "row_bytes": rw * 4, "gathers": g, "in_flight": w}
    xla_t = timed(lambda ix, t: t[ix])
    out["xla_ns_per_row"] = round(xla_t * 1e9 / g, 1)

    # correctness of the kernel first
    try:
        got = np.asarray(jax.jit(pallas_gather)(idx, table))
        ref = np.asarray(table[idx])
        assert (got == ref).all(), "pallas gather mismatch"
        pl_t = timed(lambda ix, t: pallas_gather(ix, t))
        out["pallas_ns_per_row"] = round(pl_t * 1e9 / g, 1)
        out["pallas_vs_xla"] = round(pl_t / xla_t, 2)
    except Exception as e:
        out["pallas_error"] = repr(e)[:160]
    return out


def main():
    import argparse

    argparse.ArgumentParser(
        description="A/B a Mosaic async-DMA row-gather ring against XLA's "
        "native gather on the searcher's random-row pattern"
    ).parse_args()
    for rows, rw, g, w in [
        (1 << 17, 128, 4096, 8),
        (1 << 17, 128, 4096, 32),
        (1 << 17, 128, 4096, 128),
    ]:
        print(json.dumps(bench_case(rows, rw, g, w)), flush=True)


if __name__ == "__main__":
    main()
