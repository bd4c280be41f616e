#!/usr/bin/env python
"""Profile the device beam-search frame step and its candidate gather layouts.

Modes:
  step    — time the real batched expand step at reference scale (125k vocab),
            optionally with the LM probes stubbed out (--stub_lm), to split
            probe cost from sort/merge/trie cost.
  gather  — microbenchmark probe-window gather layouts against synthetic
            tables of production size: arbitrary-start (8,4) windows (the
            round-2 layout) vs bucket-aligned rows, window widths, dtypes,
            and table-size sweep. This is the cost model that decides the
            round-3 table redesign.
  sort    — lax.sort cost at the searcher's candidate shapes.

All timings run the op inside one lax.scan (matching how the searcher
amortizes dispatch) and synchronize by fetching a scalar to host (the axon
tunnel makes block_until_ready unreliable — see CLAUDE.md).

  nohup timeout 3000 python scripts/profile_device_step.py gather > /tmp/prof_gather.log 2>&1 &
"""

import argparse
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


def timed_scan(make_step, iters: int, reps: int = 3):
    """Time `make_step(carry, i) -> carry` inside one lax.scan of `iters`."""

    @jax.jit
    def run(c0):
        def body(c, i):
            return make_step(c, i), ()

        c, _ = jax.lax.scan(body, c0, jnp.arange(iters, dtype=jnp.int32))
        return c

    c0 = jnp.float32(0.0)
    float(np.asarray(run(c0)).ravel()[0])  # compile + warm
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(run(c0)).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


# --------------------------------------------------------------------- gather
def bench_gathers(args):
    S_slots = args.slots          # total 16B slots in the table
    results = []

    def report(name, per_call_s, n_idx, bytes_gathered):
        r = {
            "layout": name,
            "us_per_call": round(per_call_s * 1e6, 1),
            "n_windows": n_idx,
            "MB": round(bytes_gathered / 1e6, 3),
            "GBps": round(bytes_gathered / per_call_s / 1e9, 2),
            "ns_per_window": round(per_call_s / n_idx * 1e9, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)

    key = jax.random.PRNGKey(0)
    N = args.windows  # number of probe windows per call

    # A: round-2 layout — arbitrary-start (8,4) windows from a flat (S,4)
    tabA = jax.random.randint(key, (S_slots, 4), 0, 1 << 30, jnp.int32)

    def stepA(c, i):
        slot0 = (
            jax.random.randint(jax.random.fold_in(key, i), (N,), 0, S_slots - 8)
        )
        rows = tabA[slot0[:, None] + jnp.arange(8)[None]]        # (N, 8, 4)
        return c + jnp.sum(rows[:, 0, 2]).astype(jnp.float32)

    report("A_flat_window8x4", timed_scan(stepA, args.iters), N, N * 128)

    # B: bucket-aligned — (S/8, 8, 4), one index per window
    tabB = tabA.reshape(S_slots // 8, 8, 4)

    def stepB(c, i):
        b = jax.random.randint(jax.random.fold_in(key, i), (N,), 0, S_slots // 8)
        rows = tabB[b]                                            # (N, 8, 4)
        return c + jnp.sum(rows[:, 0, 2]).astype(jnp.float32)

    report("B_bucket8x4", timed_scan(stepB, args.iters), N, N * 128)

    # B128: bucket-aligned flattened rows — (S/8, 32) int32 (one 128B row)
    tabB2 = tabA.reshape(S_slots // 8, 32)

    def stepB2(c, i):
        b = jax.random.randint(jax.random.fold_in(key, i), (N,), 0, S_slots // 8)
        rows = tabB2[b]                                           # (N, 32)
        return c + jnp.sum(rows[:, 2]).astype(jnp.float32)

    report("B2_bucketrow32", timed_scan(stepB2, args.iters), N, N * 128)

    # C: bucket-aligned half windows — (S/4, 16)
    tabC = tabA.reshape(S_slots // 4, 16)

    def stepC(c, i):
        b = jax.random.randint(jax.random.fold_in(key, i), (N,), 0, S_slots // 4)
        rows = tabC[b]                                            # (N, 16)
        return c + jnp.sum(rows[:, 2]).astype(jnp.float32)

    report("C_bucketrow16", timed_scan(stepC, args.iters), N, N * 64)

    # D: two-choice bucket-4 — indices (N,2) into (S/4, 16)
    def stepD(c, i):
        b = jax.random.randint(
            jax.random.fold_in(key, i), (N, 2), 0, S_slots // 4
        )
        rows = tabC[b]                                            # (N, 2, 16)
        return c + jnp.sum(rows[:, 0, 2]).astype(jnp.float32)

    report("D_2choice_row16", timed_scan(stepD, args.iters), N, N * 128)

    # E: single element gathers (trie-style) — (S*4,) flat
    tabE = tabA.reshape(-1)

    def stepE(c, i):
        b = jax.random.randint(
            jax.random.fold_in(key, i), (N,), 0, S_slots * 4 - 1
        )
        vals = tabE[b]
        return c + jnp.sum(vals).astype(jnp.float32)

    report("E_scalar_gather", timed_scan(stepE, args.iters), N, N * 4)

    # F: wide bucket row — (S/32, 128) int32 = one 512B row
    tabF = tabA.reshape(S_slots // 32, 128)

    def stepF(c, i):
        b = jax.random.randint(jax.random.fold_in(key, i), (N,), 0, S_slots // 32)
        rows = tabF[b]                                            # (N, 128)
        return c + jnp.sum(rows[:, 2]).astype(jnp.float32)

    report("F_bucketrow128", timed_scan(stepF, args.iters), N, N * 512)

    # G: int16 bucket rows — (S/8, 32) int16 (half the bytes of B2)
    tabG = (tabA.reshape(S_slots // 8, 32) & 0x7FFF).astype(jnp.int16)

    def stepG(c, i):
        b = jax.random.randint(jax.random.fold_in(key, i), (N,), 0, S_slots // 8)
        rows = tabG[b]
        return c + jnp.sum(rows[:, 2].astype(jnp.int32)).astype(jnp.float32)

    report("G_bucketrow32_i16", timed_scan(stepG, args.iters), N, N * 64)

    print(json.dumps({"slots": S_slots, "windows": N,
                      "table_MB": round(S_slots * 16 / 1e6, 1)}), flush=True)


# ----------------------------------------------------------------------- sort
def bench_sort(args):
    B, N = args.batch, args.cands
    key = jax.random.PRNGKey(0)
    k1 = jax.random.randint(key, (B, N), 0, 1 << 30, jnp.int32)
    ops = [jax.random.normal(jax.random.fold_in(key, j), (B, N)) for j in range(5)]

    def step(c, i):
        kk = k1 + i
        out = jax.lax.sort(
            (kk, *ops), num_keys=1, dimension=1
        )
        return c + out[1][0, 0]

    per = timed_scan(step, args.iters)
    print(json.dumps({"sort_B": B, "sort_N": N, "operands": 6,
                      "us_per_sort": round(per * 1e6, 1)}), flush=True)

    # associative scans (merge) at the same shape
    from b2txt_tpu.decode.lmbeam_jax import _seg_scan

    starts = jax.random.bernoulli(key, 0.3, (B, N))

    def step2(c, i):
        out = jax.vmap(_seg_scan)(ops[0] + i, starts)
        return c + out[0, 0]

    per2 = timed_scan(step2, args.iters)
    print(json.dumps({"segscan_us": round(per2 * 1e6, 1)}), flush=True)

    # top_k
    def step3(c, i):
        v, idx = jax.lax.top_k(ops[0] + i, 96)
        return c + v[0, 0]

    per3 = timed_scan(step3, args.iters)
    print(json.dumps({"topk_us": round(per3 * 1e6, 1)}), flush=True)


# ------------------------------------------------------------------ selection
def bench_sel(args):
    """Selection/merge op costs at the searcher's shapes: top_k vs
    approx_max_k, sort operand scaling, minor-dim take_along_axis, and the
    fused 4-column segmented scan."""
    B, N, K = args.batch, args.cands, args.K
    key = jax.random.PRNGKey(0)
    vals = jax.random.normal(key, (B, N))
    k1 = jax.random.randint(key, (B, N), 0, 1 << 30, jnp.int32)

    def t(name, make_step, extra=None):
        per = timed_scan(make_step, args.iters)
        print(json.dumps({"op": name, "us": round(per * 1e6, 1),
                          **(extra or {})}), flush=True)

    def s_topk(c, i):
        v, idx = jax.lax.top_k(vals + i, K)
        return c + v[0, 0]

    t("top_k", s_topk)

    for recall in (0.95, 0.99):
        def s_approx(c, i, r=recall):
            v, idx = jax.lax.approx_max_k(vals + i, K, recall_target=r)
            return c + v[0, 0]

        t(f"approx_max_k_{recall}", s_approx)

    for n_ops in (3, 5, 7):
        ops = [jax.random.normal(jax.random.fold_in(key, j), (B, N))
               for j in range(n_ops - 1)]

        def s_sort(c, i, ops=ops):
            out = jax.lax.sort((k1 + i, *ops), num_keys=2, dimension=1)
            return c + out[1][0, 0]

        t(f"sort_{n_ops}ops", s_sort)

    from b2txt_tpu.decode.lmbeam_jax import _seg_merge4

    starts = jax.random.bernoulli(key, 0.3, (B, N))
    vals4 = jax.random.normal(key, (B, N, 4))

    def s_seg4(c, i):
        out = jax.vmap(lambda v, s: _seg_merge4(v, s, False))(vals4 + i, starts)
        return c + out[0, 0, 0]

    t("seg_merge4_viterbi", s_seg4)

    def s_seg4s(c, i):
        out = jax.vmap(lambda v, s: _seg_merge4(v, s, True))(vals4 + i, starts)
        return c + out[0, 0, 0]

    t("seg_merge4_sum", s_seg4s)

    # minor-dim take_along_axis: (B*K, 41) rows -> (B*K, 8) selected columns
    rows = jax.random.normal(key, (B * K, 41))
    idx = jax.random.randint(key, (B * K, 8), 0, 41, jnp.int32)

    def s_take(c, i):
        out = jnp.take_along_axis(rows + i, idx, axis=1)
        return c + out[0, 0]

    t("take_minor_41to8", s_take, {"rows": B * K})


# ----------------------------------------------------------------------- step
def bench_step(args):
    from scripts.bench_device_decode import build_world, make_utts  # noqa
    from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch
    from b2txt_tpu.utils.config import DecodeConfig

    t0 = time.time()
    lex, lm, wl, arpa, lexp, rng = build_world(args.vocab, 3)
    print(f"world built {time.time()-t0:.0f}s", flush=True)
    cfg = DecodeConfig(
        acoustic_scale=0.325, blank_penalty=90.0,
        ctc_blank_skip_threshold=0.98, nbest=20,
        beam_width=args.K, beam=17.0, first_beam_size=8, sum_mode=False,
    )
    dev = DeviceLexiconBeamSearch(lex, lm, cfg)
    tab, P = dev.dev_lm.table
    print(json.dumps({
        "lm_table_rows": int(tab.shape[0]),
        "lm_table_MB": round(tab.size * 4 / 1e6, 1),
        "trie_nodes": lex.n_nodes,
        "trie_next_MB": round(lex.n_nodes * 41 * 4 / 1e6, 1),
        "row_width": int(tab.shape[1]) if tab.ndim > 1 else P,
    }), flush=True)

    if args.stub_lm:
        real = dev.dev_lm

        class StubLM:
            order = real.order
            bos_id = real.bos_id
            eos_id = real.eos_id
            unk_logp = real.unk_logp
            table = real.table

            def logp_words(self, ctx, words, uni_logp_w=None,
                           n_exact=None):
                return jnp.zeros(words.shape, jnp.float32) - 2.0

            def logp(self, ctx, word):
                return jnp.float32(-2.0)

            # decode_batch's jitted scan binds the table at trace time
            # (lmbeam_jax scan_batch_bound) — delegate to the real LM's
            # bind machinery so the probe-cost ablation mode still runs.
            def bind_table(self, packed):
                real.bind_table(packed)

            def unbind_table(self):
                real.unbind_table()

        dev.dev_lm = StubLM()

    B, T = args.batch, args.frames
    utts = make_utts(lex, wl, rng, B)
    arr = np.full((B, T, 41), -20.0, np.float32)
    arr[:, :, 0] = 0.0
    for i, (_, lp) in enumerate(utts):
        arr[i, : min(T, lp.shape[0])] = lp[:T]
    lens = np.full((B,), T, np.int32)

    # one-shot timing of the batched scan
    t0 = time.time()
    res = dev.decode_batch(arr, lens)
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        dev.decode_batch(arr, lens)
        best = min(best, time.perf_counter() - t0)
    per_frame = best / T
    print(json.dumps({
        "vocab": args.vocab, "B": B, "K": args.K, "T": T,
        "stub_lm": bool(args.stub_lm),
        "batch_s": round(best, 3),
        "ms_per_frame": round(per_frame * 1e3, 3),
        "us_per_utt_frame": round(per_frame / B * 1e6, 1),
        "sentences_per_sec_at_250f": round(B / (per_frame * 250), 2),
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["step", "gather", "sort", "sel"])
    p.add_argument("--vocab", type=int, default=125_000)
    p.add_argument("--K", type=int, default=96)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--stub_lm", action="store_true")
    p.add_argument("--slots", type=int, default=2_097_152)
    p.add_argument("--windows", type=int, default=24576)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--cands", type=int, default=1344)
    args = p.parse_args()
    print(json.dumps({"backend": jax.default_backend(), "mode": args.mode}),
          flush=True)
    if args.mode == "gather":
        bench_gathers(args)
    elif args.mode == "sort":
        bench_sort(args)
    elif args.mode == "sel":
        bench_sel(args)
    else:
        bench_step(args)


if __name__ == "__main__":
    main()
