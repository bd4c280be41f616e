#!/usr/bin/env python
"""Root-cause probe for the host-overlap flake (bench.py bounded phase).

Since round 3 the host-overlapped bench phase is capped at 128 utterances
because ~1 run in 4 through the axon tunnel starved the C++ decode thread.
Hypothesis: the tunnel client BUSY-POLLS while waiting on device results, so
on this rig's single CPU core the stage-1 sync loop sometimes consumes the
core the decoder needs (a real multi-core host never sees this).

Three phases, each reporting wall-clock and PROCESS CPU time:

  A. TPU stage-1 sync loop alone   — cpu/wall ≈ 1.0 ⇒ the waiter burns the
                                      core (busy-poll); ≈ 0 ⇒ it sleeps.
  B. native C++ decode alone        — the decode thread's fair-share time.
  C. overlapped (bench layout), N reps — per-rep decode-thread wall vs B
                                      = the starvation factor distribution.

Run:  nohup timeout 1800 python scripts/diagnose_overlap.py > /tmp/diag_overlap.log 2>&1 &
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")
os.makedirs(os.path.expanduser("~/.cache/jax_comp_cache"), exist_ok=True)
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vocab", type=int, default=5000)
    p.add_argument("--utts", type=int, default=64)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--sleep_ms", type=float, default=0.0,
                   help="sleep between stage-1 syncs in the overlap loop")
    args = p.parse_args()

    import bench as BW
    from b2txt_tpu.runtime import NativeLexiconBeamSearch
    from b2txt_tpu.utils.config import DecodeConfig

    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=100,
                       beam_width=64, beam=17.0, first_beam_size=8,
                       sum_mode=False)
    B, T = 64, 520
    run1, P, _ = BW.make_stage1(B, T)
    (lex, lm, lm_unpruned, wl, arpa, arpa_unpruned, lexp, rng,
     _) = BW.build_world(args.vocab, 3)
    utts = BW.make_planted_utts(lex, wl, rng, args.utts, T)
    lab = np.stack([l for _, l in utts[:B]] + [utts[0][1]] * (B - len(utts[:B])))
    key = jax.random.PRNGKey(0)

    # warm stage 1
    _, c = run1(lab, key)
    float(np.asarray(c))

    # ---- phase A: sync loop alone
    na = 12
    t0w, t0c = time.perf_counter(), time.process_time()
    for i in range(na):
        _, c = run1(lab, jax.random.PRNGKey(i))
        float(np.asarray(c))
    wall_a = time.perf_counter() - t0w
    cpu_a = time.process_time() - t0c
    print(json.dumps({"phase": "A_tpu_sync_loop", "iters": na,
                      "wall_s": round(wall_a, 3), "cpu_s": round(cpu_a, 3),
                      "cpu_frac": round(cpu_a / wall_a, 3)}), flush=True)

    # host copies for the decoder
    lp_host = np.asarray(run1(lab, key)[0])
    logits = [lp_host[i] for i in range(min(args.utts, B))]

    native = NativeLexiconBeamSearch(arpa, lexp, cfg, max_homophones=4,
                                     rescore_arpa=arpa_unpruned)

    def decode_all():
        for lp in logits:
            native.reset()
            native.decode(lp)
            native.finish_decoding()

    # ---- phase B: decode alone (2 reps, take min)
    decode_all()  # warm
    best_b = 1e9
    for _ in range(2):
        t0w, t0c = time.perf_counter(), time.process_time()
        decode_all()
        best_b = min(best_b, time.perf_counter() - t0w)
    print(json.dumps({"phase": "B_native_alone", "utts": len(logits),
                      "wall_s": round(best_b, 3)}), flush=True)

    # ---- phase C: overlapped, reps
    factors = []
    for rep in range(args.reps):
        box = {}

        def worker():
            t0 = time.perf_counter()
            decode_all()
            box["dt"] = time.perf_counter() - t0

        th = threading.Thread(target=worker)
        th.start()
        t0 = time.perf_counter()
        i = 0
        while th.is_alive():
            _, c = run1(lab, jax.random.PRNGKey(9000 + i))
            float(np.asarray(c))
            if args.sleep_ms:
                time.sleep(args.sleep_ms / 1e3)
            i += 1
        th.join()
        wall = time.perf_counter() - t0
        factors.append(box["dt"] / best_b)
        print(json.dumps({"phase": "C_overlap", "rep": rep,
                          "decode_wall_s": round(box["dt"], 3),
                          "starvation_x": round(box["dt"] / best_b, 2),
                          "tpu_iters": i, "total_wall_s": round(wall, 3)}),
              flush=True)
    print(json.dumps({"phase": "summary", "sleep_ms": args.sleep_ms,
                      "starvation_min": round(min(factors), 2),
                      "starvation_max": round(max(factors), 2),
                      "starvation_med": round(float(np.median(factors)), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
