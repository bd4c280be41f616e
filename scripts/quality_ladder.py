#!/usr/bin/env python
"""Soft-posterior quality ladder: sweep the planted head gain and measure
decode quality per backend (VERDICT r4 items 4 + 6).

The connected bench's 512/512-exact headline is measured at the calibrated
posterior sharpness (head gain 45 / blank bias 12). This drive is the
standing evidence OFF that point: lower gains produce soft, ambiguous
posteriors (the regime where the reference's lattice path diversity matters
— ctc_wfst_beam_search.cc:123-160 ShortestPath n-best), and both backends
must agree and degrade gracefully. Per gain and backend it reports:

  * exact-match, search errors, aggregate WER (+CI);
  * n-best pool depth (distinct candidate sentences; the reference extracts
    nbest=100 from its determinized lattice — the fixed-width beam pool
    must reach comparable depth on soft posteriors);
  * oracle WER of the n-best list (the floor an LLM rescorer could reach —
    the list-quality measure the lattice buys the reference);
  * cross-backend top-1 agreement on identical posteriors.

Run (TPU):  nohup timeout 3600 python scripts/quality_ladder.py \
              > /tmp/quality_ladder.log 2>&1 &
CPU tiny:   python scripts/quality_ladder.py --vocab 300 --utts 8 \
              --device_batch 4 --bins 288 --gains 18,45 --force_cpu
Prints one JSON line per gain plus a summary line.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def pool_metrics(results, sents):
    """(mean distinct-pool depth, oracle WER) of n-best lists."""
    from b2txt_tpu.utils.metrics import edit_distance

    depths = []
    dist = 0
    total = 0
    for r, truth in zip(results, sents):
        cands = list(dict.fromkeys(c.sentence for c in r)) if r else []
        depths.append(len(cands))
        ref = truth.split()
        best = min(
            (edit_distance(ref, c.split()) for c in cands),
            default=len(ref),
        )
        dist += best
        total += len(ref)
    return float(np.mean(depths)) if depths else 0.0, dist / max(total, 1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--vocab", type=int, default=125_000)
    p.add_argument("--utts", type=int, default=128)
    p.add_argument("--device_batch", type=int, default=64)
    p.add_argument("--bins", type=int, default=520)
    p.add_argument("--order", type=int, default=3)
    p.add_argument("--gains", default="15,20,25,35,45")
    p.add_argument("--blank_bias", type=float, default=12.0)
    p.add_argument("--beam_width", type=int, default=48)
    p.add_argument("--nbest", type=int, default=100)
    p.add_argument("--max_homophones", type=int, default=None)
    p.add_argument("--real_lexicon", action="store_true",
                   help="sweep over the reference's ACTUAL CMUdict trie "
                        "(bench.py --real_lexicon world)")
    p.add_argument("--adversarial", action="store_true")
    p.add_argument("--lattice", action="store_true",
                   help="also decode with the C++ lattice n-best "
                        "(ngram-keyed, wide beam) — the deep-candidate-list "
                        "path tied to the reference's lattice ShortestPath "
                        "(ctc_wfst_beam_search.cc:123-160)")
    p.add_argument("--lattice_width", type=int, default=512)
    p.add_argument("--state_key", default="history",
                   choices=["history", "ngram"],
                   help="device-searcher hypothesis state space (bench.py "
                        "--state_key)")
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args()

    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    import bench as BW
    from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch
    from b2txt_tpu.runtime import NativeLexiconBeamSearch
    from b2txt_tpu.utils.config import DecodeConfig

    cfg = DecodeConfig(
        acoustic_scale=0.325, blank_penalty=90.0, nbest=args.nbest,
        beam_width=args.beam_width, beam=17.0, first_beam_size=8,
        sum_mode=False,
    )
    B, T = args.device_batch, args.bins
    gains = [float(g) for g in args.gains.split(",")]

    max_h = args.max_homophones or (
        6 if (args.adversarial or args.real_lexicon) else 4)
    args.max_homophones = max_h
    (lex, lm, lm_unpruned, wl, arpa, arpa_unpruned, lexp, rng,
     _) = BW.build_world(args.vocab, args.order,
                         adversarial=args.adversarial,
                         real_lexicon=args.real_lexicon)
    utts = BW.make_planted_utts(lex, wl, rng, args.utts, T)
    batches = []
    for start in range(0, len(utts), B):
        chunk = utts[start : start + B]
        lab = np.stack([l for _, l in chunk] + [chunk[0][1]] * (B - len(chunk)))
        batches.append((lab, len(chunk), [s for s, _ in chunk]))
    keys = [jax.random.PRNGKey(1000 + j) for j in range(len(batches))]
    all_sents = [s for _, _, sents in batches for s in sents]

    native = NativeLexiconBeamSearch(arpa, lexp, cfg,
                                     max_homophones=args.max_homophones,
                                     rescore_arpa=arpa_unpruned)
    lattice = None
    if args.lattice:
        lat_cfg = cfg.replace(beam_width=args.lattice_width,
                              lattice_beam=12.0, lattice_nbest=True)
        lattice = NativeLexiconBeamSearch(
            arpa, lexp, lat_cfg, max_homophones=args.max_homophones,
            rescore_arpa=arpa_unpruned, state_key="ngram")
    dev = DeviceLexiconBeamSearch(lex, lm, cfg,
                                  max_homophones=args.max_homophones,
                                  rescore_lm=lm_unpruned,
                                  state_key=args.state_key)
    plens = None
    ladder = []
    for gain in gains:
        run1, P, _ = BW.make_stage1(B, T, head_gain=gain,
                                    blank_bias=args.blank_bias)
        if plens is None or plens[0] != P:
            plens = np.full((B,), P, np.int32)
        host_logits, staged = [], []
        for j, (lab, n_real, _) in enumerate(batches):
            lp, _ = run1(lab, keys[j])
            staged.append(lp)
            arr = np.asarray(lp)
            host_logits.extend(arr[i] for i in range(n_real))

        nat_results = []
        t0 = time.perf_counter()
        for lp in host_logits:
            native.reset()
            native.decode(lp)
            nat_results.append(native.finish_decoding())
        nat_s = time.perf_counter() - t0

        dev_results = []
        t0 = time.perf_counter()
        for (lab, n_real, _), res in zip(
            batches, dev.decode_batches([(lp, plens) for lp in staged])
        ):
            dev_results.extend(res[:n_real])
        dev_s = time.perf_counter() - t0

        row = {"gain": gain, "blank_bias": args.blank_bias,
               "utts": len(utts), "decode_frames": int(P)}
        backends = [("native", nat_results, nat_s),
                    ("device", dev_results, dev_s)]
        if lattice is not None:
            lat_results = []
            t0 = time.perf_counter()
            for lp in host_logits:
                lattice.reset()
                lattice.decode(lp)
                lat_results.append(lattice.finish_decoding())
            backends.append(
                ("lattice", lat_results, time.perf_counter() - t0))
        for name, res, dt in backends:
            correct, serr = BW.score_results(cfg, all_sents, res)
            wer, lo, hi = BW.aggregate_wer(all_sents, res)
            depth, oracle = pool_metrics(res, all_sents)
            row[name] = {
                "exact": f"{correct}/{len(utts)}",
                "search_errors": serr,
                "wer": round(wer, 4),
                "wer_ci": [round(lo, 4), round(hi, 4)],
                "pool_depth_mean": round(depth, 1),
                "oracle_wer": round(oracle, 4),
                "sentences_per_s": round(len(utts) / dt, 2),
            }
        row["top1_agreement"] = round(
            float(np.mean([
                (d[0].sentence if d else "") == (n[0].sentence if n else "")
                for d, n in zip(dev_results, nat_results)
            ])), 4,
        )
        ladder.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "summary": "quality_ladder",
        "vocab": args.vocab, "order": args.order,
        "beam_width": args.beam_width, "nbest": args.nbest,
        "backend": jax.default_backend(),
        "gains": gains,
        "device_wer_by_gain": {str(r["gain"]): r["device"]["wer"]
                               for r in ladder},
        "native_wer_by_gain": {str(r["gain"]): r["native"]["wer"]
                               for r in ladder},
        "min_top1_agreement": min(r["top1_agreement"] for r in ladder),
    }), flush=True)


if __name__ == "__main__":
    main()
