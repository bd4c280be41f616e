#!/usr/bin/env python
"""Large-LM scale drive: build → load → decode a ≥100M-entry ARPA n-gram.

The reference holds its 5-gram in SRILM's in-memory representation at ~300 GB
RAM (reference README.md:101). The native runtime packs each n-gram into one
16-byte sorted record (runtime/decoder.cc NGramLM::Rec), so the same entry
count costs ~1.6 GB per 100M n-grams plus the vocabulary table. This drive
generates a synthetic ARPA at that scale, loads it through the production
loader, reports RSS bytes/entry, and decodes through the full beam search to
prove the packed tables serve the hot path.

  python scripts/drive_large_lm.py --entries 100000000 --vocab 50000 --order 5 --device
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def rss_bytes() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) * 1024
    return 0


def write_arpa(path: str, vocab: int, counts: "list[int]",
               words: "list[str] | None" = None) -> int:
    """Unique synthetic n-grams up to order len(counts)+1: 1-grams = vocab;
    higher orders enumerate word chains w_i, w_{i+1+d}, w_{i+2+d+e}, ... by
    deterministic successor offsets (unique by construction), so the decoder
    walking a chain w_s w_{s+1} w_{s+2} … hits real max-order entries while
    off-chain queries exercise the backoff path. counts = [n2, n3, n4, n5…].
    ``words`` overrides the synthetic vocabulary (e.g. the real CMUdict word
    list for the production-scale dryrun).

    Reference analogue: the production 5-gram held in ~300 GB SRILM RAM
    (README.md:101, language_model/README.md:47)."""
    rng = np.random.default_rng(0)
    if words is None:
        words = [f"w{i:06d}" for i in range(vocab)]
    else:
        words = list(words)[:vocab]
        vocab = len(words)
    order = len(counts) + 1
    t0 = time.time()
    written = [0] * (order + 1)  # per gram order
    with open(path, "w", buffering=1 << 22) as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={vocab + 3}\n")
        for k, n in enumerate(counts):
            f.write(f"ngram {k + 2}={n}\n")
        f.write("\n\\1-grams:\n")
        f.write("-2.0 <s> -0.5\n-2.0 </s>\n-7.0 <unk>\n")
        uni = -np.log10(vocab) - rng.random(vocab).astype(np.float32)
        for i in range(0, vocab, 100000):
            f.write("".join(
                f"{uni[j]:.4f} {words[j]} -0.40\n"
                for j in range(i, min(i + 100000, vocab))
            ))
        written[1] = vocab + 3

        for k, n_k in enumerate(counts):
            g = k + 2  # gram order of this section
            f.write(f"\n\\{g}-grams:\n")
            per = -(-n_k // vocab)  # entries rooted at each start word
            done = 0
            bow = " -0.30" if g < order else ""
            for i in range(vocab):
                if done >= n_k:
                    break
                m = min(per, n_k - done)
                ps = -0.8 - 2.0 * rng.random(m).astype(np.float32)
                rows = []
                for d in range(m):
                    # chain: i, i+1, i+2, …, i+g-2, then a varying tail
                    chain = [words[(i + t) % vocab] for t in range(g - 1)]
                    chain.append(words[(i + g - 2 + 1 + d) % vocab])
                    rows.append(f"{ps[d]:.4f} {' '.join(chain)}{bow}\n")
                f.write("".join(rows))
                done += m
            written[g] = done
    n_total = sum(written)
    print(f"ARPA written: order {order}, {n_total:,} entries, "
          f"{os.path.getsize(path) / 1e9:.2f} GB in {time.time() - t0:.0f}s",
          flush=True)
    return n_total


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--entries", type=int, default=100_000_000)
    p.add_argument("--vocab", type=int, default=50_000)
    p.add_argument("--order", type=int, default=3, choices=[2, 3, 4, 5])
    p.add_argument("--arpa", default="/tmp/large_lm.arpa")
    p.add_argument("--keep", action="store_true")
    p.add_argument("--device", action="store_true",
                   help="also load into DeviceNGram (HBM tables) and decode "
                        "through DeviceLexiconBeamSearch on the chip")
    p.add_argument("--skip_native", action="store_true")
    p.add_argument("--reuse_arpa", action="store_true",
                   help="reuse an existing --arpa file from a prior --keep run")
    args = p.parse_args()

    from b2txt_tpu.runtime import NativeLexiconBeamSearch
    from b2txt_tpu.utils.config import DecodeConfig
    from b2txt_tpu.utils.phonemes import LOGIT_TO_PHONEME

    # split higher-order entries: 30% bigrams, rest spread over 3..order
    rest = args.entries - args.vocab - 3
    n2 = rest * 3 // 10
    hi = args.order - 2  # number of sections above 2-grams
    counts = [n2] + [(rest - n2) // hi] * hi if hi else [rest]
    counts[-1] += rest - sum(counts)
    if args.reuse_arpa and os.path.exists(args.arpa):
        print(f"reusing {args.arpa}", flush=True)
    else:
        write_arpa(args.arpa, args.vocab, counts)

    # lexicon: random unique pronunciations for the full vocab
    rng = np.random.default_rng(1)
    phones = LOGIT_TO_PHONEME[1:40]
    lexp = args.arpa + ".lexicon.txt"
    prons = {}
    with open(lexp, "w", buffering=1 << 20) as f:
        for i in range(args.vocab):
            L = int(rng.integers(3, 8))
            pron = [phones[j] for j in rng.integers(0, 39, L)]
            f.write(f"W{i:06d}  {' '.join(pron)}\n")
            prons[f"w{i:06d}"] = pron

    from b2txt_tpu.lm.lexicon import PHONE_TO_ID

    def make_utt(rng):
        """Words along the consecutive chains so the LM walk hits max-order
        entries; off-chain transitions exercise the backoff path."""
        start = int(rng.integers(0, args.vocab))
        ws = [f"w{(start + k) % args.vocab:06d}" for k in range(5)]
        ids = []
        for w in ws:
            ids.extend(PHONE_TO_ID[p] for p in prons[w])
            ids.append(40)
        rows = []
        for pid in ids:
            for _ in range(2):
                r = np.full(41, -12.0, np.float32); r[pid] = 0.0; rows.append(r)
            b = np.full(41, -12.0, np.float32); b[0] = 0.0; rows.append(b)
        lp = np.stack(rows)
        return " ".join(ws), lp - np.log(np.exp(lp).sum(-1, keepdims=True))

    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=10,
                       beam_width=128, beam=17.0, first_beam_size=8)

    if not args.skip_native:
        rss0 = rss_bytes()
        t0 = time.time()
        dec = NativeLexiconBeamSearch(args.arpa, lexp, cfg)
        load_s = time.time() - t0
        rss = rss_bytes() - rss0
        entries = dec.lm_entries
        print(f"native loaded {entries:,} entries in {load_s:.0f}s; "
              f"RSS +{rss / 1e9:.2f} GB = {rss / max(entries, 1):.1f} B/entry",
              flush=True)

        n_utts, correct = 24, 0
        t0 = time.time()
        for u in range(n_utts):
            sent, lp = make_utt(rng)
            dec.reset()
            dec.decode(lp)
            r = dec.finish_decoding()
            correct += bool(r) and r[0].sentence == sent
        dt = time.time() - t0
        print(json.dumps({
            "backend": "native", "order": args.order,
            "entries": entries, "rss_gb": round(rss / 1e9, 2),
            "bytes_per_entry": round(rss / max(entries, 1), 1),
            "load_s": round(load_s, 1),
            "decode_sentences_per_sec": round(n_utts / dt, 2),
            "decode_exact": f"{correct}/{n_utts}",
        }), flush=True)
        del dec

    if args.device:
        os.makedirs(os.path.expanduser("~/.cache/jax_comp_cache"),
                    exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch
        from b2txt_tpu.lm import Lexicon
        from b2txt_tpu.lm.device_ngram import DeviceNGram

        t0 = time.time()
        lex = Lexicon.from_words(prons)
        lex_s = time.time() - t0
        t0 = time.time()
        dev_lm = DeviceNGram.from_arpa_streaming(args.arpa, lex)
        tab, cap = dev_lm.table
        hbm = tab.size * 4 + dev_lm.uni_logp.size * 8
        load_s = time.time() - t0
        n_dev = dev_lm.n_entries  # counted at build — never fetch the
        # multi-GB table back through the tunnel just to count it
        print(f"device LM: {n_dev:,} entries streamed+packed in {load_s:.0f}s; "
              f"HBM {hbm / 1e9:.2f} GB = {hbm / max(n_dev, 1):.1f} B/entry "
              f"(lexicon {lex_s:.0f}s)", flush=True)

        t0 = time.time()
        dev = DeviceLexiconBeamSearch(lex, None, cfg, dev_lm=dev_lm,
                                      max_homophones=2)
        build_s = time.time() - t0
        B = 16
        utts = [make_utt(rng) for _ in range(B * 2)]
        T = max(lp.shape[0] for _, lp in utts)
        n_done = correct = 0
        t_first = None
        t0 = time.time()
        for s0 in range(0, len(utts), B):
            chunk = utts[s0 : s0 + B]
            lens = np.array([lp.shape[0] for _, lp in chunk], np.int32)
            arr = np.full((B, T, 41), -20.0, np.float32)
            for i, (_, lp) in enumerate(chunk):
                arr[i, : lp.shape[0]] = lp
            res = dev.decode_batch(arr, lens)
            if t_first is None:
                t_first = time.time() - t0  # includes compile
                t0 = time.time()
                continue
            for (sent, _), r in zip(chunk, res):
                n_done += 1
                correct += bool(r) and r[0].sentence == sent
        dt = time.time() - t0
        print(json.dumps({
            "backend": "device", "order": args.order,
            "entries": n_dev, "hbm_gb": round(hbm / 1e9, 2),
            "hbm_bytes_per_entry": round(hbm / max(n_dev, 1), 1),
            "stream_pack_s": round(load_s, 1),
            "trie_build_s": round(build_s + lex_s, 1),
            "compile_s": round(t_first or 0, 1),
            "decode_sentences_per_sec": round(n_done / dt, 2),
            "decode_exact": f"{correct}/{n_done}",
        }), flush=True)

    if not args.keep:
        os.remove(args.arpa)
        os.remove(lexp)


if __name__ == "__main__":
    main()
