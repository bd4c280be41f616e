#!/usr/bin/env python
"""Large-LM scale drive: build → load → decode a ≥100M-entry ARPA n-gram.

The reference holds its 5-gram in SRILM's in-memory representation at ~300 GB
RAM (reference README.md:101). The native runtime packs each n-gram into one
16-byte sorted record (runtime/decoder.cc NGramLM::Rec), so the same entry
count costs ~1.6 GB per 100M n-grams plus the vocabulary table. This drive
generates a synthetic ARPA at that scale, loads it through the production
loader, reports RSS bytes/entry, and decodes through the full beam search to
prove the packed tables serve the hot path.

  python scripts/drive_large_lm.py --entries 100000000 --vocab 50000
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


def write_arpa(path: str, vocab: int, n2: int, n3: int) -> int:
    """Unique synthetic n-grams: 1-grams = vocab; 2/3-grams enumerated by
    deterministic successor offsets (unique by construction)."""
    rng = np.random.default_rng(0)
    words = [f"w{i:06d}" for i in range(vocab)]
    t0 = time.time()
    with open(path, "w", buffering=1 << 22) as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={vocab + 3}\n")
        f.write(f"ngram 2={n2}\n")
        f.write(f"ngram 3={n3}\n\n")
        f.write("\\1-grams:\n")
        f.write("-2.0 <s> -0.5\n-2.0 </s>\n-7.0 <unk>\n")
        uni = -np.log10(vocab) - rng.random(vocab).astype(np.float32)
        for i in range(0, vocab, 100000):
            f.write("".join(
                f"{uni[j]:.4f} {words[j]} -0.40\n"
                for j in range(i, min(i + 100000, vocab))
            ))
        f.write("\n\\2-grams:\n")
        per = -(-n2 // vocab)  # successors per word
        written = 0
        for i in range(vocab):
            if written >= n2:
                break
            k = min(per, n2 - written)
            ps = -1.0 - 2.0 * rng.random(k).astype(np.float32)
            f.write("".join(
                f"{ps[d]:.4f} {words[i]} {words[(i + 1 + d) % vocab]} -0.30\n"
                for d in range(k)
            ))
            written += k
        f.write("\n\\3-grams:\n")
        per3 = -(-n3 // n2)
        written3 = 0
        for i in range(vocab):
            if written3 >= n3:
                break
            for d in range(per):
                if written3 >= n3:
                    break
                j = (i + 1 + d) % vocab
                k = min(per3, n3 - written3)
                ps = -0.5 - 2.0 * rng.random(k).astype(np.float32)
                f.write("".join(
                    f"{ps[e]:.4f} {words[i]} {words[j]} {words[(j + 1 + e) % vocab]}\n"
                    for e in range(k)
                ))
                written3 += k
        f.write("\n\\end\\\n")
    n_total = vocab + 3 + written + written3
    print(f"ARPA written: {n_total:,} entries, "
          f"{os.path.getsize(path) / 1e9:.2f} GB in {time.time() - t0:.0f}s",
          flush=True)
    return n_total


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--entries", type=int, default=100_000_000)
    p.add_argument("--vocab", type=int, default=50_000)
    p.add_argument("--arpa", default="/tmp/large_lm.arpa")
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()

    from b2txt_tpu.runtime import NativeLexiconBeamSearch
    from b2txt_tpu.utils.config import DecodeConfig
    from b2txt_tpu.utils.phonemes import LOGIT_TO_PHONEME

    n2 = args.entries * 3 // 10
    n3 = args.entries - args.vocab - 3 - n2
    n_total = write_arpa(args.arpa, args.vocab, n2, n3)

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

    rss0 = rss_bytes()
    t0 = time.time()
    dec = NativeLexiconBeamSearch(
        args.arpa, lexp,
        DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=10,
                     beam_width=128, beam=17.0, first_beam_size=8),
    )
    load_s = time.time() - t0
    rss = rss_bytes() - rss0
    entries = dec.lm_entries
    print(f"loaded {entries:,} entries in {load_s:.0f}s; "
          f"RSS +{rss / 1e9:.2f} GB = {rss / max(entries, 1):.1f} B/entry",
          flush=True)

    # decode through the packed tables (words along the 2-gram successor
    # chains so the LM walk exercises hits and backoffs)
    from b2txt_tpu.lm.lexicon import PHONE_TO_ID

    n_utts, correct = 24, 0
    t0 = time.time()
    for u in range(n_utts):
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
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        dec.reset()
        dec.decode(lp)
        r = dec.finish_decoding()
        correct += bool(r) and r[0].sentence == " ".join(ws)
    dt = time.time() - t0
    print(json.dumps({
        "entries": entries, "rss_gb": round(rss / 1e9, 2),
        "bytes_per_entry": round(rss / max(entries, 1), 1),
        "load_s": round(load_s, 1),
        "decode_sentences_per_sec": round(n_utts / dt, 2),
        "decode_exact": f"{correct}/{n_utts}",
    }), flush=True)

    if not args.keep:
        os.remove(args.arpa)
        os.remove(lexp)


if __name__ == "__main__":
    main()
