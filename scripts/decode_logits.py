#!/usr/bin/env python
"""Offline decode of saved logits — the reference's
``brain_speech_decoder_main.cc`` CLI equivalent: load .npy logits (one file
per utterance, (T, 41) model channel order, or a single (N, T, 41) array),
run the fused beam search, write a hyp file.

Usage:
  python scripts/decode_logits.py --lm_dir lm/3gram --logits "logits/*.npy" \
      --out hyps.txt [--acoustic_scale 0.325 --blank_penalty 90 --nbest 10] \
      [--backend native|python|device]
"""

import argparse
import glob
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--lm_dir", required=True)
    p.add_argument("--logits", required=True, help="glob of .npy files")
    p.add_argument("--out", required=True)
    p.add_argument("--acoustic_scale", type=float, default=0.325)
    p.add_argument("--blank_penalty", type=float, default=90.0)
    p.add_argument("--ctc_blank_skip_threshold", type=float, default=1.0)
    p.add_argument("--length_penalty", type=float, default=0.0)
    p.add_argument("--nbest", type=int, default=10)
    p.add_argument("--beam_width", type=int, default=128)
    p.add_argument("--backend", default="native",
                   choices=["native", "python", "device"])
    args = p.parse_args()

    import os

    from b2txt_tpu.utils.config import DecodeConfig

    cfg = DecodeConfig(
        acoustic_scale=args.acoustic_scale, blank_penalty=args.blank_penalty,
        ctc_blank_skip_threshold=args.ctc_blank_skip_threshold,
        length_penalty=args.length_penalty, nbest=args.nbest,
        beam_width=args.beam_width,
    )
    arpa = os.path.join(args.lm_dir, "lm.arpa")
    lexp = os.path.join(args.lm_dir, "lexicon.txt")

    if args.backend == "native":
        from b2txt_tpu.runtime import NativeLexiconBeamSearch

        dec = NativeLexiconBeamSearch(arpa, lexp, cfg)
    else:
        from b2txt_tpu.lm import Lexicon, NGramLM

        lm = NGramLM.from_arpa(arpa)
        lexicon = Lexicon.from_file(lexp, vocab=lm.vocab)
        if args.backend == "python":
            from b2txt_tpu.decode.lmbeam import LexiconBeamSearch

            dec = LexiconBeamSearch(lexicon, lm, cfg)
        else:
            from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch

            dec = DeviceLexiconBeamSearch(lexicon, lm, cfg)

    files = sorted(glob.glob(args.logits))
    utterances = []
    for f in files:
        arr = np.load(f)
        if arr.ndim == 3:
            utterances.extend((f"{f}[{i}]", arr[i]) for i in range(arr.shape[0]))
        else:
            utterances.append((f, arr))

    t0 = time.time()
    with open(args.out, "w") as out:
        for name, logits in utterances:
            x = logits - logits.max(-1, keepdims=True)
            lp = x - np.log(np.exp(x).sum(-1, keepdims=True))
            dec.reset()
            dec.decode(lp.astype(np.float32))
            res = dec.finish_decoding()
            best = res[0].sentence if res else ""
            out.write(f"{name}\t{best}\n")
            print(f"{name}: {best}")
    dt = time.time() - t0
    print(f"Decoded {len(utterances)} utterances in {dt:.2f}s "
          f"({len(utterances)/max(dt,1e-9):.1f}/s) -> {args.out}")


if __name__ == "__main__":
    main()
