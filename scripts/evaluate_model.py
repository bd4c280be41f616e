#!/usr/bin/env python
"""Evaluate a trained checkpoint over sessions: greedy PER, optional LM decode
+ WER, competition CSV (reference: model_training/evaluate_model.py CLI).

Examples:
  python scripts/evaluate_model.py --model_path trained_models/baseline_rnn \
      --data_dir data/hdf5_data_final --eval_type val --csv_path out.csv
  ... --lm_dir lm/openwebtext_3gram --rescore --nbest 100
"""

import argparse
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True,
                   help="dir with checkpoint/best_checkpoint + checkpoint/args.yaml, "
                        "or a reference PyTorch checkpoint dir")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--eval_type", default="val", choices=["val", "test"])
    p.add_argument("--csv_path", default=None)
    p.add_argument("--lm_dir", default=None,
                   help="dir with lm.arpa (+ optional lm_unpruned.arpa, lexicon.txt); "
                        "enables beam-search decoding + WER")
    p.add_argument("--acoustic_scale", type=float, default=0.325)
    p.add_argument("--blank_penalty", type=float, default=90.0)
    p.add_argument("--alpha", type=float, default=0.55)
    p.add_argument("--nbest", type=int, default=100)
    p.add_argument("--beam_width", type=int, default=128)
    p.add_argument("--rescore", action="store_true")
    p.add_argument("--do_opt", action="store_true", help="LLM rescoring (transformers)")
    p.add_argument("--opt_model", default="facebook/opt-6.7b")
    p.add_argument("--opt_cache_dir", default=None)
    p.add_argument("--llm_group", type=int, default=96,
                   help="group up to this many n-best candidates across "
                        "utterances per LLM call on batched paths "
                        "(output-identical; 0 = one call per utterance)")
    p.add_argument("--searcher", default="native",
                   choices=["native", "device", "python"],
                   help="beam-search backend: native C++ host decoder "
                        "(default), TPU-resident batched searcher, or the "
                        "Python oracle")
    args = p.parse_args()

    from b2txt_tpu.evaluate import evaluate_sessions, write_competition_csv
    from b2txt_tpu.train.checkpoint import load_checkpoint
    from b2txt_tpu.utils import TrainConfig

    ckpt_path = os.path.join(args.model_path, "checkpoint", "best_checkpoint")
    args_yaml = os.path.join(args.model_path, "checkpoint", "args.yaml")
    cfg = TrainConfig.load(args_yaml)
    try:
        params = load_checkpoint(ckpt_path)["params"]
    except Exception:
        # reference torch checkpoint (zip/pickle protocol differs)
        from b2txt_tpu.models import load_torch_checkpoint

        params = load_torch_checkpoint(ckpt_path)
        print(f"Loaded reference PyTorch checkpoint: {ckpt_path}")

    decoder = None
    if args.lm_dir:
        from b2txt_tpu.lm import Lexicon, NGramLM
        from b2txt_tpu.serve import DecoderService
        from b2txt_tpu.utils.config import DecodeConfig

        lm = NGramLM.from_arpa(os.path.join(args.lm_dir, "lm.arpa"))
        lex_path = os.path.join(args.lm_dir, "lexicon.txt")
        lexicon = Lexicon.from_file(lex_path, vocab=lm.vocab)
        rescore_lm = None
        unpruned = os.path.join(args.lm_dir, "lm_unpruned.arpa")
        if args.rescore and os.path.exists(unpruned):
            rescore_lm = NGramLM.from_arpa(unpruned)
        llm = None
        if args.do_opt:
            from b2txt_tpu.decode.rescore import TorchCausalLMRescorer

            llm = TorchCausalLMRescorer(args.opt_model, cache_dir=args.opt_cache_dir)
        dcfg = DecodeConfig(
            acoustic_scale=args.acoustic_scale, blank_penalty=args.blank_penalty,
            alpha=args.alpha, nbest=args.nbest, beam_width=args.beam_width,
            rescore=args.rescore and rescore_lm is not None, do_opt=args.do_opt,
        )
        decoder = DecoderService(
            lexicon, lm, dcfg, rescore_lm=rescore_lm, llm=llm,
            channel_order="model", searcher_backend=args.searcher,
            arpa_path=os.path.join(args.lm_dir, "lm.arpa"),
            lexicon_path=lex_path,
            llm_group_candidates=args.llm_group,
        )

    out = evaluate_sessions(
        params, cfg, args.data_dir, eval_type=args.eval_type, decoder=decoder,
        verbose=True,
    )
    if "greedy_PER" in out:
        print(f"Aggregate greedy PER: {out['greedy_PER']:.4f}")
        for s, v in out.get("day_PER", {}).items():
            print(f"  {s}: {v:.4f}")
    if "WER" in out:
        lo, hi = out["WER_CI"]
        print(f"Aggregate WER: {out['WER']:.4f}  (95% CI {lo:.4f}–{hi:.4f})")
        print(f"LM decode throughput: {out['sentences_per_sec']:.2f} sentences/s")
    if args.csv_path:
        write_competition_csv(out["trials"], args.csv_path)
        print(f"Wrote {args.csv_path}")


if __name__ == "__main__":
    main()
