#!/usr/bin/env python
"""Standalone LM decode server speaking the reference's Redis protocol
(reference: language_model/language-model-standalone.py CLI, :793-824).

The --lm_path directory holds lm.arpa (+ optional lm_unpruned.arpa for
--rescore) and lexicon.txt — the ARPA/lexicon replace the reference's
TLG.fst/words.txt/G.fst artifacts.
"""

import argparse
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--lm_path", type=str, required=True)
    p.add_argument("--max_active", type=int, default=7000)
    p.add_argument("--min_active", type=int, default=200)
    p.add_argument("--beam", type=float, default=17.0)
    p.add_argument("--lattice_beam", type=float, default=8.0)
    p.add_argument("--ctc_blank_skip_threshold", type=float, default=1.0)
    p.add_argument("--length_penalty", type=float, default=0.0)
    p.add_argument("--acoustic_scale", type=float, default=0.3)
    p.add_argument("--nbest", type=int, default=100)
    p.add_argument("--beam_width", type=int, default=128)
    p.add_argument("--top_candidates_to_augment", type=int, default=20)
    p.add_argument("--score_penalty_percent", type=float, default=0.01)
    p.add_argument("--blank_penalty", type=float, default=9.0)
    p.add_argument("--rescore", action="store_true")
    p.add_argument("--do_opt", action="store_true")
    p.add_argument("--opt_model", type=str, default="facebook/opt-6.7b")
    p.add_argument("--opt_cache_dir", type=str, default=None)
    p.add_argument("--opt_backend", default="torch", choices=["torch", "jax"],
                   help="LLM rescorer: host transformers (reference parity) "
                   "or the TPU-resident JAX OPT (decode/opt_lm.py)")
    p.add_argument("--opt_weights", type=str, default=None,
                   help="(jax) torch state_dict file of OPT weights; "
                   "imported via params_from_hf and held bf16 in HBM")
    p.add_argument("--opt_vocab", type=str, default=None,
                   help="(jax) GPT-2 vocab.json for the byte-level BPE")
    p.add_argument("--opt_merges", type=str, default=None,
                   help="(jax) GPT-2 merges.txt")
    p.add_argument("--opt_random_init", action="store_true",
                   help="(jax) on-device random bf16 init instead of "
                   "--opt_weights — throughput benchmarking only")
    p.add_argument("--opt_size", default="6.7b", choices=["6.7b", "tiny"],
                   help="(jax) architecture shapes (tiny is the test config)")
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--searcher", default="native",
                   choices=["native", "device", "python"],
                   help="beam-search backend")
    p.add_argument("--redis_ip", type=str, default="localhost")
    p.add_argument("--redis_port", type=int, default=6379)
    p.add_argument("--input_stream", type=str, default="remote_lm_input")
    p.add_argument("--partial_output_stream", type=str, default="remote_lm_output_partial")
    p.add_argument("--final_output_stream", type=str, default="remote_lm_output_final")
    args = p.parse_args()

    from b2txt_tpu.lm import Lexicon, NGramLM
    from b2txt_tpu.serve import DecoderService
    from b2txt_tpu.serve.redis_adapter import RedisDecoderServer
    from b2txt_tpu.utils.config import DecodeConfig

    lm_path = os.path.expanduser(args.lm_path)
    lm = NGramLM.from_arpa(os.path.join(lm_path, "lm.arpa"))
    lexicon = Lexicon.from_file(os.path.join(lm_path, "lexicon.txt"), vocab=lm.vocab)
    rescore_lm = None
    unpruned = os.path.join(lm_path, "lm_unpruned.arpa")
    if args.rescore and os.path.exists(unpruned):
        rescore_lm = NGramLM.from_arpa(unpruned)
    llm = None
    if args.do_opt and args.opt_backend == "jax":
        import jax
        import jax.numpy as jnp

        from b2txt_tpu.decode.opt_lm import (
            OPTConfig, OPTRescorer, init_params, params_from_hf,
        )

        cfg_opt = (OPTConfig.opt_6_7b() if args.opt_size == "6.7b"
                   else OPTConfig.tiny())
        encode = None
        if args.opt_vocab and args.opt_merges:
            from b2txt_tpu.utils.bpe import ByteBPE

            encode = ByteBPE.for_opt(args.opt_vocab, args.opt_merges)
        if args.opt_weights:
            import torch

            sd = torch.load(args.opt_weights, map_location="cpu",
                            weights_only=False)
            if not isinstance(sd, dict):
                sd = sd.state_dict()
            elif "model_state_dict" in sd:
                sd = sd["model_state_dict"]
            params = params_from_hf(sd, cfg_opt)
            params = jax.device_put(jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16), params))
        elif args.opt_random_init:
            # init in HBM: shipping 13.3 GB through a slow host link is the
            # wrong default for a benchmark-only mode (bench_opt.py stage A)
            params = jax.jit(
                lambda k: init_params(k, cfg_opt, dtype=jnp.bfloat16)
            )(jax.random.PRNGKey(0))
        else:
            p.error("--opt_backend jax requires --opt_weights or "
                    "--opt_random_init")
        llm = OPTRescorer(cfg_opt, params=params, encode=encode,
                          compute_dtype=jnp.bfloat16)
    elif args.do_opt:
        from b2txt_tpu.decode.rescore import TorchCausalLMRescorer

        llm = TorchCausalLMRescorer(args.opt_model, cache_dir=args.opt_cache_dir)

    cfg = DecodeConfig(
        max_active=args.max_active, min_active=args.min_active, beam=args.beam,
        lattice_beam=args.lattice_beam, acoustic_scale=args.acoustic_scale,
        ctc_blank_skip_threshold=args.ctc_blank_skip_threshold,
        length_penalty=args.length_penalty, nbest=args.nbest,
        blank_penalty=args.blank_penalty, alpha=args.alpha,
        do_opt=args.do_opt, rescore=args.rescore and rescore_lm is not None,
        top_candidates_to_augment=args.top_candidates_to_augment,
        score_penalty_percent=args.score_penalty_percent,
        beam_width=args.beam_width,
    )
    service = DecoderService(
        lexicon, lm, cfg, rescore_lm=rescore_lm, llm=llm, channel_order="lm",
        searcher_backend=args.searcher,
        arpa_path=os.path.join(args.lm_path, "lm.arpa"),
        lexicon_path=os.path.join(args.lm_path, "lexicon.txt"),
    )

    server = RedisDecoderServer(
        service, args.redis_ip, args.redis_port,
        args.input_stream, args.partial_output_stream, args.final_output_stream,
    )
    server.run()


if __name__ == "__main__":
    main()
