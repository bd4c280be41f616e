#!/usr/bin/env python
"""First five minutes with b2txt_tpu, end to end on synthetic data.

Mirrors the reference's full user flow (train_model.py → evaluate_model.py →
language-model-standalone.py) in one runnable file:

  1. write reference-layout HDF5 sessions (synthetic — no t15 data needed)
  2. train a small day-adapted GRU with CTC (Trainer = rnn_trainer.py parity)
  3. build a 3-gram LM + lexicon from the corpus (SRILM/FST-free LM build)
  4. decode the val split with the lexicon+n-gram beam search through
     DecoderService (the language-model-standalone equivalent)
  5. report greedy PER and decoded WER, write the competition CSV

Runs on CPU in ~2 minutes (`python examples/quickstart.py`); on a real TPU
drop the force-CPU line. For the full-size production pipeline benchmarks see
bench.py and scripts/eval_45session_sim.py; for figure reproductions see
examples/figures_demo.py.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Comment this out to run on a real TPU (the axon plugin ignores
# JAX_PLATFORMS=cpu env — config update is the reliable switch):
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from b2txt_tpu.data import synthetic  # noqa: E402
from b2txt_tpu.evaluate import evaluate_sessions, write_competition_csv  # noqa: E402
from b2txt_tpu.lm import Lexicon, train_ngram  # noqa: E402
from b2txt_tpu.lm.lexicon import strip_stress  # noqa: E402
from b2txt_tpu.serve import DecoderService  # noqa: E402
from b2txt_tpu.train import Trainer  # noqa: E402
from b2txt_tpu.utils import TrainConfig  # noqa: E402
from b2txt_tpu.utils.config import DecodeConfig  # noqa: E402


def main(n_batches: int = 300) -> dict:
    root = tempfile.mkdtemp(prefix="b2t_quickstart_")
    sessions = ["t15.2023.08.11", "t15.2023.08.13"]

    # -- 1. data: reference-layout sessions (data_train.hdf5 + data_val.hdf5)
    synthetic.write_synthetic_sessions(
        root, sessions, trials_per_session=24, neural_dim=16,
        splits=("train", "val"),
    )

    # -- 2. config + training. TrainConfig mirrors every rnn_args.yaml knob;
    #    load_args_yaml() accepts the reference's YAML unchanged. Here: a
    #    small model so CPU training stays fast.
    cfg = TrainConfig()
    cfg.model.n_input_features = 16
    cfg.model.n_units = 48
    cfg.model.n_layers = 2
    cfg.model.rnn_dropout = 0.0
    cfg.model.input_network.input_layer_dropout = 0.0
    cfg.dataset.neural_dim = 16
    cfg.dataset.sessions = sessions
    cfg.dataset.dataset_probability_val = [1] * len(sessions)
    cfg.dataset.batch_size = 8
    cfg.dataset.days_per_batch = 2
    cfg.dataset.dataset_dir = root
    cfg.num_training_batches = n_batches
    cfg.lr_decay_steps = n_batches
    cfg.lr_decay_steps_day = n_batches
    cfg.lr_warmup_steps = 10
    cfg.lr_warmup_steps_day = 10
    cfg.epsilon = 1e-8  # tiny-model tweak; keep the reference 0.1 at full size
    cfg.batches_per_train_log = max(1, n_batches // 3)
    cfg.batches_per_val_step = max(1, n_batches // 2)
    cfg.use_amp = False
    cfg.output_dir = os.path.join(root, "out")
    cfg.checkpoint_dir = os.path.join(root, "out", "checkpoint")

    t0 = time.time()
    trainer = Trainer(cfg)
    stats = trainer.train()
    print(f"trained {cfg.num_training_batches} batches in "
          f"{time.time() - t0:.0f}s; best val PER "
          f"{min(stats['val_PERs']):.3f}")

    # -- 3. LM + lexicon from the corpus (replaces SRILM + T∘L∘G composition)
    lexicon = Lexicon.from_words(synthetic.word_pronunciations())
    lm = train_ngram(synthetic.sentence_corpus(200), order=3)
    arpa = os.path.join(root, "lm.arpa")
    lm.to_arpa(arpa)
    lexp = os.path.join(root, "lexicon.txt")
    with open(lexp, "w") as f:
        for w, pron in synthetic.word_pronunciations().items():
            f.write(f"{w.upper()}  {' '.join(strip_stress(pron))}\n")

    # -- 4+5. decode the val split and score. searcher_backend switches the
    #    same semantics between "python" (host oracle), "native" (C++), and
    #    "device" (TPU-resident) — see README "three interchangeable
    #    backends".
    dcfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=2.0, nbest=10,
                        beam_width=64)
    decoder = DecoderService(lexicon, lm, dcfg, channel_order="model",
                             searcher_backend="python")
    res = evaluate_sessions(trainer.params, cfg, root, eval_type="val",
                            decoder=decoder, compute_dtype=jnp.float32)
    csv_path = os.path.join(root, "submission.csv")
    write_competition_csv(res["trials"], csv_path)
    print(f"val trials: {len(res['trials'])}  greedy PER: "
          f"{res['greedy_PER']:.3f}  decoded WER: {res['WER']:.3f}")
    print(f"competition CSV: {csv_path}")
    return {"n_trials": len(res["trials"]), "greedy_PER": res["greedy_PER"],
            "WER": res["WER"], "csv_path": csv_path}


if __name__ == "__main__":
    main()
