#!/usr/bin/env python
"""Figure 2 / Figure 4 reproductions over harness outputs
(reference: analyses/figure_2.ipynb, figure_4.ipynb).

Runs the full synthetic pipeline (train → eval → LM decode), then produces the
papers' aggregate statistics — per-day WER with bootstrap CIs by vocabulary
condition (fig 2a/b), a logit raster (fig 2c), and usage/WPM summaries
(fig 4) — and renders plots when matplotlib is available.

  python examples/figures_demo.py [output_dir]
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

import jax

# Tiny demo model — CPU avoids the remote-TPU compile latency.
jax.config.update("jax_platforms", "cpu")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    os.makedirs(out_dir, exist_ok=True)

    from b2txt_tpu.analysis import (
        cumulative_usage,
        logit_raster,
        per_day_error_rates,
        vocab_condition_comparison,
        words_per_minute,
    )
    from b2txt_tpu.data import synthetic
    from b2txt_tpu.evaluate import evaluate_sessions
    from b2txt_tpu.lm import Lexicon, train_ngram
    from b2txt_tpu.serve import DecoderService
    from b2txt_tpu.train import Trainer
    from b2txt_tpu.utils import TrainConfig
    from b2txt_tpu.utils.config import DecodeConfig

    sessions = ["t15.2023.08.11", "t15.2023.08.13", "t15.2023.08.18"]
    data_dir = os.path.join(out_dir, "data")
    synthetic.write_synthetic_sessions(data_dir, sessions, trials_per_session=16,
                                       neural_dim=16)

    cfg = TrainConfig()
    cfg.model.n_input_features = 16
    cfg.model.n_units = 48
    cfg.model.n_layers = 2
    cfg.model.rnn_dropout = 0.0
    cfg.model.input_network.input_layer_dropout = 0.0
    cfg.dataset.neural_dim = 16
    cfg.dataset.sessions = sessions
    cfg.dataset.dataset_probability_val = [1, 1, 1]
    cfg.dataset.batch_size = 8
    cfg.dataset.days_per_batch = 2
    cfg.dataset.dataset_dir = data_dir
    cfg.dataset.data_transforms.white_noise_std = 0.1
    cfg.dataset.data_transforms.random_cut = 0
    cfg.num_training_batches = 120
    cfg.lr_decay_steps = cfg.lr_decay_steps_day = 120
    cfg.lr_warmup_steps = cfg.lr_warmup_steps_day = 10
    cfg.epsilon = 1e-8
    cfg.batches_per_val_step = 60
    cfg.use_amp = False
    cfg.output_dir = os.path.join(out_dir, "model")
    cfg.checkpoint_dir = os.path.join(out_dir, "model", "ckpt")

    print("Training small model on synthetic sessions...")
    trainer = Trainer(cfg)
    trainer.train()

    lexicon = Lexicon.from_words(synthetic.word_pronunciations())
    lm = train_ngram(synthetic.sentence_corpus(100), order=3)
    decoder = DecoderService(
        lexicon, lm,
        DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10,
                     beam_width=48),
        channel_order="model",
    )
    print("Evaluating with LM decode...")
    res = evaluate_sessions(trainer.params, cfg, data_dir, eval_type="val",
                            decoder=decoder)
    print(f"greedy PER={res['greedy_PER']:.3f}  WER={res['WER']:.3f}")

    # ---- Figure 2a/b: per-day WER by (synthetic) vocabulary condition ----
    trial_dicts = []
    from b2txt_tpu.utils.phonemes import remove_punctuation

    for t in res["trials"]:
        trial_dicts.append({
            "day": t.session,
            "corpus": "50_word" if t.block_num % 2 == 0 else "125k_word",
            "reference": t.sentence_label or "",
            "decoded": t.decoded_sentence or "",
        })
    fig2 = vocab_condition_comparison(trial_dicts, n_resamples=1000)
    for corpus, days in fig2.items():
        for day, (rate, lo, hi) in sorted(days.items()):
            print(f"fig2  {corpus:10s} {day}: WER {rate:.3f} [{lo:.3f}, {hi:.3f}]")

    # ---- Figure 2c: logit raster for one trial ----
    raster = logit_raster(res["trials"][0].logits)
    np.save(os.path.join(out_dir, "fig2c_probs.npy"), raster["probs"])

    # ---- Figure 4: usage statistics ----
    usage = cumulative_usage([1.5, 2.0, 1.0], [40, 55, 30])
    wpm = words_per_minute(
        [len((t.decoded_sentence or "").split()) for t in res["trials"]],
        [t.logits.shape[0] * 0.08 for t in res["trials"]],  # 80 ms per frame
        [t.session for t in res["trials"]],
    )
    print("fig4  cumulative hours:", usage["cumulative_hours"])
    print("fig4  WPM by day:", {k: round(v, 1) for k, v in wpm.items()})

    # ---- rendered figures (analysis.plots — fig 2 cells 5/7/8, fig 4 3/5/7/8)
    from b2txt_tpu.analysis.plots import (
        plot_correctness_by_day,
        plot_correctness_pie,
        plot_cumulative_usage,
        plot_error_rates_by_day,
        plot_logit_raster,
        plot_wpm_by_day,
    )
    from b2txt_tpu.utils.phonemes import rearrange_speech_logits

    t0 = res["trials"][0]
    plot_logit_raster(
        rearrange_speech_logits(t0.logits),
        title=f'{t0.session}, cue: "{t0.sentence_label}"',
        path=os.path.join(out_dir, "fig2c_logit_raster.png"),
    )
    plot_error_rates_by_day(
        fig2, metric="WER", path=os.path.join(out_dir, "fig2ab_wer_by_day.png")
    )
    plot_cumulative_usage(
        [1, 2, 3], usage["cumulative_hours"], usage["cumulative_sentences"],
        path=os.path.join(out_dir, "fig4ab_cumulative_use.png"),
    )
    correct = sum(
        1 for t in res["trials"]
        if remove_punctuation(t.decoded_sentence or "")
        == remove_punctuation(t.sentence_label or "")
    )
    plot_correctness_pie(
        {"Fully correct": correct, "Incorrect": len(res["trials"]) - correct},
        path=os.path.join(out_dir, "fig4c_correctness_pie.png"),
    )
    by_day = {}
    for t in res["trials"]:
        ok = (remove_punctuation(t.decoded_sentence or "")
              == remove_punctuation(t.sentence_label or ""))
        c, n = by_day.get(t.session, (0, 0))
        by_day[t.session] = (c + ok, n + 1)
    days_sorted = sorted(by_day)
    plot_correctness_by_day(
        range(len(days_sorted)),
        {"Fully correct": [by_day[d][0] for d in days_sorted],
         "Incorrect": [by_day[d][1] - by_day[d][0] for d in days_sorted]},
        [by_day[d][1] for d in days_sorted],
        path=os.path.join(out_dir, "fig4e_correctness_by_day.png"),
    )
    plot_wpm_by_day(wpm, path=os.path.join(out_dir, "fig4d_wpm_by_day.png"))
    print(f"Wrote 6 figure PNGs to {out_dir}")


if __name__ == "__main__":
    main()
