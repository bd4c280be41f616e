"""Smaller parity components: number-to-words, letter lexicon, profiling,
batched device decode, analysis stats."""

import os

import numpy as np
import pytest

from b2txt_tpu.lm.corpus import convert_numbers_to_words, number_to_words
from b2txt_tpu.lm import Lexicon, train_ngram
from b2txt_tpu.utils.profiling import StageTimer


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(13) == "thirteen"
    assert number_to_words(42) == "forty two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(1234) == "one thousand two hundred thirty four"
    assert number_to_words(1000000) == "one million"
    assert number_to_words(-5) == "minus five"


def test_convert_numbers_in_text():
    assert convert_numbers_to_words("i have 2 cats") == "i have two cats"
    assert convert_numbers_to_words("1,000 things") == "one thousand things"


def test_letter_lexicon():
    lex = Lexicon.letters()
    assert len(lex.words) == 26
    from b2txt_tpu.lm.lexicon import PHONE_TO_ID

    node = 0
    for p in ["EY"]:
        node = lex.next[node, PHONE_TO_ID[p]]
    assert lex.words[lex.node_words(int(node))[0]] == "a"
    ids = lex.sentence_to_phonemes("a b")
    assert ids is not None and len(ids) > 3


def test_stage_timer():
    t = StageTimer()
    with t.stage("x"):
        pass
    with t.stage("x"):
        pass
    s = t.summary()
    assert s["x"]["count"] == 2
    assert s["x"]["total_s"] >= 0


def test_batched_device_decode_matches_streaming():
    from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch
    from b2txt_tpu.utils.config import DecodeConfig

    LEX = {"the": ["DH", "AH"], "cat": ["K", "AE", "T"], "mat": ["M", "AE", "T"]}
    CORPUS = [["the", "cat"], ["the", "mat"], ["the", "cat"]] * 4
    lexicon = Lexicon.from_words(LEX)
    lm = train_ngram(CORPUS, order=2)
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=3, beam_width=16)
    dev = DeviceLexiconBeamSearch(lexicon, lm, cfg)

    def lp_for(s):
        ids = lexicon.sentence_to_phonemes(s)
        rows = []
        for pid in ids:
            for _ in range(2):
                r = np.full(41, -8.0, np.float32)
                r[pid] = 0.0
                rows.append(r)
            b = np.full(41, -8.0, np.float32)
            b[0] = 0.0
            rows.append(b)
        lp = np.stack(rows)
        return lp - np.log(np.exp(lp).sum(-1, keepdims=True))

    sents = ["the cat", "the mat"]
    lps = [lp_for(s) for s in sents]
    T = max(l.shape[0] for l in lps)
    batch = np.full((2, T, 41), -20.0, np.float32)
    lens = np.array([l.shape[0] for l in lps], np.int32)
    for i, l in enumerate(lps):
        batch[i, : l.shape[0]] = l

    res = dev.decode_batch(batch, lens)
    for s, r in zip(sents, res):
        assert r[0].sentence == s
    # equals the streaming path
    for i, s in enumerate(sents):
        dev.reset()
        dev.decode(lps[i])
        r1 = dev.finish_decoding()
        assert r1[0].sentence == res[i][0].sentence
        np.testing.assert_allclose(r1[0].ac_score, res[i][0].ac_score, rtol=1e-5)


def test_analysis_stats():
    from b2txt_tpu.analysis import per_day_error_rates, words_per_minute

    refs = [["a", "b"], ["a", "b", "c"], ["x"]]
    hyps = [["a", "b"], ["a", "c", "c"], ["y"]]
    days = ["d1", "d1", "d2"]
    out = per_day_error_rates(refs, hyps, days, n_resamples=100)
    np.testing.assert_allclose(out["d1"][0], 1 / 5)
    np.testing.assert_allclose(out["d2"][0], 1.0)
    wpm = words_per_minute([10, 20], [60.0, 60.0], ["d1", "d1"])
    np.testing.assert_allclose(wpm["d1"], 15.0)


def test_figure_rendering(tmp_path):
    """analysis.plots renders every fig-2/fig-4 panel to a real PNG
    (reference: analyses/figure_2.ipynb cells 5/7/8, figure_4.ipynb 3/5/7/8)."""
    import numpy as np

    from b2txt_tpu.analysis.plots import (
        plot_correctness_by_day,
        plot_correctness_pie,
        plot_cumulative_usage,
        plot_error_rates_by_day,
        plot_logit_raster,
        plot_wpm_by_day,
    )

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((120, 41)).astype(np.float32)
    paths = {
        "raster": tmp_path / "raster.png",
        "rates": tmp_path / "rates.png",
        "usage": tmp_path / "usage.png",
        "pie": tmp_path / "pie.png",
        "byday": tmp_path / "byday.png",
        "wpm": tmp_path / "wpm.png",
    }
    plot_logit_raster(logits, title="demo", path=str(paths["raster"]))
    plot_error_rates_by_day(
        {"50_word": {"d1": (0.02, 0.01, 0.04), "d2": (0.05, 0.02, 0.08)},
         "125k_word": {"d1": (0.08, 0.05, 0.11), "d2": (0.12, 0.08, 0.16)}},
        path=str(paths["rates"]),
    )
    plot_cumulative_usage([1, 5, 9], [1.0, 2.5, 4.0], [30, 80, 140],
                          path=str(paths["usage"]))
    plot_correctness_pie({"Fully correct": 70, "Mostly correct": 20,
                          "Incorrect": 10}, path=str(paths["pie"]))
    plot_correctness_by_day([1, 5, 9],
                            {"Fully correct": [8, 9, 7], "Incorrect": [2, 1, 3]},
                            [10, 10, 10], path=str(paths["byday"]))
    plot_wpm_by_day({"d1": 30.5, "d2": 42.0}, path=str(paths["wpm"]))
    for name, p in paths.items():
        assert p.exists() and p.stat().st_size > 5000, name


def test_notebook_pickle_formats(tmp_path):
    """analysis.notebook_data consumes the reference's t15_copyTask /
    t15_personalUse pickle schemas (figure_2.ipynb cell 3-8, figure_4.ipynb
    cell 3-8) and renders every panel; harness trials export back into the
    copy-task schema."""
    import numpy as np

    from b2txt_tpu.analysis.notebook_data import (
        copy_task_error_rates,
        export_copy_task_pickle,
        load_pickle,
        personal_use_summary,
        render_figure_2,
        render_figure_4,
    )
    from b2txt_tpu.evaluate.harness import TrialEval

    rng = np.random.default_rng(0)
    # t15_copyTask schema
    dat = {
        "post_implant_day": [100, 100, 150, 150],
        "vocab_size": [50, 125000, 50, 125000],
        "cue_sentence": ["the cat", "the mat", "a hat", "the cat"],
        "cue_sentence_phonemes": [["DH", "AH", "SIL", "K", "AE", "T", "SIL"]] * 4,
        "decoded_phonemes_raw": [["DH", "AH", "SIL", "K", "AE", "T", "SIL"]] * 3
        + [["DH", "AH", "SIL", "M", "AE", "T", "SIL"]],
        "decoded_sentence": ["the cat", "the mat", "a hat", "the mat"],
        "decoded_logits": [rng.standard_normal((60, 41)).astype(np.float32)
                           for _ in range(4)],
    }
    rates = copy_task_error_rates(dat, "WER", n_resamples=200)
    assert set(rates) == {50, 125000}
    paths = render_figure_2(dat, str(tmp_path / "f2"), n_resamples=200)
    assert all(os.path.getsize(p) > 5000 for p in paths)

    # t15_personalUse schema
    dat4 = {
        "trialized_info": {
            "correctness_rating": ["correct", "correct", "mostly correct",
                                   "incorrect", "one word wrong", "correct"],
            "post_implant_day": [100, 100, 100, 150, 150, 150],
        },
        "total_use_time": 10.0,
        "total_trial_count": 6,
    }
    s = personal_use_summary(dat4)
    assert s["counts"]["correct"] == 3 and s["n_trials_by_day"] == [3, 3]
    paths = render_figure_4(dat4, str(tmp_path / "f4"))
    assert all(os.path.getsize(p) > 5000 for p in paths)

    # harness trials -> copy-task pickle round trip
    trials = [
        TrialEval(session="s", day_idx=0, block_num=1, trial_num=i,
                  logits=rng.standard_normal((40, 41)).astype(np.float32),
                  decoded_ids=[10, 3, 40], true_ids=[10, 3, 40],
                  sentence_label="the", decoded_sentence="the")
        for i in range(3)
    ]
    pkl = str(tmp_path / "copy.pkl")
    exported = export_copy_task_pickle(trials, pkl, vocab_size=50)
    loaded = load_pickle(pkl)
    assert loaded["cue_sentence"] == ["the"] * 3
    assert loaded["decoded_logits"][0].shape == (40, 41)
    r2 = copy_task_error_rates(loaded, "PER", n_resamples=100)
    assert r2[50]["0"][0] == 0.0  # exact decode -> zero PER
