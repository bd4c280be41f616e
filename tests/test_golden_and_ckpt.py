"""Golden-CSV regression utilities, corpus join, orbax checkpoint backend,
and the eval-harness day-index mapping."""

import os

import numpy as np
import pytest

import jax

from b2txt_tpu.evaluate.golden import (
    compare_to_golden,
    corpus_for_session_block,
    load_corpus_map,
    read_submission_csv,
)


def test_submission_roundtrip(tmp_path):
    from b2txt_tpu.evaluate import TrialEval, write_competition_csv

    trials = [
        TrialEval(session="s", day_idx=0, block_num=0, trial_num=i,
                  logits=np.zeros((1, 41), np.float32), decoded_ids=[],
                  true_ids=None, sentence_label=None,
                  decoded_sentence=f"sentence {i}")
        for i in range(5)
    ]
    path = str(tmp_path / "sub.csv")
    write_competition_csv(trials, path)
    assert read_submission_csv(path) == [f"sentence {i}" for i in range(5)]


def test_compare_to_golden(tmp_path):
    import csv

    golden = ["the cat sat", "hello world", "good day"]
    path = str(tmp_path / "golden.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "text"])
        for i, t in enumerate(golden):
            w.writerow([i, t])

    perfect = compare_to_golden(golden, path, n_resamples=50)
    assert perfect["exact_match_rate"] == 1.0
    assert perfect["wer_vs_golden"] == 0.0

    off = compare_to_golden(["the cat sat", "hello there", "good day"], path,
                            n_resamples=50)
    assert off["exact_match_rate"] == pytest.approx(2 / 3)
    assert 0 < off["wer_vs_golden"] < 0.3


def test_corpus_map_from_reference_format(tmp_path):
    path = str(tmp_path / "desc.csv")
    with open(path, "w") as f:
        f.write("Session ID,Date,Block number,Number of trials,Split,Corpus\n")
        f.write("t15.2023.08.11,2023-08-11,4,10,Train,Switchboard\n")
        f.write("t15.2023.08.11,2023-08-11,5,10,Val,OpenWebText2\n")
    m = load_corpus_map(path)
    assert corpus_for_session_block(m, "t15.2023.08.11", 4) == "Switchboard"
    assert corpus_for_session_block(m, "t15.2023.08.11", 5) == "OpenWebText2"
    assert corpus_for_session_block(m, "t15.2023.08.13", 4) is None


def test_orbax_checkpoint_roundtrip(tmp_path):
    from b2txt_tpu.models import init_params
    from b2txt_tpu.train.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    params = init_params(
        jax.random.PRNGKey(0), neural_dim=8, n_units=8, n_days=2,
        n_classes=5, n_layers=1, patch_size=0, patch_stride=0,
    )
    path = str(tmp_path / "ckpt")
    save_checkpoint_orbax(path, params, step=7, val_per=0.25)
    back = load_checkpoint_orbax(path)
    assert back["step"] == 7 and back["val_PER"] == 0.25
    np.testing.assert_allclose(
        np.asarray(params["out_w"]), np.asarray(back["params"]["out_w"])
    )
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["w_hh"]),
        np.asarray(back["params"]["layers"][0]["w_hh"]),
    )


def test_harness_day_index_uses_training_list(tmp_path):
    """Evaluating a subset must feed the model the session's training-day
    index, not its position in the subset."""
    from b2txt_tpu.data import synthetic
    from b2txt_tpu.evaluate import evaluate_sessions
    from b2txt_tpu.models import init_params_from_config
    from b2txt_tpu.utils import TrainConfig

    sessions = ["t15.2023.08.11", "t15.2023.08.13", "t15.2023.08.18"]
    synthetic.write_synthetic_sessions(
        str(tmp_path), sessions, trials_per_session=3, neural_dim=8
    )
    cfg = TrainConfig()
    cfg.model.n_input_features = 8
    cfg.model.n_units = 8
    cfg.model.n_layers = 1
    cfg.model.patch_size = 4
    cfg.model.patch_stride = 2
    cfg.dataset.sessions = sessions
    params = init_params_from_config(
        jax.random.PRNGKey(0), cfg.model, n_days=3, n_classes=41
    )
    # make the day layers wildly different so the index matters
    import jax.numpy as jnp

    params["day_w"] = params["day_w"].at[2].multiply(3.7)

    full = evaluate_sessions(params, cfg, str(tmp_path), eval_type="val")
    sub = evaluate_sessions(params, cfg, str(tmp_path), eval_type="val",
                            sessions=[sessions[2]])
    full_third = [t for t in full["trials"] if t.session == sessions[2]]
    for a, b in zip(full_third, sub["trials"]):
        assert b.day_idx == 2
        np.testing.assert_allclose(a.logits, b.logits, rtol=1e-5)
