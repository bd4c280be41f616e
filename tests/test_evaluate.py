"""End-to-end evaluation: train on synthetic sessions → greedy PER →
LM-decoded WER → competition CSV. This is the framework's full-slice test
(SURVEY.md §7 'minimum end-to-end slice' and beyond)."""

import os

import numpy as np
import pytest

from b2txt_tpu.data import synthetic
from b2txt_tpu.evaluate import evaluate_sessions, write_competition_csv
from b2txt_tpu.lm import Lexicon, train_ngram
from b2txt_tpu.serve import DecoderService
from b2txt_tpu.train import Trainer
from b2txt_tpu.utils import TrainConfig
from b2txt_tpu.utils.config import DecodeConfig

SESSIONS = ["t15.2023.08.11", "t15.2023.08.13", "t15.2023.08.18"]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    synthetic.write_synthetic_sessions(
        str(tmp), SESSIONS, trials_per_session=20, neural_dim=16
    )
    cfg = TrainConfig()
    cfg.model.n_input_features = 16
    cfg.model.n_units = 64
    cfg.model.n_layers = 2
    cfg.model.rnn_dropout = 0.0
    cfg.model.input_network.input_layer_dropout = 0.0
    cfg.dataset.neural_dim = 16
    cfg.dataset.sessions = SESSIONS
    cfg.dataset.dataset_probability_val = [1, 1, 1]
    cfg.dataset.batch_size = 8
    cfg.dataset.days_per_batch = 2
    cfg.dataset.dataset_dir = str(tmp)
    cfg.dataset.data_transforms.white_noise_std = 0.05
    cfg.dataset.data_transforms.constant_offset_std = 0.0
    cfg.dataset.data_transforms.random_cut = 0
    cfg.num_training_batches = 120
    cfg.lr_decay_steps = 120
    cfg.lr_decay_steps_day = 120
    cfg.lr_warmup_steps = 10
    cfg.lr_warmup_steps_day = 10
    cfg.epsilon = 1e-8
    cfg.batches_per_train_log = 50
    cfg.batches_per_val_step = 60
    cfg.use_amp = False
    cfg.output_dir = str(tmp / "out")
    cfg.checkpoint_dir = str(tmp / "out" / "ckpt")
    trainer = Trainer(cfg)
    trainer.train()
    return str(tmp), cfg, trainer.params


def test_greedy_eval(trained):
    data_dir, cfg, params = trained
    out = evaluate_sessions(params, cfg, data_dir, eval_type="val")
    assert out["greedy_PER"] < 0.35, f"greedy PER too high: {out['greedy_PER']:.3f}"
    assert set(out["day_PER"].keys()) == set(SESSIONS)
    assert len(out["trials"]) == 3 * 20


def test_batched_matches_unbatched(trained):
    data_dir, cfg, params = trained
    a = evaluate_sessions(params, cfg, data_dir, eval_type="val",
                          sessions=SESSIONS[:1], batched=True)
    b = evaluate_sessions(params, cfg, data_dir, eval_type="val",
                          sessions=SESSIONS[:1], batched=False)
    assert len(a["trials"]) == len(b["trials"])
    for ta, tb in zip(a["trials"], b["trials"]):
        assert ta.decoded_ids == tb.decoded_ids
        np.testing.assert_allclose(ta.logits, tb.logits, rtol=1e-4, atol=1e-4)


def test_lm_decode_and_wer(trained):
    data_dir, cfg, params = trained
    lexicon = Lexicon.from_words(synthetic.word_pronunciations())
    lm = train_ngram(synthetic.sentence_corpus(100), order=3)
    decoder = DecoderService(
        lexicon, lm,
        DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10, beam_width=48),
        channel_order="model",
    )
    out = evaluate_sessions(
        params, cfg, data_dir, eval_type="val",
        sessions=SESSIONS[:1], decoder=decoder,
    )
    assert "WER" in out
    assert out["WER"] < 0.4, f"WER too high: {out['WER']:.3f}"
    assert out["sentences_per_sec"] > 0
    # every trial got a sentence
    assert all(t.decoded_sentence is not None for t in out["trials"])


def test_competition_csv(trained, tmp_path):
    data_dir, cfg, params = trained
    out = evaluate_sessions(params, cfg, data_dir, eval_type="val",
                            sessions=SESSIONS[:1])
    for t in out["trials"]:
        t.decoded_sentence = "hello world"
    path = str(tmp_path / "sub" / "submission.csv")
    write_competition_csv(out["trials"], path)
    import csv

    with open(path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["id", "text"]
    assert len(rows) == len(out["trials"]) + 1
    assert rows[1][1] == "hello world"


def test_native_decoder_through_harness(trained, tmp_path):
    """Production glue: eval harness -> DecoderService -> C++ native searcher."""
    import os
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    from b2txt_tpu.lm import train_ngram
    from b2txt_tpu.lm.lexicon import strip_stress
    from b2txt_tpu.runtime import NativeLexiconBeamSearch

    data_dir, cfg, params = trained
    prons = synthetic.word_pronunciations()
    lm = train_ngram(synthetic.sentence_corpus(100), order=3)
    arpa = str(tmp_path / "lm.arpa")
    lm.to_arpa(arpa)
    lexp = str(tmp_path / "lexicon.txt")
    with open(lexp, "w") as f:
        for w, pron in prons.items():
            f.write(f"{w.upper()}  {' '.join(strip_stress(pron))}\n")

    dcfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10,
                        beam_width=64)
    decoder = DecoderService(
        Lexicon.from_words(prons), lm, dcfg, channel_order="model"
    )
    decoder.searcher = NativeLexiconBeamSearch(arpa, lexp, dcfg)
    out = evaluate_sessions(
        params, cfg, data_dir, eval_type="val",
        sessions=SESSIONS[:1], decoder=decoder,
    )
    assert out["WER"] < 0.4, f"native-decoder WER too high: {out['WER']:.3f}"


def test_device_resident_harness_matches_host_path(trained):
    """device_resident=True: posteriors stay in HBM and feed the device
    searcher directly (only argmax ids are fetched); per-trial outputs match
    the host-path eval exactly."""
    data_dir, cfg, params = trained
    lexicon = Lexicon.from_words(synthetic.word_pronunciations())
    lm = train_ngram(synthetic.sentence_corpus(100), order=3)
    dcfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10,
                        beam_width=48)
    decoder = DecoderService(lexicon, lm, dcfg, channel_order="model",
                             searcher_backend="device")
    a = evaluate_sessions(params, cfg, data_dir, eval_type="val",
                          sessions=SESSIONS[:1], decoder=decoder,
                          device_resident=True)
    b = evaluate_sessions(params, cfg, data_dir, eval_type="val",
                          sessions=SESSIONS[:1], decoder=decoder)
    assert len(a["trials"]) == len(b["trials"])
    for ta, tb in zip(a["trials"], b["trials"]):
        assert ta.logits is None and tb.logits is not None
        assert ta.decoded_ids == tb.decoded_ids
        assert ta.decoded_sentence == tb.decoded_sentence
    assert abs(a["greedy_PER"] - b["greedy_PER"]) < 1e-12
    assert abs(a["WER"] - b["WER"]) < 1e-12


def test_device_resident_requires_device_backend(trained):
    data_dir, cfg, params = trained
    lexicon = Lexicon.from_words(synthetic.word_pronunciations())
    lm = train_ngram(synthetic.sentence_corpus(30), order=2)
    decoder = DecoderService(
        lexicon, lm, DecodeConfig(nbest=5, beam_width=16),
        channel_order="model",
    )
    with pytest.raises(ValueError):
        evaluate_sessions(params, cfg, data_dir, eval_type="val",
                          sessions=SESSIONS[:1], decoder=decoder,
                          device_resident=True)
