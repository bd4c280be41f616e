"""Device (TPU-resident) LM-fused beam search vs the host oracle."""

import numpy as np
import pytest

from b2txt_tpu.decode.lmbeam import LexiconBeamSearch
from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch
from b2txt_tpu.lm import Lexicon, train_ngram
from b2txt_tpu.utils.config import DecodeConfig

LEX = {
    "the": ["DH", "AH"],
    "cat": ["K", "AE", "T"],
    "sat": ["S", "AE", "T"],
    "mat": ["M", "AE", "T"],
    "on": ["AA", "N"],
    "their": ["DH", "EH", "R"],
    "there": ["DH", "EH", "R"],
    "is": ["IH", "Z"],
    "hat": ["HH", "AE", "T"],
}
CORPUS = [
    "the cat sat on the mat".split(),
    "there is the cat".split(),
    "the cat is there".split(),
    "there is the mat".split(),
    "the cat sat on the hat".split(),
] * 4


@pytest.fixture(scope="module")
def lexicon():
    return Lexicon.from_words(LEX)


@pytest.fixture(scope="module")
def lm():
    return train_ngram(CORPUS, order=3)


def clean_logprobs(ids, n_classes=41, frames_per=3, hot=8.0, seed=None, noise=0.0):
    rng = np.random.default_rng(seed or 0)
    rows = []
    for pid in ids:
        for _ in range(frames_per):
            row = np.full(n_classes, -hot, np.float32)
            row[pid] = 0.0
            rows.append(row)
        blank = np.full(n_classes, -hot, np.float32)
        blank[0] = 0.0
        rows.append(blank)
    lp = np.stack(rows)
    if noise:
        lp = lp + noise * rng.standard_normal(lp.shape).astype(np.float32)
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


SENTENCES = [
    "the cat sat on the mat",
    "there is the cat",
    "the cat is there",
    "the mat",
]


@pytest.mark.parametrize("sentence", SENTENCES)
def test_device_matches_host_clean(lexicon, lm, sentence):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=5,
                       beam_width=64, beam=0.0)
    lp = clean_logprobs(lexicon.sentence_to_phonemes(sentence))

    host = LexiconBeamSearch(lexicon, lm, cfg)
    host.decode(lp)
    r_host = host.finish_decoding()

    dev = DeviceLexiconBeamSearch(lexicon, lm, cfg)
    dev.decode(lp)
    r_dev = dev.finish_decoding()

    assert r_dev[0].sentence == r_host[0].sentence == sentence
    np.testing.assert_allclose(r_dev[0].ac_score, r_host[0].ac_score, rtol=1e-4)
    np.testing.assert_allclose(r_dev[0].lm_score, r_host[0].lm_score, rtol=1e-4)
    # n-best sets agree on the top entries
    host_map = {r.sentence: r for r in r_host}
    for r in r_dev[:3]:
        assert r.sentence in host_map
        np.testing.assert_allclose(
            r.lm_score, host_map[r.sentence].lm_score, rtol=1e-3, atol=1e-3
        )


def test_device_matches_host_noisy(lexicon, lm):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=8,
                       beam_width=96, beam=0.0)
    lp = clean_logprobs(
        lexicon.sentence_to_phonemes("there is the cat"),
        hot=2.5, noise=0.8, seed=3,
    )
    host = LexiconBeamSearch(lexicon, lm, cfg, max_homophones=4)
    host.decode(lp)
    r_host = host.finish_decoding()
    dev = DeviceLexiconBeamSearch(lexicon, lm, cfg)
    dev.decode(lp)
    r_dev = dev.finish_decoding()
    assert r_dev[0].sentence == r_host[0].sentence


def test_device_homophones_branch(lexicon, lm):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10, beam_width=64)
    dev = DeviceLexiconBeamSearch(lexicon, lm, cfg)
    dev.decode(clean_logprobs(lexicon.sentence_to_phonemes("there is the cat")))
    res = dev.finish_decoding()
    sentences = [r.sentence for r in res]
    assert sentences[0] == "there is the cat"
    assert "their is the cat" in sentences


def test_device_incremental_chunks(lexicon, lm):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=5, beam_width=64)
    lp = clean_logprobs(lexicon.sentence_to_phonemes("the cat sat on the mat"))
    full = DeviceLexiconBeamSearch(lexicon, lm, cfg)
    full.decode(lp)
    r_full = full.finish_decoding()

    chunked = DeviceLexiconBeamSearch(lexicon, lm, cfg)
    partials = []
    for i in range(0, lp.shape[0], 9):
        chunked.decode(lp[i : i + 9])
        r = chunked.result()
        if r:
            partials.append(r[0].sentence)
    r_chunked = chunked.finish_decoding()
    assert r_full[0].sentence == r_chunked[0].sentence
    np.testing.assert_allclose(r_full[0].ac_score, r_chunked[0].ac_score, rtol=1e-5)
    assert partials[-1].startswith("the cat sat")


def test_device_blank_penalty_and_reset(lexicon, lm):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=30.0, nbest=3, beam_width=64)
    dev = DeviceLexiconBeamSearch(lexicon, lm, cfg)
    lp = clean_logprobs(lexicon.sentence_to_phonemes("the cat"), hot=3.0)
    dev.decode(lp)
    assert dev.finish_decoding()[0].sentence == "the cat"
    dev.reset()
    assert not dev.decoded_something()
    dev.decode(clean_logprobs(lexicon.sentence_to_phonemes("the mat"), hot=3.0))
    assert dev.finish_decoding()[0].sentence == "the mat"


def test_device_blank_skip(lexicon, lm):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=3,
                       beam_width=64, ctc_blank_skip_threshold=0.9)
    dev = DeviceLexiconBeamSearch(lexicon, lm, cfg)
    dev.decode(clean_logprobs(lexicon.sentence_to_phonemes("the cat sat")))
    assert dev.finish_decoding()[0].sentence == "the cat sat"


def test_batch_blank_skip_matches_streaming_and_oracle(lexicon, lm):
    """decode_batch with blank-skip (host frame compaction) == the streaming
    device path == the host oracle, scores included."""
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=2.0, nbest=5,
                       beam_width=64, beam=0.0, ctc_blank_skip_threshold=0.9)
    sents = ["the cat sat on the mat", "there is the cat"]
    lps = [
        clean_logprobs(lexicon.sentence_to_phonemes(s), hot=5.0, noise=0.3,
                       seed=7 + i)
        for i, s in enumerate(sents)
    ]
    T = max(l.shape[0] for l in lps)
    batch = np.full((2, T, 41), -20.0, np.float32)
    lens = np.array([l.shape[0] for l in lps], np.int32)
    for i, l in enumerate(lps):
        batch[i, : l.shape[0]] = l

    dev = DeviceLexiconBeamSearch(lexicon, lm, cfg)
    res_batch = dev.decode_batch(batch, lens)

    for i, s in enumerate(sents):
        host = LexiconBeamSearch(lexicon, lm, cfg)
        host.decode(lps[i])
        r_host = host.finish_decoding()

        dev.reset()
        dev.decode(lps[i])
        r_stream = dev.finish_decoding()

        assert res_batch[i][0].sentence == r_stream[0].sentence == r_host[0].sentence
        np.testing.assert_allclose(
            res_batch[i][0].ac_score, r_stream[0].ac_score, rtol=1e-4
        )
        np.testing.assert_allclose(
            res_batch[i][0].lm_score, r_host[0].lm_score, rtol=1e-3, atol=1e-3
        )


def test_compact_blank_skip_semantics():
    """The compaction drops skip frames and re-inserts exactly one blank
    before the next processed frame."""
    from b2txt_tpu.decode.lmbeam_jax import compact_blank_skip

    C = 5
    def row(p_blank):
        r = np.full((C,), np.log((1 - p_blank) / (C - 1)), np.float32)
        r[0] = np.log(p_blank)
        return r

    lp = np.stack([row(0.99), row(0.99), row(0.2), row(0.99), row(0.3)])[None]
    out, lens = compact_blank_skip(lp, np.array([5]), blank=0, thresh=0.9,
                                   log_blank_penalty=0.0)
    # frames 0,1 skipped → 1 blank + frame2; frame3 skipped → 1 blank + frame4
    assert lens[0] == 4
    assert out[0, 0, 0] == 0.0 and out[0, 2, 0] == 0.0   # re-inserted blanks
    np.testing.assert_allclose(out[0, 1], lp[0, 2], rtol=1e-6)
    np.testing.assert_allclose(out[0, 3], lp[0, 4], rtol=1e-6)


def test_compact_blank_skip_random_vs_loop():
    """Vectorized compaction == the per-frame streaming loop on random
    batches (covers leading/trailing skip runs, all-skip and empty rows)."""
    from b2txt_tpu.decode.lmbeam_jax import compact_blank_skip

    rng = np.random.default_rng(3)
    B, T, C = 5, 17, 6
    lp = np.log(rng.dirichlet(np.full(C, 0.3), size=(B, T))).astype(np.float32)
    lp[1, :, 0] = 0.0          # an all-skip utterance
    lengths = np.array([17, 9, 0, 13, 17], np.int32)
    thresh, log_bp = 0.6, float(np.log(0.5))

    out, lens = compact_blank_skip(lp, lengths, blank=0, thresh=thresh,
                                   log_blank_penalty=log_bp)

    # reference loop (the pre-vectorization semantics)
    pen = lp.copy()
    pen[:, :, 0] -= log_bp
    blank_row = np.full((C,), -30.0, np.float32)
    blank_row[0] = 0.0
    for b in range(B):
        rows = []
        pending = False
        for t in range(int(lengths[b])):
            if np.exp(pen[b, t, 0]) > thresh:
                pending = True
                continue
            if pending:
                rows.append(blank_row)
                pending = False
            rows.append(pen[b, t])
        assert lens[b] == len(rows)
        if rows:
            np.testing.assert_allclose(out[b, : len(rows)], np.stack(rows),
                                       rtol=1e-6)
    assert lens[1] == 0 and lens[2] == 0


def test_batch_blank_skip_fires_live_vs_oracle(lexicon, lm):
    """Batched decode at blank_penalty < 1 — the regime where the skip
    threshold is actually reachable, so compact_blank_skip really drops
    frames — matches the host oracle's streaming skip semantics
    (reference: ctc_wfst_beam_search.cc:86-95)."""
    from b2txt_tpu.decode.lmbeam_jax import compact_blank_skip

    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=0.5, nbest=5,
                       beam_width=64, beam=0.0, ctc_blank_skip_threshold=0.9)
    sents = ["the cat sat on the mat", "there is the cat"]
    lps = [
        clean_logprobs(lexicon.sentence_to_phonemes(s), hot=5.0, noise=0.3,
                       seed=11 + i)
        for i, s in enumerate(sents)
    ]
    T = max(l.shape[0] for l in lps)
    batch = np.full((2, T, 41), -20.0, np.float32)
    lens = np.array([l.shape[0] for l in lps], np.int32)
    for i, l in enumerate(lps):
        batch[i, : l.shape[0]] = l

    # the compaction must actually drop frames in this regime
    _, clens = compact_blank_skip(batch, lens, blank=0, thresh=0.9,
                                  log_blank_penalty=float(np.log(0.5)))
    assert (clens < lens).all()

    dev = DeviceLexiconBeamSearch(lexicon, lm, cfg)
    res_batch = dev.decode_batch(batch, lens)
    for i, s in enumerate(sents):
        host = LexiconBeamSearch(lexicon, lm, cfg)
        host.decode(lps[i])
        r_host = host.finish_decoding()
        assert res_batch[i][0].sentence == r_host[0].sentence == s
        np.testing.assert_allclose(
            res_batch[i][0].lm_score, r_host[0].lm_score, rtol=1e-3, atol=1e-3
        )


@pytest.mark.parametrize("order", [1, 2])
def test_device_lower_order_lms(lexicon, order):
    lm = train_ngram(CORPUS, order=order)
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=3, beam_width=64)
    host = LexiconBeamSearch(lexicon, lm, cfg)
    dev = DeviceLexiconBeamSearch(lexicon, lm, cfg)
    lp = clean_logprobs(lexicon.sentence_to_phonemes("the cat sat"))
    host.decode(lp)
    dev.decode(lp)
    rh = host.finish_decoding()
    rd = dev.finish_decoding()
    assert rd[0].sentence == rh[0].sentence
    np.testing.assert_allclose(rd[0].lm_score, rh[0].lm_score, rtol=1e-4)
