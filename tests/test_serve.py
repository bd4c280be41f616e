"""Streaming decode service: protocol verbs, channel order, wire packing."""

import numpy as np
import pytest

from b2txt_tpu.decode.rescore import NGramLLMAdapter
from b2txt_tpu.lm import Lexicon, train_ngram
from b2txt_tpu.serve import DecoderService, FinalOutput, lm_order_to_model_order
from b2txt_tpu.utils.config import DecodeConfig
from b2txt_tpu.utils.phonemes import rearrange_speech_logits

LEX = {
    "the": ["DH", "AH"],
    "cat": ["K", "AE", "T"],
    "sat": ["S", "AE", "T"],
    "mat": ["M", "AE", "T"],
    "on": ["AA", "N"],
}
CORPUS = [
    "the cat sat on the mat".split(),
    "the cat sat".split(),
    "the mat".split(),
] * 5


@pytest.fixture(scope="module")
def lexicon():
    return Lexicon.from_words(LEX)


@pytest.fixture(scope="module")
def lm():
    return train_ngram(CORPUS, order=3)


def clean_logits(phoneme_ids, n_classes=41, frames_per=3, hot=6.0):
    rows = []
    for pid in phoneme_ids:
        for _ in range(frames_per):
            row = np.full(n_classes, -hot, np.float32)
            row[pid] = hot
            rows.append(row)
        blank = np.full(n_classes, -hot, np.float32)
        blank[0] = hot
        rows.append(blank)
    return np.stack(rows)


def _service(lexicon, lm, **cfg_kw):
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10, **cfg_kw)
    return DecoderService(lexicon, lm, cfg, channel_order="lm")


def test_channel_order_roundtrip(rng):
    logits = rng.standard_normal((7, 41)).astype(np.float32)
    wire = rearrange_speech_logits(logits[None])[0]  # model -> lm order
    back = lm_order_to_model_order(wire)
    np.testing.assert_array_equal(back, logits)


def test_end_to_end_protocol(lexicon, lm):
    svc = _service(lexicon, lm)
    ids = lexicon.sentence_to_phonemes("the cat sat on the mat")
    logits = clean_logits(ids)
    wire_logits = rearrange_speech_logits(logits[None])[0]

    svc.reset()
    partials = []
    for i in range(0, wire_logits.shape[0], 8):
        partials.append(svc.decode_chunk(wire_logits[i : i + 8]))
    final = svc.finalize()
    assert final.sentence == "the cat sat on the mat"
    assert partials[-1].startswith("the cat")
    # 5-tuple wire packing parses back
    packed = final.scoring_packed()
    parsed = FinalOutput.parse_scoring(packed)
    assert parsed.sentence == final.sentence
    assert len(parsed.nbest) >= 1
    assert parsed.nbest[0][4] >= parsed.nbest[-1][4]  # sorted by total


def test_update_params(lexicon, lm):
    svc = _service(lexicon, lm)
    d = svc.update_params(acoustic_scale=0.9, nbest=3)
    assert d["acoustic_scale"] == 0.9
    assert svc.searcher.config.nbest == 3
    with pytest.raises(TypeError):
        svc.update_params(not_a_param=1)


def test_reset_between_utterances(lexicon, lm):
    svc = _service(lexicon, lm)
    ids1 = lexicon.sentence_to_phonemes("the cat")
    ids2 = lexicon.sentence_to_phonemes("the mat")
    out1 = svc.decode_utterance(
        rearrange_speech_logits(clean_logits(ids1)[None])[0]
    )
    out2 = svc.decode_utterance(
        rearrange_speech_logits(clean_logits(ids2)[None])[0]
    )
    assert out1.sentence == "the cat"
    assert out2.sentence == "the mat"


def test_llm_rescore_path(lexicon, lm):
    svc = DecoderService(
        lexicon, lm,
        DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10,
                     do_opt=True, alpha=0.5),
        llm=NGramLLMAdapter(lm), channel_order="model",
    )
    ids = lexicon.sentence_to_phonemes("the cat sat")
    out = svc.decode_utterance(clean_logits(ids))
    assert out.sentence == "the cat sat"
    assert out.confidence is not None and out.confidence > 0
    assert any(row[3] != 0.0 for row in out.nbest)  # llm scores populated


def test_finalize_pipelined_order_and_window(lexicon, lm):
    """_finalize_pipelined keeps utterance order across the bounded dispatch
    window (90 utterances > the 64-deep window forces mid-stream draining),
    dispatches every forward before its fetch, and matches the serial path."""
    from b2txt_tpu.decode.lmbeam import DecodeResult

    events = []

    class AsyncScorer:
        def score(self, texts, length_penalty=0.0, _tag=None):
            return [-float(len(t)) for t in texts]

        def score_async(self, texts, length_penalty=0.0):
            tag = texts[0]
            events.append(("begin", tag))

            def fetch():
                events.append(("fetch", tag))
                return [-float(len(t)) for t in texts]

            return fetch

    svc = DecoderService(
        lexicon, lm,
        DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=5,
                     do_opt=True, alpha=0.5),
        llm=AsyncScorer(), channel_order="model",
    )
    batched = []
    for b in range(3):
        lists = [[DecodeResult(f"utt{b * 30 + i}", -1.0 - i, -2.0)]
                 for i in range(30)]
        batched.append((30, lists))
    outs = svc._finalize_pipelined(iter(batched))
    assert [o.sentence for o in outs] == [f"utt{i}" for i in range(90)]
    # every dispatch precedes its own fetch, and >1 forward was in flight
    # (the window actually pipelined: some begin happens before an earlier
    # utterance's fetch)
    begin_pos = {t: i for i, (e, t) in enumerate(events) if e == "begin"}
    fetch_pos = {t: i for i, (e, t) in enumerate(events) if e == "fetch"}
    assert all(begin_pos[t] < fetch_pos[t] for t in begin_pos)
    assert begin_pos["utt1"] < fetch_pos["utt0"]
    # the window drained mid-stream: utt0's fetch happened before the last
    # utterance was even dispatched
    assert fetch_pos["utt0"] < begin_pos["utt89"]


def test_decode_utterances_python_backend_pipelines_llm(lexicon, lm):
    """The serial (python/native) decode_utterances path overlaps utterance
    i's LLM forward with utterance i+1's beam search, with outputs identical
    to per-utterance decode_utterance."""
    events = []

    class AsyncScorer:
        def score(self, texts, length_penalty=0.0):
            return [-float(len(t)) for t in texts]

        def score_async(self, texts, length_penalty=0.0):
            events.append(("begin", texts[0]))

            def fetch():
                events.append(("fetch", texts[0]))
                return [-float(len(t)) for t in texts]

            return fetch

    def build():
        return DecoderService(
            lexicon, lm,
            DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=5,
                         do_opt=True, alpha=0.5),
            llm=AsyncScorer(), channel_order="model",
        )

    sents = ["the cat", "the mat", "the cat sat", "the mat on the cat"]
    logits = [clean_logits(lexicon.sentence_to_phonemes(s)) for s in sents]
    outs = build().decode_utterances(logits)
    assert [o.sentence for o in outs] == sents
    # pipelined: utterance 1's forward was dispatched before utterance 0's
    # fetch (all dispatches precede all fetches below the 64-deep window)
    kinds = [e for e, _ in events]
    assert kinds == ["begin"] * 4 + ["fetch"] * 4
    # identical to the serial per-utterance path
    svc = build()
    serial = [svc.decode_utterance(l) for l in logits]
    assert [o.sentence for o in serial] == sents
    for a, b in zip(outs, serial):
        assert a.nbest == b.nbest and a.confidence == b.confidence


def test_contextual_opt_finalize_prefix_path(lexicon, lm):
    """The service's conversational context reaches the OPT rescorer as a
    separate prefix (the KV-cached path runs the context once) and the
    finalize output matches concatenated context+hypothesis scoring."""
    import jax
    from b2txt_tpu.decode import opt_lm

    ocfg = opt_lm.OPTConfig.tiny()
    enc = lambda t, n: [(3 + 17 * b) % ocfg.vocab_size  # noqa: E731
                        for b in t.encode()][:n]
    params = opt_lm.init_params(jax.random.PRNGKey(0), ocfg)

    def run(scorer):
        svc = DecoderService(
            lexicon, lm,
            DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10,
                         do_opt=True, alpha=0.5),
            llm=scorer, channel_order="model",
        )
        svc.set_context("we were talking about pets")
        ids = lexicon.sentence_to_phonemes("the cat sat")
        return svc.decode_utterance(clean_logits(ids))

    prefix = opt_lm.OPTRescorer(ocfg, params=params, encode=enc,
                                encode_cont=enc, max_len=64)
    concat = opt_lm.OPTRescorer(ocfg, params=params, encode=enc, max_len=64)
    concat.supports_context = False  # force the concatenated path
    out_p, out_c = run(prefix), run(concat)
    assert prefix._prefix and not concat._prefix  # prefix path actually ran
    assert out_p.sentence == out_c.sentence == "the cat sat"
    np.testing.assert_allclose([r[4] for r in out_p.nbest],
                               [r[4] for r in out_c.nbest],
                               rtol=1e-4, atol=1e-3)


def test_ngram_rescore_path(lexicon, lm):
    big = train_ngram(CORPUS + ["the cat sat on the mat".split()] * 10, order=3)
    svc = DecoderService(
        lexicon, lm,
        DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10, rescore=True),
        rescore_lm=big, channel_order="model",
    )
    ids = lexicon.sentence_to_phonemes("the cat sat")
    out = svc.decode_utterance(clean_logits(ids))
    assert out.sentence == "the cat sat"
    assert "rescore_time" in svc.stats


def test_empty_final(lexicon, lm):
    svc = _service(lexicon, lm)
    svc.reset()
    final = svc.finalize()
    assert final.sentence == ""
    assert final.nbest == []


def test_decode_utterances_chunked_device_backend():
    """Chunked batched decode (fixed compiled shapes, padded last chunk)
    returns per-utterance results in order."""
    import numpy as np

    from b2txt_tpu.lm import Lexicon, train_ngram
    from b2txt_tpu.serve.service import DecoderService
    from b2txt_tpu.utils.config import DecodeConfig

    LEX = {"the": ["DH", "AH"], "cat": ["K", "AE", "T"],
           "sat": ["S", "AE", "T"], "mat": ["M", "AE", "T"]}
    lexicon = Lexicon.from_words(LEX)
    lm = train_ngram(["the cat sat".split(), "the mat".split()] * 4, order=2)
    svc = DecoderService(
        lexicon, lm,
        DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=5,
                     beam_width=32, beam=0.0),
        channel_order="model", searcher_backend="device",
    )

    def logits(sent, hot=6.0):
        rows = []
        for pid in lexicon.sentence_to_phonemes(sent):
            for _ in range(2):
                r = np.full(41, -hot, np.float32); r[pid] = 0.0; rows.append(r)
            b = np.full(41, -hot, np.float32); b[0] = 0.0; rows.append(b)
        return np.stack(rows)

    sents = ["the cat sat", "the mat", "the cat sat", "the mat", "the mat"]
    outs = svc.decode_utterances([logits(s) for s in sents], batch_size=2)
    assert [o.sentence for o in outs] == sents
