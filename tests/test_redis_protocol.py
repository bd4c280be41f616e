"""Redis-stream protocol end-to-end: RedisDecoderServer ↔ RemoteLMClient.

Runs the full reference wire protocol (language-model-standalone.py:514-790 ↔
evaluate_model_helpers.py:129-297) — reset / update-params / logits / finalize
request-ack stream pairs, the remote_lm_args mirror, the context key, and the
reconnect state machine — against the in-process fake redis
(b2txt_tpu.serve.fakeredis), no server required.
"""

import threading
import time

import numpy as np
import pytest

from b2txt_tpu.serve import fakeredis
from b2txt_tpu.utils.phonemes import rearrange_speech_logits

fakeredis.install_fake_redis()  # must precede the adapter/client imports

from b2txt_tpu.lm import Lexicon, train_ngram  # noqa: E402
from b2txt_tpu.serve.redis_adapter import RedisDecoderServer  # noqa: E402
from b2txt_tpu.serve.redis_client import RemoteLMClient  # noqa: E402
from b2txt_tpu.serve.service import DecoderService  # noqa: E402
from b2txt_tpu.utils.config import DecodeConfig  # noqa: E402

LEX = {
    "the": ["DH", "AH"],
    "cat": ["K", "AE", "T"],
    "sat": ["S", "AE", "T"],
    "mat": ["M", "AE", "T"],
    "on": ["AA", "N"],
}
CORPUS = ["the cat sat on the mat".split(), "the cat sat".split()] * 4


def make_service() -> DecoderService:
    lexicon = Lexicon.from_words(LEX)
    lm = train_ngram(CORPUS, order=2)
    cfg = DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=5,
                       beam_width=32, beam=0.0)
    return DecoderService(lexicon, lm, cfg, channel_order="lm")


def clean_logits(lexicon, sentence, hot=6.0):
    rows = []
    for pid in lexicon.sentence_to_phonemes(sentence):
        for _ in range(2):
            row = np.full(41, -hot, np.float32)
            row[pid] = 0.0
            rows.append(row)
        blank = np.full(41, -hot, np.float32)
        blank[0] = 0.0
        rows.append(blank)
    model_order = np.stack(rows)
    return rearrange_speech_logits(model_order)  # LM wire order


@pytest.fixture()
def server_client():
    fakeredis.reset_all()
    service = make_service()
    server = RedisDecoderServer(service)
    thread = threading.Thread(target=server.run, daemon=True)
    thread.start()
    time.sleep(0.05)  # let the server connect and initialize stream cursors
    client = RemoteLMClient()
    yield service, server, client
    server.stop()
    thread.join(timeout=5)
    assert not thread.is_alive()


def test_full_decode_round_trip(server_client):
    service, server, client = server_client
    lexicon = service.searcher.lexicon

    client.reset()
    logits = clean_logits(lexicon, "the cat sat")
    partial = client.send_logits(logits)
    assert partial  # server streamed a partial sentence back
    final = client.finalize()
    assert final.sentence == "the cat sat"
    # ';'-packed 5-tuple scoring parsed into (sentence, ac, ngram, llm, total)
    assert final.nbest and len(final.nbest[0]) == 5
    assert final.nbest[0][0] == "the cat sat"


def test_chunked_logits_and_reset_between_utterances(server_client):
    service, server, client = server_client
    lexicon = service.searcher.lexicon

    client.reset()
    logits = clean_logits(lexicon, "the cat sat on the mat")
    for i in range(0, logits.shape[0], 7):  # stream chunk-by-chunk
        client.send_logits(logits[i : i + 7])
    assert client.finalize().sentence == "the cat sat on the mat"

    client.reset()  # second utterance after reset
    client.send_logits(clean_logits(lexicon, "the mat"))
    assert client.finalize().sentence == "the mat"


def test_update_params_ack_and_mirror(server_client):
    service, server, client = server_client
    client.update_params(acoustic_scale=0.7, nbest=3, blank_penalty=2.0)
    assert service.config.acoustic_scale == 0.7
    assert service.config.nbest == 3
    assert service.config.blank_penalty == 2.0
    # the remote_lm_args mirror stream reflects the update
    r = fakeredis.Redis()
    entries = r.xread({"remote_lm_args": 0})
    assert entries
    latest = entries[0][1][-1][1]
    assert latest[b"acoustic_scale"] == b"0.7"


def test_context_key_reaches_service(server_client):
    service, server, client = server_client
    client.set_context("we were talking about pets")
    client.reset()
    client.send_logits(clean_logits(service.searcher.lexicon, "the cat"))
    client.finalize()
    assert service.context == "we were talking about pets"


def test_reconnect_state_machine(server_client):
    """Kill the connection mid-session; the server must ride out the loss
    (language-model-standalone.py:524-542 behavior) and serve afterwards."""
    service, server, client = server_client
    lexicon = service.searcher.lexicon

    client.reset()
    assert client.send_logits(clean_logits(lexicon, "the cat"))
    assert client.finalize().sentence == "the cat"

    fakeredis.set_down(True)
    time.sleep(0.3)   # server loop observes the loss → state 0
    fakeredis.set_down(False)
    time.sleep(1.3)   # server retries after its 1 s backoff

    client.reset()
    client.send_logits(clean_logits(lexicon, "the mat"))
    assert client.finalize().sentence == "the mat"
