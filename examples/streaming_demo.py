#!/usr/bin/env python
"""Online (closed-loop) streaming decode with b2txt_tpu.

The reference's production use is ONLINE: neural bins arrive every 20 ms, the
GRU advances with carried hidden state (rnn_model.py:88,122-132), and the LM
decoder refines a partial sentence per chunk
(ctc_wfst_beam_search.cc:70-121 incremental search;
language-model-standalone.py:759-785 partial loop). This demo shows both
halves of that flow at small scale on CPU (~15 s):

  A. stateful GRU streaming — one 80 ms hop = one patch_size-bin window
     through a single patched GRU step; streaming logits are verified to
     match the offline full-sequence forward bit-for-bit semantics;
  B. incremental LM decode — logit chunks stream into DecoderService,
     the partial sentence grows chunk by chunk, finalize() returns the
     n-best with the reference's 5-tuple scoring.

Run: python examples/streaming_demo.py
For measured on-chip streaming latency at production shapes (291 µs/hop) see
scripts/bench_streaming.py and docs/DESIGN.md.
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
import numpy as np  # noqa: E402

from b2txt_tpu.data import synthetic  # noqa: E402
from b2txt_tpu.lm import Lexicon, train_ngram  # noqa: E402
from b2txt_tpu.lm.lexicon import strip_stress  # noqa: E402
from b2txt_tpu.models import gru_decoder  # noqa: E402
from b2txt_tpu.serve import DecoderService  # noqa: E402
from b2txt_tpu.utils import TrainConfig  # noqa: E402
from b2txt_tpu.utils.config import DecodeConfig  # noqa: E402


def stream_gru(verbose: bool = True) -> float:
    """Part A: carried-state GRU streaming == offline forward (parity)."""
    cfg = TrainConfig()
    cfg.model.n_input_features = 64
    cfg.model.n_units = 64
    cfg.model.n_layers = 2
    D, H, L = 64, 64, 2
    PATCH, STRIDE = cfg.model.patch_size, cfg.model.patch_stride
    params = gru_decoder.init_params_from_config(
        jax.random.PRNGKey(0), cfg.model, n_days=3, n_classes=41
    )
    day = jnp.asarray([1])

    @jax.jit
    def hop(params, h, window):
        """One online update: a patch_size-bin window -> 1 logit frame."""
        logits, h2 = gru_decoder.forward(
            params, window[None], day, states=h, return_state=True,
            patch_size=PATCH, patch_stride=STRIDE,
        )
        return logits[0, 0], h2

    rng = np.random.default_rng(0)
    T = PATCH + 15 * STRIDE  # 16 hops of fresh bins
    bins = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)

    h = jnp.broadcast_to(params["h0"], (L, 1, H))
    streamed, times = [], []
    for t in range(0, T - PATCH + 1, STRIDE):
        t0 = time.perf_counter()
        frame, h = hop(params, h, bins[t : t + PATCH])
        frame = np.asarray(frame)  # host sync = end of this hop
        times.append(time.perf_counter() - t0)
        streamed.append(frame)
    streamed = np.stack(streamed)

    offline = np.asarray(gru_decoder.forward(
        params, bins[None], day, patch_size=PATCH, patch_stride=STRIDE,
    )[0])
    err = float(np.abs(streamed - offline).max())
    assert err < 1e-4, f"streaming != offline forward (max |diff| {err})"
    hop_ms = 1000 * float(np.median(times[1:]))
    if verbose:
        print(f"A. GRU streaming: {len(streamed)} hops, streaming==offline "
              f"(max |diff| {err:.2e}), median hop {hop_ms:.2f} ms "
              f"(80 ms of real time per hop)")
    return hop_ms


def stream_decode(verbose: bool = True) -> dict:
    """Part B: chunked logits -> partial sentences -> finalized n-best."""
    prons = synthetic.word_pronunciations()
    lm = train_ngram(synthetic.sentence_corpus(100), order=3)
    tmp = tempfile.mkdtemp()
    lexp = os.path.join(tmp, "lexicon.txt")
    with open(lexp, "w") as f:
        for wd, pron in prons.items():
            f.write(f"{wd.upper()}  {' '.join(strip_stress(pron))}\n")
    lexicon = Lexicon.from_words(prons)

    service = DecoderService(
        lexicon, lm,
        DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=5,
                     beam_width=64),
        channel_order="model",
    )

    sentence = "hello world brain text"
    frames = []
    for pid in lexicon.sentence_to_phonemes(sentence):
        for _ in range(3):
            row = np.full(41, -8.0, np.float32)
            row[pid] = 0.0
            frames.append(row)
        blank = np.full(41, -8.0, np.float32)
        blank[0] = 0.0
        frames.append(blank)
    logits = np.stack(frames)

    service.reset()
    partials = []
    for i in range(0, logits.shape[0], 8):  # ~8 frames per network chunk
        partial = service.decode_chunk(logits[i : i + 8])
        partials.append(partial)
        if verbose:
            print(f"B. partial after chunk {len(partials):2d}: {partial!r}")
    final = service.finalize()
    if verbose:
        print(f"B. final: {final.sentence!r}")
        print(f"B. n-best (sentence, ac, ngram, llm, total):")
        for cand in final.nbest[:3]:
            print(f"     {cand}")
    return {"sentence": sentence, "partials": partials, "final": final}


def main(verbose: bool = True) -> dict:
    hop_ms = stream_gru(verbose)
    out = stream_decode(verbose)
    out["hop_ms"] = hop_ms
    return out


if __name__ == "__main__":
    main()
