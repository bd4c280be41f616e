#!/usr/bin/env python
"""Conversation-mode (contextual) decoding with b2txt_tpu.

The reference's personal-use mode (the figure-4 regime) keeps a running
conversation context and prepends it to every n-best hypothesis before LLM
rescoring (`language-model-standalone.py:165-199`, the
`contextual_decoding_current_context` Redis key), so earlier turns
disambiguate later ones. This demo shows that flow end to end at small scale
on CPU (~20 s):

  A. "sun" and "son" are HOMOPHONES (identical phonemes [S AH N]): the beam
     search produces both parses with identical acoustic scores, and the
     neutral decode LM ties them. The conversation context alone flips the
     final pick — "look at the sky" → "the sun is bright here";
     "he hugged his family" → "the son is bright here" — from the SAME
     posteriors.
  B. the TPU-resident OPT rescorer scores context+hypothesis through its
     prefix-KV cache (the context forward runs ONCE, candidates cross-attend
     to the cached keys/values — decode/opt_lm.py score_prefix_packed_fn)
     instead of re-running the context inside every candidate as the
     reference does.

Run: python examples/conversation_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Comment this out to run on a real TPU (the axon plugin ignores
# JAX_PLATFORMS=cpu env — config update is the reliable switch):
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from b2txt_tpu.decode import opt_lm  # noqa: E402
from b2txt_tpu.decode.rescore import NGramLLMAdapter  # noqa: E402
from b2txt_tpu.lm import Lexicon, train_ngram  # noqa: E402
from b2txt_tpu.serve import DecoderService  # noqa: E402
from b2txt_tpu.utils.config import DecodeConfig  # noqa: E402

LEX = {
    "the": ["DH", "AH"],
    "sun": ["S", "AH", "N"],   # homophone pair: identical pronunciation,
    "son": ["S", "AH", "N"],   # only context can tell them apart
    "is": ["IH", "Z"],
    "bright": ["B", "R", "AY", "T"],
    "here": ["HH", "IY", "R"],
    "sky": ["S", "K", "AY"],
    "family": ["F", "AE", "M", "L", "IY"],
    "look": ["L", "UH", "K"],
    "at": ["AE", "T"],
    "his": ["HH", "IH", "Z"],
    "he": ["HH", "IY"],
    "hugged": ["HH", "AH", "G", "D"],
}

# neutral decode-LM corpus: sun and son exactly as frequent, so the n-gram
# fused into the beam search cannot break the homophone tie by itself
DECODE_CORPUS = [
    "the sun is bright here".split(),
    "the son is bright here".split(),
    "look at the sky".split(),
    "he hugged his family".split(),
] * 6

# the "LLM": a larger-context n-gram over conversation-shaped text — enough
# signal that sky-context prefers sun and family-context prefers son once
# llm_rescore prepends the context (exactly the reference blend, :231-251)
LLM_CORPUS = [
    "look at the sky the sun is bright here".split(),
    "at the sky the sun is bright".split(),
    "the sky the sun".split(),
    "he hugged his family the son is bright here".split(),
    "his family the son is here".split(),
    "the family the son".split(),
] * 6


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


def main(verbose: bool = True):
    def say(*a):
        if verbose:
            print(*a)

    lex = Lexicon.from_words(LEX)
    decode_lm = train_ngram(DECODE_CORPUS, order=3)
    llm = NGramLLMAdapter(train_ngram(LLM_CORPUS, order=3))

    svc = DecoderService(
        lex, decode_lm,
        DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=10,
                     do_opt=True, alpha=0.8),
        llm=llm, channel_order="model",
    )

    # the SAME posteriors for every turn: [S AH N] is both words
    logits = clean_logits(lex.sentence_to_phonemes("the sun is bright here"))

    picks = {}
    for context in ("look at the sky", "he hugged his family"):
        svc.set_context(context)           # ← the conversation state
        out = svc.decode_utterance(logits)
        picks[context] = out.sentence
        say(f"context={context!r:32} → {out.sentence!r} "
            f"(confidence {out.confidence:.2f})")

    assert picks["look at the sky"] == "the sun is bright here", picks
    assert picks["he hugged his family"] == "the son is bright here", picks
    say("same acoustics, context flipped the homophone ✓")

    # B: the TPU-resident OPT rescorer takes the context as a KV-cached
    # prefix (scored once, not once per candidate); tiny random weights
    # here — the path and parity are what's demonstrated (the real 6.7b
    # drive is scripts/bench_opt.py --context_words N)
    ocfg = opt_lm.OPTConfig.tiny()
    enc = lambda t, n: [(3 + 17 * b) % ocfg.vocab_size  # noqa: E731
                        for b in t.encode()][:n]
    resc = opt_lm.OPTRescorer(ocfg, encode=enc, encode_cont=enc, max_len=64)
    texts = ["the sun is bright here", "the son is bright here"]
    ctx = "look at the sky"
    got = resc.score(texts, context=ctx)
    want = resc.score([ctx + " " + t for t in texts])
    assert resc._prefix, "prefix-KV path did not run"
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
    say("OPT prefix-KV context scoring == concatenated scoring ✓")
    return picks


if __name__ == "__main__":
    main()
