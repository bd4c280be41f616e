"""LLM rescoring actually executed: the JAX-native transformer rescorer and
the transformers (torch) path, end-to-end through the α-blend decode flow.

Closes the round-1 gap: the OPT path (language-model-standalone.py:92-251) was
an unexercised wrapper. Here (a) the pure-JAX pjit-shardable rescorer runs
score() with the reference's token-logprob-sum − length_penalty·n_tokens
formula, checked against a hand-rolled reference computation, (b) sharded ==
single-device over the ("data", "model") mesh, (c) a real transformers causal
LM (tiny GPT-2, built offline) runs through TorchCausalLMRescorer, and (d)
both plug into llm_rescore / DecoderService(do_opt=True).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from b2txt_tpu.decode.jax_lm import (
    BOS,
    JaxCausalLMRescorer,
    encode_bytes,
    forward,
    init_params,
)
from b2txt_tpu.decode.rescore import llm_rescore


def test_score_matches_manual_logprob_sum():
    """score() == Σ_t log P(tok_t | tok_<t) − length_penalty · n_tokens,
    computed by hand from the raw forward logits."""
    r = JaxCausalLMRescorer(seed=3)
    text = "the cat sat"
    lp_pen = 0.7
    [score] = r.score([text], length_penalty=lp_pen)

    ids = encode_bytes(text, 256)
    logits = np.asarray(forward(r.params, jnp.asarray([ids]), n_heads=4))
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    manual = sum(logp[0, t, ids[t + 1]] for t in range(len(ids) - 1))
    manual -= lp_pen * len(ids)
    np.testing.assert_allclose(score, manual, rtol=1e-4, atol=1e-4)


def test_batching_invariance_and_padding():
    r = JaxCausalLMRescorer(seed=1)
    texts = ["hello world", "a", "the quick brown fox jumps over the lazy dog"]
    together = r.score(texts)
    separate = [r.score([t])[0] for t in texts]
    np.testing.assert_allclose(together, separate, rtol=1e-3, atol=1e-3)


def test_sharded_rescorer_matches_single_device():
    """pjit-sharded forward (TP over 'model', batch over 'data') == local."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    single = JaxCausalLMRescorer(seed=2)
    sharded = JaxCausalLMRescorer(
        params=jax.tree_util.tree_map(np.asarray, single.params), mesh=mesh
    )
    texts = ["the cat sat on the mat", "there is the cat", "hello"]
    np.testing.assert_allclose(
        single.score(texts), sharded.score(texts), rtol=1e-4, atol=1e-4
    )


def test_llm_rescore_executes_alpha_blend():
    """llm_rescore with the JAX rescorer: totals follow
    acoustic_scale·ac + (1−α)·ngram + α·llm (standalone :233)."""
    r = JaxCausalLMRescorer(seed=0)
    nbest = [("the cat sat", -10.0, -3.0), ("the bat sat", -11.0, -2.5),
             ("the mat sat", -12.0, -2.0)]
    out = llm_rescore(r, nbest, acoustic_scale=0.3, alpha=0.6)
    assert len(out.nbest) == 3
    llm_scores = {row[0]: row[3] for row in out.nbest}
    expect = dict(zip([s for s, _, _ in nbest],
                      r.score([s for s, _, _ in nbest], 0.0)))
    for s, a, l in nbest:
        np.testing.assert_allclose(llm_scores[s], expect[s], rtol=1e-4)
        row = next(x for x in out.nbest if x[0] == s)
        np.testing.assert_allclose(
            row[4], 0.3 * a + 0.4 * l + 0.6 * expect[s], rtol=1e-4
        )
    assert 0.0 < out.confidence <= 1.0


def test_service_do_opt_path_with_jax_llm():
    """DecoderService(do_opt=True) end-to-end with the JAX LLM, including the
    conversational context prefix."""
    from b2txt_tpu.lm import Lexicon, train_ngram
    from b2txt_tpu.serve.service import DecoderService
    from b2txt_tpu.utils.config import DecodeConfig

    LEX = {"the": ["DH", "AH"], "cat": ["K", "AE", "T"], "sat": ["S", "AE", "T"]}
    lexicon = Lexicon.from_words(LEX)
    lm = train_ngram(["the cat sat".split()] * 4, order=2)
    svc = DecoderService(
        lexicon, lm,
        DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0, nbest=5,
                     beam_width=32, beam=0.0, do_opt=True, alpha=0.5),
        llm=JaxCausalLMRescorer(seed=0),
        channel_order="model",
    )
    svc.set_context("we were talking about pets")
    rows = []
    for pid in lexicon.sentence_to_phonemes("the cat sat"):
        for _ in range(2):
            r = np.full(41, -6.0, np.float32); r[pid] = 0.0; rows.append(r)
        b = np.full(41, -6.0, np.float32); b[0] = 0.0; rows.append(b)
    out = svc.decode_utterance(np.stack(rows))
    assert out.sentence == "the cat sat"
    assert out.confidence is not None
    assert any(row[3] != 0.0 for row in out.nbest)  # LLM scores present


def test_torch_transformers_rescorer_smoke():
    """The actual transformers code path (the reference's OPT loader shape)
    with a tiny GPT-2 built offline — no downloads."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import GPT2Config, GPT2LMHeadModel, PreTrainedTokenizerFast

    from b2txt_tpu.decode.rescore import TorchCausalLMRescorer

    words = ["the", "cat", "sat", "bat", "mat", "on", "hello", "world", "<eos>"]
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<eos>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tokenizer = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")

    cfg = GPT2Config(vocab_size=len(vocab), n_positions=32, n_embd=32,
                     n_layer=2, n_head=2)
    torch.manual_seed(0)
    model = GPT2LMHeadModel(cfg)

    r = TorchCausalLMRescorer(model=model, tokenizer=tokenizer, device="cpu")
    scores = r.score(["the cat sat", "the bat sat on the mat"], length_penalty=0.1)
    assert len(scores) == 2 and all(np.isfinite(scores))
    # single == batched
    np.testing.assert_allclose(
        scores[0], r.score(["the cat sat"], length_penalty=0.1)[0], rtol=1e-4
    )
    # plugs into the α-blend
    out = llm_rescore(r, [("the cat sat", -10.0, -3.0), ("the bat sat", -11.0, -2.0)],
                      acoustic_scale=0.3, alpha=0.5)
    assert out.best in ("the cat sat", "the bat sat")
