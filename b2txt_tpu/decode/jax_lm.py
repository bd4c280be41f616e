"""JAX-native causal-LM rescorer: a pjit-shardable decoder-only transformer
behind the LLMScorer protocol.

The reference rescores n-best hypotheses with OPT-6.7b through HF transformers
on a second GPU (language-model-standalone.py:92-161). The TPU-native
equivalent is this module: a pure-JAX byte-level transformer whose score()
matches the reference's token-logprob-sum − length_penalty·n_tokens formula
(:127-161), shardable over a ("data", "model") mesh — batch over data, the
attention heads and MLP hidden dimension over model (tensor parallelism), so a
large rescorer spans chips via pjit + NamedSharding exactly like the
production model path.

Byte-level tokenization (vocab 256 + BOS) needs no external files and handles
any hypothesis text; plug larger vocabularies by passing custom encode().
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]

BOS = 256
VOCAB = 257


def init_params(
    key: jax.Array,
    vocab: int = VOCAB,
    d_model: int = 64,
    n_layers: int = 2,
    n_heads: int = 4,
    d_ff: int = 256,
    max_len: int = 256,
) -> Params:
    ks = jax.random.split(key, 2 + 6 * n_layers)
    s = 0.02
    blocks = []
    for i in range(n_layers):
        k = ks[2 + 6 * i : 8 + 6 * i]
        blocks.append({
            "ln1_g": jnp.ones(d_model), "ln1_b": jnp.zeros(d_model),
            "wq": s * jax.random.normal(k[0], (d_model, d_model)),
            "wk": s * jax.random.normal(k[1], (d_model, d_model)),
            "wv": s * jax.random.normal(k[2], (d_model, d_model)),
            "wo": s * jax.random.normal(k[3], (d_model, d_model)),
            "ln2_g": jnp.ones(d_model), "ln2_b": jnp.zeros(d_model),
            "w1": s * jax.random.normal(k[4], (d_model, d_ff)),
            "b1": jnp.zeros(d_ff),
            "w2": s * jax.random.normal(k[5], (d_ff, d_model)),
            "b2": jnp.zeros(d_model),
        })
    return {
        "emb": s * jax.random.normal(ks[0], (vocab, d_model)),
        "pos": s * jax.random.normal(ks[1], (max_len, d_model)),
        "blocks": blocks,
        "lnf_g": jnp.ones(d_model), "lnf_b": jnp.zeros(d_model),
    }


def _ln(x, g, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def forward(params: Params, tokens: jax.Array, n_heads: int = 4,
            compute_dtype=jnp.float32) -> jax.Array:
    """tokens: (B, L) int32 → logits (B, L, vocab). Causal self-attention,
    pre-LN blocks, tied input/output embedding."""
    emb = params["emb"].astype(compute_dtype)
    B, L = tokens.shape
    x = emb[tokens] + params["pos"][:L].astype(compute_dtype)
    D = x.shape[-1]
    hd = D // n_heads
    causal = jnp.tril(jnp.ones((L, L), bool))

    for blk in params["blocks"]:
        h = _ln(x, blk["ln1_g"].astype(compute_dtype), blk["ln1_b"].astype(compute_dtype))
        q = (h @ blk["wq"].astype(compute_dtype)).reshape(B, L, n_heads, hd)
        k = (h @ blk["wk"].astype(compute_dtype)).reshape(B, L, n_heads, hd)
        v = (h @ blk["wv"].astype(compute_dtype)).reshape(B, L, n_heads, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=compute_dtype) / np.sqrt(hd)
        att = jnp.where(causal[None, None], att, jnp.asarray(-1e30, compute_dtype))
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(compute_dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v,
                       preferred_element_type=compute_dtype).reshape(B, L, D)
        x = x + o @ blk["wo"].astype(compute_dtype)
        h = _ln(x, blk["ln2_g"].astype(compute_dtype), blk["ln2_b"].astype(compute_dtype))
        h = jax.nn.gelu(h @ blk["w1"].astype(compute_dtype) + blk["b1"].astype(compute_dtype))
        x = x + h @ blk["w2"].astype(compute_dtype) + blk["b2"].astype(compute_dtype)

    x = _ln(x, params["lnf_g"].astype(compute_dtype), params["lnf_b"].astype(compute_dtype))
    return (x @ emb.T).astype(jnp.float32)


def param_partition_specs(params: Params) -> Params:
    """Tensor-parallel layout: attention projections and the MLP hidden dim
    shard over "model"; embeddings/norms replicate."""
    return {
        "emb": P(), "pos": P(),
        "blocks": [
            {
                "ln1_g": P(), "ln1_b": P(),
                "wq": P(None, "model"), "wk": P(None, "model"),
                "wv": P(None, "model"), "wo": P("model", None),
                "ln2_g": P(), "ln2_b": P(),
                "w1": P(None, "model"), "b1": P("model"),
                "w2": P("model", None), "b2": P(),
            }
            for _ in params["blocks"]
        ],
        "lnf_g": P(), "lnf_b": P(),
    }


def encode_bytes(text: str, max_len: int) -> List[int]:
    ids = [BOS] + list(text.encode("utf-8"))
    return ids[:max_len]


class JaxCausalLMRescorer:
    """LLMScorer over the JAX transformer. score(texts) = Σ token log-probs −
    length_penalty · n_tokens (parity: rescore_with_gpt2, standalone :127-161).

    Pass a Mesh to run the forward pjit-sharded (batch over "data", TP over
    "model"); otherwise runs single-device.
    """

    def __init__(
        self,
        params: Optional[Params] = None,
        mesh: Optional[Mesh] = None,
        max_len: int = 256,
        compute_dtype=jnp.float32,
        seed: int = 0,
        n_heads: int = 4,
        encode: Optional[Callable[[str, int], List[int]]] = None,
    ):
        self.params = params if params is not None else init_params(
            jax.random.PRNGKey(seed), max_len=max_len, n_heads=n_heads
        )
        self.n_heads = n_heads
        self.max_len = max_len
        self.encode = encode or encode_bytes
        self.mesh = mesh

        def score_fn(params, tokens, mask):
            logits = forward(params, tokens, n_heads=n_heads,
                             compute_dtype=compute_dtype)
            lp = jax.nn.log_softmax(logits, axis=-1)
            tok_lp = jnp.take_along_axis(
                lp[:, :-1], tokens[:, 1:, None], axis=2
            )[..., 0]
            tok_lp = tok_lp * mask[:, 1:]
            return tok_lp.sum(axis=1), mask.sum(axis=1)

        if mesh is not None:
            specs = param_partition_specs(self.params)
            p_shard = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), specs,
                is_leaf=lambda x: isinstance(x, P),
            )
            data = NamedSharding(mesh, P("data", None))
            repl = NamedSharding(mesh, P("data"))
            self.params = jax.tree_util.tree_map(
                jax.device_put, self.params, p_shard
            )
            self._score = jax.jit(
                score_fn, in_shardings=(p_shard, data, data),
                out_shardings=(repl, repl),
            )
            self._pad_to = mesh.shape["data"]
        else:
            self._score = jax.jit(score_fn)
            self._pad_to = 1

    def score_async(
        self, texts: Sequence[str], length_penalty: float = 0.0
    ) -> Callable[[], List[float]]:
        """Dispatch the forward now; the returned thunk fetches — the service
        pipelines finalize through this (decode/rescore.py
        llm_rescore_async)."""
        n = len(texts)
        ids = [self.encode(t, self.max_len) for t in texts]
        L = max(32, max(len(i) for i in ids))
        L = min(self.max_len, -(-L // 32) * 32)  # bucket for compile stability
        B = -(-n // self._pad_to) * self._pad_to
        tokens = np.zeros((B, L), np.int32)
        mask = np.zeros((B, L), np.float32)
        for i, seq in enumerate(ids):
            tokens[i, : len(seq)] = seq[:L]
            mask[i, : len(seq)] = 1.0
        sums, n_tokens = self._score(self.params, jnp.asarray(tokens),
                                     jnp.asarray(mask))

        def fetch() -> List[float]:
            s = np.asarray(sums)[:n]
            t = np.asarray(n_tokens)[:n]
            return (s - t * length_penalty).tolist()

        return fetch

    def score(self, texts: Sequence[str], length_penalty: float = 0.0) -> List[float]:
        return self.score_async(texts, length_penalty)()
