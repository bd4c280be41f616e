"""OPT-architecture causal LM in JAX: HF weight import + TP sharding specs.

The reference loads facebook/opt-6.7b fp16 through HF transformers on a
second GPU and rescores n-best hypotheses with token-logprob sums
(language-model-standalone.py:92-161). This module is the TPU-native
equivalent: the exact OPT decoder architecture as a pure-JAX forward —

  * learned positional embeddings with the OPT offset of 2, indexed by the
    attention-mask cumsum (so padding never advances the position counter),
  * pre-LN blocks (do_layer_norm_before=True, the 6.7b configuration) with
    ReLU MLPs and per-layer `final_layer_norm` between attention and MLP,
  * decoder-level final layer norm and an lm_head tied to embed_tokens —

plus `params_from_hf` (HF state_dict → pytree, transposing torch's (out, in)
Linear layout), `partition_specs` (tensor parallelism: attention heads and
the FFN hidden dimension shard over "model"; embeddings replicate — at 6.7b
scale shard the vocab too and psum the logits if HBM-bound), and
`OPTRescorer` implementing the LLMScorer protocol. Architecture parity vs
`transformers.OPTForCausalLM` is tested on a tiny random config
(tests/test_opt_lm.py); the 6.7b TP specs are compile-tested on the virtual
8-device mesh.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]

POS_OFFSET = 2  # OPT's learned-position offset (OPTLearnedPositionalEmbedding)


@dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 4096
    ffn_dim: int = 16384
    num_layers: int = 32
    num_heads: int = 32
    max_position_embeddings: int = 2048

    @classmethod
    def opt_6_7b(cls) -> "OPTConfig":
        return cls()  # defaults are the 6.7b shapes (README.md:101, ~13 GB fp16)

    @classmethod
    def tiny(cls, vocab: int = 97) -> "OPTConfig":
        return cls(vocab_size=vocab, hidden_size=32, ffn_dim=64,
                   num_layers=2, num_heads=4, max_position_embeddings=64)


def init_params(key: jax.Array, cfg: OPTConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 2 + 6 * cfg.num_layers)
    D, F = cfg.hidden_size, cfg.ffn_dim
    s = 0.02

    def norm():
        return {"g": jnp.ones(D, dtype), "b": jnp.zeros(D, dtype)}

    layers = []
    for i in range(cfg.num_layers):
        k = jax.random.split(ks[2 + i], 6)
        layers.append({
            "ln_attn": norm(),
            "q_w": s * jax.random.normal(k[0], (D, D), dtype),
            "q_b": jnp.zeros(D, dtype),
            "k_w": s * jax.random.normal(k[1], (D, D), dtype),
            "k_b": jnp.zeros(D, dtype),
            "v_w": s * jax.random.normal(k[2], (D, D), dtype),
            "v_b": jnp.zeros(D, dtype),
            "o_w": s * jax.random.normal(k[3], (D, D), dtype),
            "o_b": jnp.zeros(D, dtype),
            "ln_mlp": norm(),
            "fc1_w": s * jax.random.normal(k[4], (D, F), dtype),
            "fc1_b": jnp.zeros(F, dtype),
            "fc2_w": s * jax.random.normal(k[5], (F, D), dtype),
            "fc2_b": jnp.zeros(D, dtype),
        })
    return {
        "embed_tokens": s * jax.random.normal(ks[0], (cfg.vocab_size, D), dtype),
        "embed_positions": s * jax.random.normal(
            ks[1], (cfg.max_position_embeddings + POS_OFFSET, D), dtype
        ),
        "layers": layers,
        "ln_f": {"g": jnp.ones(D, dtype), "b": jnp.zeros(D, dtype)},
    }


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def forward(
    params: Params,
    tokens: jax.Array,            # (B, L) int32
    attention_mask: jax.Array,    # (B, L) 1.0 = real token
    cfg: OPTConfig,
    compute_dtype=jnp.float32,
    positions: Optional[jax.Array] = None,     # (B, L) int32 within-sequence
    segment_ids: Optional[jax.Array] = None,   # (B, L) int32, 0 = padding
    prefix_kv: Optional[List] = None,          # per-layer (k, v) (1, C, H, hd)
    prefix_mask: Optional[jax.Array] = None,   # (1, C) 1.0 = real prefix tok
    return_kv: bool = False,
):
    """Logits (B, L, vocab). Matches transformers.OPTForCausalLM with
    do_layer_norm_before=True and tied lm_head (modeling parity tested).

    With ``segment_ids`` supplied, each row may pack several independent
    sequences: attention becomes block-diagonal×causal (a token attends only
    within its own segment) and ``positions`` must give the 0-based index of
    each token *within its segment* — sequence packing for the rescorer's
    short n-best hypotheses, whose forward is otherwise padded-tokens-bound
    (10-token hypotheses in 16-token rows).

    ``prefix_kv`` cross-attends every query to a cached context's keys and
    values (positions must then be offset by the prefix length by the
    caller): because causal hidden states never depend on later positions,
    the cached K/V equal what a concatenated context+hypothesis forward
    would compute — the shared-context rescoring path runs the context ONCE
    instead of once per candidate. ``return_kv`` collects this cache.
    """
    B, L = tokens.shape
    D = cfg.hidden_size
    hd = D // cfg.num_heads
    cast = lambda a: a.astype(compute_dtype)  # noqa: E731

    emb = cast(params["embed_tokens"])
    if positions is None:
        # OPT position ids: cumsum of the attention mask (padding holds
        # position)
        positions = (jnp.cumsum(attention_mask, axis=1) * attention_mask
                     ).astype(jnp.int32) - 1
    x = emb[tokens] + cast(params["embed_positions"])[
        jnp.clip(positions, -1, cfg.max_position_embeddings - 1) + POS_OFFSET
    ]

    causal = jnp.tril(jnp.ones((L, L), bool))
    pad_ok = attention_mask[:, None, None, :] > 0.5        # (B,1,1,L)
    mask = causal[None, None] & pad_ok
    if segment_ids is not None:
        same = segment_ids[:, :, None] == segment_ids[:, None, :]  # (B,L,L)
        mask = mask & same[:, None]
    if prefix_kv is not None:
        # every query may attend to every REAL prefix position (the prefix
        # is wholly earlier in the causal order); prefix keys prepend along
        # the key axis below
        C = prefix_kv[0][0].shape[1]
        if prefix_mask is None:
            pm = jnp.ones((1, 1, 1, C), bool)
        else:
            pm = (prefix_mask > 0.5)[:, None, None, :]
        mask = jnp.concatenate(
            [jnp.broadcast_to(pm, (B, 1, L, C)), mask], axis=-1
        )
    # the compute dtype's OWN finite min (transformers uses torch.finfo(dtype)
    # .min likewise): f32's min cast to bf16 rounds to -inf, and a fully
    # masked padding-query row would then softmax to NaN, which 0-weight ×
    # NaN spreads into real positions through the next layer's values
    neg = jnp.asarray(jnp.finfo(compute_dtype).min, compute_dtype)

    kv_cache: List = []
    for li, blk in enumerate(params["layers"]):
        h = _ln(x, jax.tree_util.tree_map(cast, blk["ln_attn"]))
        q = (h @ cast(blk["q_w"]) + cast(blk["q_b"])) * (hd ** -0.5)
        k = h @ cast(blk["k_w"]) + cast(blk["k_b"])
        v = h @ cast(blk["v_w"]) + cast(blk["v_b"])
        q = q.reshape(B, L, cfg.num_heads, hd)
        k = k.reshape(B, L, cfg.num_heads, hd)
        v = v.reshape(B, L, cfg.num_heads, hd)
        if return_kv:
            kv_cache.append((k, v))
        if prefix_kv is not None:
            kp, vp = prefix_kv[li]
            k = jnp.concatenate(
                [jnp.broadcast_to(cast(kp), (B,) + kp.shape[1:]), k], axis=1
            )
            v = jnp.concatenate(
                [jnp.broadcast_to(cast(vp), (B,) + vp.shape[1:]), v], axis=1
            )
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=compute_dtype)
        att = jnp.where(mask, att, neg)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(
            compute_dtype
        )
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v,
                       preferred_element_type=compute_dtype).reshape(B, L, D)
        x = x + o @ cast(blk["o_w"]) + cast(blk["o_b"])

        h = _ln(x, jax.tree_util.tree_map(cast, blk["ln_mlp"]))
        h = jax.nn.relu(h @ cast(blk["fc1_w"]) + cast(blk["fc1_b"]))
        x = x + h @ cast(blk["fc2_w"]) + cast(blk["fc2_b"])

    x = _ln(x, jax.tree_util.tree_map(cast, params["ln_f"]))
    logits = (x @ emb.T).astype(jnp.float32)
    if return_kv:
        return logits, kv_cache
    return logits


def params_from_hf(state_dict: Dict[str, Any], cfg: OPTConfig) -> Params:
    """HF OPTForCausalLM state_dict → pytree. Accepts torch tensors or numpy
    arrays; torch Linear weights are (out, in) and get transposed."""

    def a(name):
        t = state_dict[name]
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return jnp.asarray(np.asarray(t, np.float32))

    def lin(prefix):
        return a(prefix + ".weight").T, a(prefix + ".bias")

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.decoder.layers.{i}"
        q_w, q_b = lin(p + ".self_attn.q_proj")
        k_w, k_b = lin(p + ".self_attn.k_proj")
        v_w, v_b = lin(p + ".self_attn.v_proj")
        o_w, o_b = lin(p + ".self_attn.out_proj")
        fc1_w, fc1_b = lin(p + ".fc1")
        fc2_w, fc2_b = lin(p + ".fc2")
        layers.append({
            "ln_attn": {"g": a(p + ".self_attn_layer_norm.weight"),
                        "b": a(p + ".self_attn_layer_norm.bias")},
            "q_w": q_w, "q_b": q_b, "k_w": k_w, "k_b": k_b,
            "v_w": v_w, "v_b": v_b, "o_w": o_w, "o_b": o_b,
            "ln_mlp": {"g": a(p + ".final_layer_norm.weight"),
                       "b": a(p + ".final_layer_norm.bias")},
            "fc1_w": fc1_w, "fc1_b": fc1_b,
            "fc2_w": fc2_w, "fc2_b": fc2_b,
        })
    return {
        "embed_tokens": a("model.decoder.embed_tokens.weight"),
        "embed_positions": a("model.decoder.embed_positions.weight"),
        "layers": layers,
        "ln_f": {"g": a("model.decoder.final_layer_norm.weight"),
                 "b": a("model.decoder.final_layer_norm.bias")},
    }


def partition_specs(cfg: OPTConfig) -> Params:
    """Tensor-parallel layout over a ("data", "model") mesh: attention
    projections shard by head (columns of q/k/v, rows of out) and the FFN
    hidden dim shards likewise — the all-reduce after out_proj/fc2 is XLA's
    to insert. Embeddings and norms replicate."""
    norm = {"g": P(), "b": P()}
    layer = {
        "ln_attn": dict(norm),
        "q_w": P(None, "model"), "q_b": P("model"),
        "k_w": P(None, "model"), "k_b": P("model"),
        "v_w": P(None, "model"), "v_b": P("model"),
        "o_w": P("model", None), "o_b": P(),
        "ln_mlp": dict(norm),
        "fc1_w": P(None, "model"), "fc1_b": P("model"),
        "fc2_w": P("model", None), "fc2_b": P(),
    }
    return {
        "embed_tokens": P(), "embed_positions": P(),
        "layers": [dict(layer) for _ in range(cfg.num_layers)],
        "ln_f": dict(norm),
    }


def score_tokens_fn(cfg: OPTConfig, compute_dtype=jnp.float32):
    """Returns f(params, tokens, mask) → (sum log P(token), n_scored) per
    row — the reference's rescore_with_gpt2 numerator (standalone :127-161)."""

    def score(params, tokens, mask):
        logits = forward(params, tokens, mask, cfg, compute_dtype)
        lp = jax.nn.log_softmax(logits, axis=-1)
        tok_lp = jnp.take_along_axis(
            lp[:, :-1], tokens[:, 1:, None], axis=2
        )[..., 0]
        tok_lp = tok_lp * mask[:, 1:]
        return tok_lp.sum(axis=1), mask.sum(axis=1)

    return score


def score_packed_fn(cfg: OPTConfig, n_segments: int, compute_dtype=jnp.float32):
    """Packed-row variant of :func:`score_tokens_fn`: rows carry several
    independent hypotheses (block-diagonal causal attention via
    ``segment_ids``), and per-hypothesis (Σ log P, n_tokens) come back as
    device segment-sums indexed by segment id (1-based; index 0 collects
    padding and cross-segment boundaries and is discarded). ``n_segments``
    is the static segment-sum width (bucketed count + 1)."""

    def score(params, tokens, segment_ids, positions):
        mask = (segment_ids > 0).astype(jnp.float32)
        logits = forward(params, tokens, mask, cfg, compute_dtype,
                         positions=positions, segment_ids=segment_ids)
        lp = jax.nn.log_softmax(logits, axis=-1)
        tok_lp = jnp.take_along_axis(
            lp[:, :-1], tokens[:, 1:, None], axis=2
        )[..., 0]                                      # (B, L-1): t → t+1
        valid = (segment_ids[:, :-1] == segment_ids[:, 1:]) & (
            segment_ids[:, 1:] > 0
        )
        seg = jnp.where(valid, segment_ids[:, 1:], 0)
        sums = jax.ops.segment_sum(
            (tok_lp * valid).reshape(-1), seg.reshape(-1),
            num_segments=n_segments,
        )
        # n_tokens counts every real token of the segment (the first,
        # unscored one included) — the unpacked path's mask.sum parity
        cnt = jax.ops.segment_sum(
            mask.reshape(-1), segment_ids.reshape(-1),
            num_segments=n_segments,
        )
        return sums, cnt

    return score


def score_prefix_packed_fn(
    cfg: OPTConfig, n_segments: int, compute_dtype=jnp.float32
):
    """Shared-context variant of :func:`score_packed_fn` for the reference's
    conversational rescoring mode (gpt2_lm_decode's context prefix,
    standalone :165-199): every candidate is scored as context+hypothesis,
    but the context forward runs ONCE — its per-layer K/V are cached and
    cross-attended by the packed hypothesis rows — instead of once per
    candidate (the reference re-runs the full concatenation for each of the
    ~100 candidates).

    Per-hypothesis sums include the context's own token log-probs (a shared
    constant — kept for exact parity with concatenated scoring) and the
    cross-boundary P(first hyp token | context) read from the context's last
    real position; counts include the context tokens. ``positions`` must be
    0-based WITHIN each hypothesis; the prefix offset is added here.
    """

    def score(params, ctx, n_ctx, tokens, segment_ids, positions):
        # ctx (1, Cb) right-padded; n_ctx () int32 = real length (incl. BOS)
        Cb = ctx.shape[1]
        ctx_mask = (jnp.arange(Cb) < n_ctx)[None, :].astype(jnp.float32)
        ctx_logits, kv = forward(params, ctx, ctx_mask, cfg, compute_dtype,
                                 return_kv=True)
        clp = jax.nn.log_softmax(ctx_logits, axis=-1)          # (1, Cb, V)
        # context self-score: P(ctx[j] | ctx[<j]) for j = 1..n_ctx-1
        pair_lp = jnp.take_along_axis(
            clp[0, :-1], ctx[0, 1:, None], axis=-1
        )[..., 0]
        ctx_sum = (pair_lp * (jnp.arange(Cb - 1) < n_ctx - 1)).sum()
        last_row = clp[0, n_ctx - 1]                           # (V,)

        mask = (segment_ids > 0).astype(jnp.float32)
        logits = forward(params, tokens, mask, cfg, compute_dtype,
                         positions=positions + n_ctx, segment_ids=segment_ids,
                         prefix_kv=kv, prefix_mask=ctx_mask)
        lp = jax.nn.log_softmax(logits, axis=-1)
        tok_lp = jnp.take_along_axis(
            lp[:, :-1], tokens[:, 1:, None], axis=2
        )[..., 0]
        valid = (segment_ids[:, :-1] == segment_ids[:, 1:]) & (
            segment_ids[:, 1:] > 0
        )
        seg = jnp.where(valid, segment_ids[:, 1:], 0)
        sums = jax.ops.segment_sum(
            (tok_lp * valid).reshape(-1), seg.reshape(-1),
            num_segments=n_segments,
        )
        # each hypothesis' FIRST token is scored from the context's last row
        first = (segment_ids > 0) & (positions == 0)
        first_lp = last_row[tokens] * first
        sums = sums + jax.ops.segment_sum(
            first_lp.reshape(-1),
            jnp.where(first, segment_ids, 0).reshape(-1),
            num_segments=n_segments,
        )
        cnt = jax.ops.segment_sum(
            mask.reshape(-1), segment_ids.reshape(-1),
            num_segments=n_segments,
        )
        # context log-prob and token count are shared constants — included
        # so totals equal concatenated context+hypothesis scoring exactly
        return sums + ctx_sum, cnt + n_ctx

    return score


def word_hash_encode(vocab_size: int) -> Callable[[str, int], List[int]]:
    """Stable ~1-token-per-word encoder for throughput drives with random
    weights: matches GPT2-BPE's token COUNT on short hypotheses (~1.3
    tokens/word) without needing the (undownloadable) vocab files. Real
    deployments pass utils.bpe.ByteBPE.for_opt(...) instead."""
    import zlib

    def enc(text: str, max_len: int) -> List[int]:
        ids = [2]  # OPT BOS
        for w in text.split():
            # crc32, not hash(): builtin str hash is salted per process and
            # would make a drive's scores/exact counts non-reproducible
            ids.append((zlib.crc32(w.encode()) % (vocab_size - 10)) + 10)
        return ids[:max_len]

    return enc


def pack_sequences(ids: Sequence[Sequence[int]], capacity: int):
    """First-fit-decreasing bin packing of token id lists into rows of
    ``capacity`` tokens. Returns rows: for each row a list of
    (original_index, seq) pairs."""
    order = sorted(range(len(ids)), key=lambda i: -len(ids[i]))
    rows: List[List[tuple]] = []
    space: List[int] = []
    for i in order:
        seq = list(ids[i])[:capacity]
        for r, free in enumerate(space):
            if free >= len(seq):
                rows[r].append((i, seq))
                space[r] = free - len(seq)
                break
        else:
            rows.append([(i, seq)])
            space.append(capacity - len(seq))
    return rows


class OPTRescorer:
    """LLMScorer over the OPT forward. score(texts) = Σ token log-probs −
    length_penalty · n_tokens (parity: rescore_with_gpt2, standalone
    :127-161). ``encode`` maps text → token ids — the reference uses the HF
    GPT2-BPE tokenizer (standalone :115-123); pass a
    ``b2txt_tpu.utils.bpe.ByteBPE`` (e.g. ``ByteBPE.for_opt(vocab, merges)``)
    or any (text, max_len) → ids callable. Without one, a byte-mod-vocab
    stand-in is used FOR TESTS ONLY and a loud warning is emitted — its
    scores are meaningless against real OPT weights. Pass a Mesh for pjit
    TP/DP sharding."""

    def __init__(
        self,
        cfg: OPTConfig,
        params: Optional[Params] = None,
        encode: Optional[Callable[[str, int], List[int]]] = None,
        mesh: Optional[Mesh] = None,
        max_len: int = 256,
        compute_dtype=jnp.float32,
        seed: int = 0,
        pack: bool = True,
        encode_cont: Optional[Callable[[str, int], List[int]]] = None,
    ):
        self.cfg = cfg
        self.max_len = min(max_len, cfg.max_position_embeddings)
        self.pack = pack
        self.compute_dtype = compute_dtype
        self._packed: Dict[int, Callable] = {}
        self._prefix: Dict[int, Callable] = {}
        if encode is None:
            import logging

            logging.getLogger("b2txt_tpu.opt").warning(
                "OPTRescorer: no tokenizer supplied — falling back to a "
                "byte-mod-vocab stand-in. Scores are MEANINGLESS with real "
                "OPT weights; pass encode=ByteBPE.for_opt(vocab.json, "
                "merges.txt) (utils/bpe.py) for the reference's GPT2-BPE "
                "behavior (standalone :115-123)."
            )
            encode = (
                lambda t, n: [b % cfg.vocab_size for b in t.encode("utf-8")][:n]
            )
            if encode_cont is None:
                # the stand-in is byte-wise with no BOS: continuation encode
                # is the same map
                encode_cont = encode
        if encode_cont is None and hasattr(encode, "encode"):
            # ByteBPE-style tokenizer: continuation = no BOS. GPT-2's
            # pretokenizer splits at spaces (the space belongs to the next
            # chunk), so encode(ctx) + encode(" "+hyp, no BOS) equals
            # encode(ctx+" "+hyp) — tested in tests/test_bpe.py
            encode_cont = lambda t, n: encode.encode(t, add_bos=False)[:n]  # noqa: E731
        self.encode = encode
        self.encode_cont = encode_cont
        # llm_rescore passes context separately to scorers advertising this
        # (the prefix-KV path scores it once instead of per candidate)
        self.supports_context = True
        self.params = params if params is not None else init_params(
            jax.random.PRNGKey(seed), cfg
        )
        score = score_tokens_fn(cfg, compute_dtype)
        self.mesh = mesh
        if mesh is not None:
            specs = partition_specs(cfg)
            self._param_shard = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), specs,
                is_leaf=lambda x: isinstance(x, P),
            )
            data = NamedSharding(mesh, P("data", None))
            repl = NamedSharding(mesh, P("data"))
            self.params = jax.tree_util.tree_map(
                jax.device_put, self.params, self._param_shard
            )
            self._score = jax.jit(
                score, in_shardings=(self._param_shard, data, data),
                out_shardings=(repl, repl),
            )
            self._pad_to = mesh.shape["data"]
        else:
            self._param_shard = None
            self._score = jax.jit(score)
            self._pad_to = 1

    def _packed_score_fn(self, n_segments: int) -> Callable:
        fn = self._packed.get(n_segments)
        if fn is None:
            score = score_packed_fn(self.cfg, n_segments, self.compute_dtype)
            if self.mesh is not None:
                data = NamedSharding(self.mesh, P("data", None))
                repl = NamedSharding(self.mesh, P())
                fn = jax.jit(
                    score,
                    in_shardings=(self._param_shard, data, data, data),
                    out_shardings=(repl, repl),
                )
            else:
                fn = jax.jit(score)
            self._packed[n_segments] = fn
        return fn

    def _pack_arrays(self, ids: List[List[int]]):
        """First-fit-decreasing packing of token lists into padded arrays.
        Row count is bucketed so varying n-best sizes (augment_nbest) don't
        each compile a fresh 6.7b program through the remote compiler."""
        n = len(ids)
        longest = max((len(s) for s in ids), default=1)
        L = min(self.max_len, max(64, -(-longest // 16) * 16))
        rows = pack_sequences(ids, L)
        row_pad = max(8, self._pad_to)
        B = -(-max(len(rows), 1) // row_pad) * row_pad
        n_segments = (-(-max(n, 1) // 32) * 32) + 1  # +1: index-0 trash bin
        tokens = np.zeros((B, L), np.int32)
        seg = np.zeros((B, L), np.int32)
        pos = np.zeros((B, L), np.int32)
        for r, row in enumerate(rows):
            off = 0
            for orig_idx, s in row:
                tokens[r, off : off + len(s)] = s
                seg[r, off : off + len(s)] = orig_idx + 1
                pos[r, off : off + len(s)] = np.arange(len(s))
                off += len(s)
        return tokens, seg, pos, n_segments

    def _score_packed_begin(
        self, ids: List[List[int]], length_penalty: float
    ) -> Callable[[], List[float]]:
        """Pack the hypotheses several-per-row (block-diagonal attention) so
        the 6.7b forward runs over ~real-token counts instead of one padded
        16-token row per ~10-token hypothesis. Score-identical to the
        unpacked path (tests/test_opt_lm.py packed-parity). Dispatches the
        forward and returns a zero-arg fetch — JAX dispatch is async, so the
        host only blocks inside the fetch."""
        n = len(ids)
        tokens, seg, pos, n_segments = self._pack_arrays(ids)
        fn = self._packed_score_fn(n_segments)
        sums, cnt = fn(self.params, jnp.asarray(tokens), jnp.asarray(seg),
                       jnp.asarray(pos))

        def fetch() -> List[float]:
            s = np.asarray(sums)[1 : n + 1]
            c = np.asarray(cnt)[1 : n + 1]
            return (s - c * length_penalty).tolist()

        return fetch

    def _prefix_score_fn(self, n_segments: int) -> Callable:
        fn = self._prefix.get(n_segments)
        if fn is None:
            score = score_prefix_packed_fn(self.cfg, n_segments,
                                           self.compute_dtype)
            if self.mesh is not None:
                data = NamedSharding(self.mesh, P("data", None))
                repl = NamedSharding(self.mesh, P())
                repl2 = NamedSharding(self.mesh, P(None, None))
                fn = jax.jit(
                    score,
                    in_shardings=(self._param_shard, repl2, repl,
                                  data, data, data),
                    out_shardings=(repl, repl),
                )
            else:
                fn = jax.jit(score)
            self._prefix[n_segments] = fn
        return fn

    def _score_prefix_begin(
        self, context: str, texts: Sequence[str], length_penalty: float
    ) -> Callable[[], List[float]]:
        """Shared-context scoring: tokenize the context once (with BOS), the
        hypotheses as continuations (leading space, no BOS — a GPT-2
        pretoken boundary, so the ids equal the concatenated encode), run
        the context forward once and cross-attend the packed hypotheses to
        its cached K/V (score_prefix_packed_fn)."""
        ctx_ids = self.encode(context, self.max_len)
        if not ctx_ids:  # unreachable via llm_rescore (it checks .split())
            ids = [self.encode(t, self.max_len) for t in texts]
            return self._score_packed_begin(ids, length_penalty)
        ids = [self.encode_cont(" " + t, self.max_len) for t in texts]
        longest = max((len(s) for s in ids), default=1)
        limit = min(self.max_len, self.cfg.max_position_embeddings)
        if len(ctx_ids) + longest > limit:
            # the concatenated path truncates ctx+hyp at max_len; score the
            # same truncations so the exact-parity contract holds (and
            # positions never clip past max_position_embeddings)
            ids = [self.encode(context + " " + t, self.max_len)
                   for t in texts]
            return self._score_packed_begin(ids, length_penalty)
        n = len(ids)
        tokens, seg, pos, n_segments = self._pack_arrays(ids)
        Cb = -(-len(ctx_ids) // 32) * 32  # bucket the context length too
        ctx = np.zeros((1, Cb), np.int32)
        ctx[0, : len(ctx_ids)] = ctx_ids
        fn = self._prefix_score_fn(n_segments)
        sums, cnt = fn(self.params, jnp.asarray(ctx),
                       jnp.asarray(len(ctx_ids), jnp.int32),
                       jnp.asarray(tokens), jnp.asarray(seg),
                       jnp.asarray(pos))

        def fetch() -> List[float]:
            s = np.asarray(sums)[1 : n + 1]
            c = np.asarray(cnt)[1 : n + 1]
            return (s - c * length_penalty).tolist()

        return fetch

    def _score_unpacked_begin(
        self, ids: List[List[int]], length_penalty: float
    ) -> Callable[[], List[float]]:
        n = len(ids)
        # short n-best hypotheses are ~10 tokens: a 16-token L bucket halves
        # the padded token count vs a 32 floor (the forward is
        # padded-tokens-bound at 6.7b — measured 0.37 s per 100-candidate
        # list at (128, 32) vs ~0.2 expected at (128, 16))
        L = max(16, max((len(i) for i in ids), default=1))
        L = min(self.max_len, -(-L // 16) * 16)
        # bucket the batch too: augment_nbest makes candidate counts vary per
        # utterance, and every distinct (B, L) would recompile the full-size
        # forward (minutes at 6.7b through the remote compiler)
        B = max(32, -(-n // 32) * 32)
        B = -(-B // self._pad_to) * self._pad_to
        tokens = np.zeros((B, L), np.int32)
        mask = np.zeros((B, L), np.float32)
        for i, seq in enumerate(ids):
            tokens[i, : len(seq)] = seq[:L]
            mask[i, : len(seq)] = 1.0
        sums, n_tok = self._score(self.params, jnp.asarray(tokens),
                                  jnp.asarray(mask))

        def fetch() -> List[float]:
            s = np.asarray(sums)[:n]
            t = np.asarray(n_tok)[:n]
            return (s - t * length_penalty).tolist()

        return fetch

    def score_async(
        self,
        texts: Sequence[str],
        length_penalty: float = 0.0,
        context: Optional[str] = None,
    ) -> Callable[[], List[float]]:
        """Dispatch the scoring forward NOW; the returned zero-arg callable
        fetches the scores. Lets a caller overlap the next utterance's host
        finalize work (augment, packing) under this utterance's device
        forward — see decode/rescore.py llm_rescore_async.

        With ``context``, each text is scored as context+text (the
        reference's conversational mode, standalone :165-199) — via the
        prefix-KV path (context forward runs once) when available, else by
        concatenation (identical totals either way)."""
        if context:
            if self.pack and self.encode_cont is not None:
                return self._score_prefix_begin(context, texts,
                                                length_penalty)
            texts = [context + " " + t for t in texts]
        ids = [self.encode(t, self.max_len) for t in texts]
        if self.pack:
            return self._score_packed_begin(ids, length_penalty)
        return self._score_unpacked_begin(ids, length_penalty)

    def score(
        self,
        texts: Sequence[str],
        length_penalty: float = 0.0,
        context: Optional[str] = None,
    ) -> List[float]:
        return self.score_async(texts, length_penalty, context=context)()
