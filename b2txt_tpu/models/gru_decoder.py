"""Day-adapted GRU phoneme decoder, TPU-native.

Parity target: ``model_training/rnn_model.py:10-134`` (GRUDecoder) — day-specific
512x512 input layers initialized to identity + softsign, optional input patching
(patch_size=14 / stride=4 → first-layer input 7168), a 5x768 unidirectional GRU
with learnable shared h0, and a linear head to 41 CTC classes.

TPU design notes:
  * Parameters are a plain pytree (dict) — functional, shardable with pjit.
  * Each layer computes the input projection for the WHOLE sequence as one big
    (B*T, in) x (in, 3H) matmul (MXU-friendly), then scans over time carrying
    only the hidden-state recurrence (B, H) x (H, 3H).
  * Gate math matches torch.nn.GRU exactly (r/z/n order, b_hh_n inside the
    reset-gate product) so the pretrained PyTorch checkpoint imports 1:1.
  * ``states`` can be passed/returned for streaming decode (rnn_model.py:88,122-132).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import ModelConfig

Params = Dict[str, Any]


def _xavier_uniform(key, shape, dtype=jnp.float32):
    fan_out, fan_in = shape[0], shape[1]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _orthogonal(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


def _uniform_pm(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_params(
    key: jax.Array,
    neural_dim: int = 512,
    n_units: int = 768,
    n_days: int = 45,
    n_classes: int = 41,
    n_layers: int = 5,
    patch_size: int = 14,
    patch_stride: int = 4,
) -> Params:
    """Initialize parameters with the reference's distributions
    (rnn_model.py:47-86): identity day weights, orthogonal W_hh, xavier W_ih,
    torch-default uniform GRU/head biases, xavier output weight and h0."""
    input_size = neural_dim * patch_size if patch_size > 0 else neural_dim
    keys = jax.random.split(key, 4 + 4 * n_layers)

    layers: List[Dict[str, jax.Array]] = []
    kb = 1.0 / np.sqrt(n_units)
    for l in range(n_layers):
        in_dim = input_size if l == 0 else n_units
        k_ih, k_hh, k_bih, k_bhh = keys[4 + 4 * l : 8 + 4 * l]
        layers.append(
            {
                "w_ih": _xavier_uniform(k_ih, (3 * n_units, in_dim)),
                "w_hh": _orthogonal(k_hh, (3 * n_units, n_units)),
                "b_ih": _uniform_pm(k_bih, (3 * n_units,), kb),
                "b_hh": _uniform_pm(k_bhh, (3 * n_units,), kb),
            }
        )

    k_out, k_outb, k_h0 = keys[0], keys[1], keys[2]
    return {
        "day_w": jnp.tile(jnp.eye(neural_dim)[None], (n_days, 1, 1)),
        "day_b": jnp.zeros((n_days, neural_dim)),
        "layers": layers,
        "out_w": _xavier_uniform(k_out, (n_classes, n_units)),
        "out_b": _uniform_pm(k_outb, (n_classes,), kb),
        "h0": _xavier_uniform(k_h0, (1, n_units)).reshape(n_units),
    }


def init_params_from_config(key: jax.Array, cfg: ModelConfig, n_days: int, n_classes: int) -> Params:
    return init_params(
        key,
        neural_dim=cfg.n_input_features,
        n_units=cfg.n_units,
        n_days=n_days,
        n_classes=n_classes,
        n_layers=cfg.n_layers,
        patch_size=cfg.patch_size,
        patch_stride=cfg.patch_stride,
    )


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def default_use_pallas() -> bool:
    """Resolve the ``use_pallas=None`` auto mode: the VMEM-resident Pallas
    recurrence kernel on real TPU; the XLA scan elsewhere (CPU test backend
    has no Mosaic lowering — interpret mode is for parity tests only)."""
    return jax.default_backend() == "tpu"


def extract_patches(x: jax.Array, patch_size: int, patch_stride: int) -> jax.Array:
    """(B, T, D) → (B, P, patch_size*D) sliding windows, feature-fastest order
    (parity with the unfold/permute/reshape at rnn_model.py:106-119)."""
    B, T, D = x.shape
    P = (T - patch_size) // patch_stride + 1
    idx = (
        jnp.arange(P, dtype=jnp.int32)[:, None] * patch_stride
        + jnp.arange(patch_size, dtype=jnp.int32)[None, :]
    )  # (P, patch_size)
    xp = x[:, idx, :]  # (B, P, patch_size, D)
    return xp.reshape(B, P, patch_size * D)


def _gru_layer(
    x: jax.Array,
    h0: jax.Array,
    layer: Dict[str, jax.Array],
    compute_dtype,
) -> Tuple[jax.Array, jax.Array]:
    """Run one GRU layer over a full sequence.

    x: (B, T, in), h0: (B, H). Returns (outputs (B, T, H), final h (B, H)).
    """
    w_ih = layer["w_ih"].astype(compute_dtype)
    w_hh = layer["w_hh"].astype(compute_dtype)
    b_ih = layer["b_ih"].astype(compute_dtype)
    b_hh = layer["b_hh"].astype(compute_dtype)
    H = w_hh.shape[1]

    # One big MXU matmul for the input projection of every timestep.
    x_proj = (
        jnp.einsum("bti,gi->btg", x.astype(compute_dtype), w_ih,
                   preferred_element_type=compute_dtype)
        + b_ih
    )  # (B, T, 3H)

    w_hh_T = w_hh.T  # (H, 3H)

    def step(h, xp_t):
        hh = (
            jnp.dot(h, w_hh_T, preferred_element_type=compute_dtype) + b_hh
        )  # (B, 3H)
        xr, xz, xn = xp_t[:, :H], xp_t[:, H : 2 * H], xp_t[:, 2 * H :]
        hr, hz, hn = hh[:, :H], hh[:, H : 2 * H], hh[:, 2 * H :]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h_final, outputs = jax.lax.scan(step, h0.astype(compute_dtype), jnp.moveaxis(x_proj, 1, 0))
    return jnp.moveaxis(outputs, 0, 1), h_final


def forward(
    params: Params,
    x: jax.Array,
    day_idx: jax.Array,
    *,
    states: Optional[jax.Array] = None,
    return_state: bool = False,
    training: bool = False,
    dropout_key: Optional[jax.Array] = None,
    input_dropout: float = 0.0,
    rnn_dropout: float = 0.0,
    patch_size: int = 14,
    patch_stride: int = 4,
    compute_dtype=jnp.float32,
    skip_day_layer: bool = False,
    use_pallas: Optional[bool] = None,
):
    """Forward pass. x: (B, T, D) features, day_idx: (B,) int day indices.

    ``skip_day_layer=True`` accepts pre-transformed (already day-projected and
    patched) inputs — used by the streaming service to feed overlapping patch
    windows with carried GRU state.

    Returns logits (B, P, C), and final hidden states (L, B, H) if return_state.
    """
    B = x.shape[0]
    n_layers = len(params["layers"])
    H = params["h0"].shape[-1]
    if use_pallas is None:
        # Auto mode: kernel on real TPU for batched work. Tiny batches stay
        # on the XLA scan — Mosaic cannot slice the kernel's (2, B, 3H) bf16
        # double buffer when B is below a sublane tile (streaming runs B=1) —
        # and very large batches overflow the ~16 MB VMEM scoped allocation
        # (W_hh^T 3.5 MB + double buffers scale with B; B=256 measured 16.1 MB
        # on the VJP path). 16 <= B <= 128 is the kernel's profitable window.
        use_pallas = default_use_pallas() and 16 <= B <= 128

    if not skip_day_layer:
        # Day-specific affine + softsign (rnn_model.py:94-99).
        day_w = params["day_w"][day_idx].astype(compute_dtype)  # (B, D, D)
        day_b = params["day_b"][day_idx].astype(compute_dtype)  # (B, D)
        x = (
            jnp.einsum("btd,bdk->btk", x.astype(compute_dtype), day_w,
                       preferred_element_type=compute_dtype)
            + day_b[:, None, :]
        )
        x = x / (1.0 + jnp.abs(x))  # softsign

        if training and input_dropout > 0:
            if dropout_key is None:
                raise ValueError("dropout_key required when training with dropout")
            dropout_key, sub = jax.random.split(dropout_key)
            keep = jax.random.bernoulli(sub, 1.0 - input_dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - input_dropout), 0.0).astype(compute_dtype)

    if patch_size > 0:
        x = extract_patches(x, patch_size, patch_stride)

    if states is None:
        h = jnp.broadcast_to(params["h0"].astype(compute_dtype), (n_layers, B, H))
    else:
        h = states.astype(compute_dtype)

    finals = []
    for l, layer in enumerate(params["layers"]):
        if use_pallas:
            # VMEM-resident recurrence kernel; differentiable (custom VJP
            # backs it with the reverse-time kernel), so training uses it too.
            from ..ops.pallas.gru import gru_layer_pallas

            x_proj = (
                jnp.einsum(
                    "bti,gi->btg", x.astype(compute_dtype),
                    layer["w_ih"].astype(compute_dtype),
                    preferred_element_type=compute_dtype,
                )
                + layer["b_ih"].astype(compute_dtype)
            )
            x, h_l = gru_layer_pallas(
                x_proj,
                layer["w_hh"].astype(compute_dtype),
                layer["b_hh"].astype(compute_dtype),
                h[l],
            )
        else:
            x, h_l = _gru_layer(x, h[l], layer, compute_dtype)
        finals.append(h_l)
        # Inter-layer dropout (not after the last layer), torch nn.GRU semantics.
        if training and rnn_dropout > 0 and l < n_layers - 1:
            dropout_key, sub = jax.random.split(dropout_key)
            keep = jax.random.bernoulli(sub, 1.0 - rnn_dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - rnn_dropout), 0.0).astype(compute_dtype)

    logits = (
        jnp.einsum("bth,ch->btc", x, params["out_w"].astype(compute_dtype),
                   preferred_element_type=compute_dtype)
        + params["out_b"].astype(compute_dtype)
    )

    if return_state:
        return logits, jnp.stack(finals, axis=0)
    return logits


class GRUDecoder:
    """Convenience object bundling config + params with a torch-like API."""

    def __init__(self, cfg: ModelConfig, n_days: int, n_classes: int,
                 params: Optional[Params] = None, seed: int = 0):
        self.cfg = cfg
        self.n_days = n_days
        self.n_classes = n_classes
        self.params = params if params is not None else init_params_from_config(
            jax.random.PRNGKey(seed), cfg, n_days, n_classes
        )

    def __call__(self, x, day_idx, states=None, return_state=False,
                 training=False, dropout_key=None, compute_dtype=jnp.float32):
        return forward(
            self.params, x, day_idx,
            states=states, return_state=return_state, training=training,
            dropout_key=dropout_key,
            input_dropout=self.cfg.input_network.input_layer_dropout,
            rnn_dropout=self.cfg.rnn_dropout,
            patch_size=self.cfg.patch_size, patch_stride=self.cfg.patch_stride,
            compute_dtype=compute_dtype,
        )

    def adjusted_lengths(self, n_time_steps: jax.Array) -> jax.Array:
        """Output sequence lengths after patching: (T - patch)/stride + 1
        (rnn_trainer.py:532)."""
        return (
            (n_time_steps - self.cfg.patch_size) // self.cfg.patch_stride + 1
        ).astype(jnp.int32)
