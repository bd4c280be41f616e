"""Sharded training step: data parallelism over "data" + tensor parallelism of
the GRU gate dimension over "model", via jit + NamedSharding annotations.

One step = augment → forward → CTC loss → psum'd grads → optax update, all
inside a single jitted program; XLA lowers the cross-device math to ICI
collectives (all-reduce for data-parallel grads, all-gather of the hidden
state between scan steps for the gate-sharded recurrence).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import gru_decoder
from ..ops.augment import TransformArgs, transform_data
from ..ops.ctc import ctc_loss
from ..utils.config import TrainConfig
from .mesh import batch_partition_specs, named_sharding_tree, param_partition_specs


def build_sharded_train_step(
    cfg: TrainConfig,
    params: Dict[str, Any],
    tx: optax.GradientTransformation,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    trainable_mask: Optional[Dict[str, Any]] = None,
):
    """Returns (step_fn, place_params, place_batch).

    step_fn(params, opt_state, key, batch) -> (params, opt_state, loss,
    grad_norm) with explicit input/output shardings so the compiled program is
    fully SPMD. ``trainable_mask`` zeroes updates for frozen parameters
    (rnn_trainable / input_trainable semantics).
    """
    targs = TransformArgs.from_config(cfg.dataset.data_transforms)

    p_specs = param_partition_specs(params)
    p_shard = named_sharding_tree(p_specs, mesh)
    b_specs = batch_partition_specs()
    b_shard = {k: NamedSharding(mesh, s) for k, s in b_specs.items()}
    repl = NamedSharding(mesh, P())

    def loss_fn(params, key, batch):
        k_aug, k_drop = jax.random.split(key)
        feats, n_time = transform_data(
            k_aug, batch["input_features"], batch["n_time_steps"], targs, training=True
        )
        adjusted = (
            (n_time - cfg.model.patch_size) // cfg.model.patch_stride + 1
        ).astype(jnp.int32)
        logits = gru_decoder.forward(
            params, feats, batch["day_indicies"],
            training=True, dropout_key=k_drop,
            input_dropout=cfg.model.input_network.input_layer_dropout,
            rnn_dropout=cfg.model.rnn_dropout,
            patch_size=cfg.model.patch_size,
            patch_stride=cfg.model.patch_stride,
            compute_dtype=compute_dtype,
        )
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        losses = ctc_loss(
            log_probs, batch["seq_class_ids"], adjusted, batch["phone_seq_lens"]
        )
        return jnp.mean(losses)

    def step(params, opt_state, key, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, key, batch)
        if trainable_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, trainable_mask
            )
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, grad_norm

    opt_state_proto = jax.eval_shape(tx.init, params)
    # Optimizer-state leaves that mirror a param shape (adam mu/nu) take that
    # param's spec; scalars (counts) stay replicated.
    param_leaves = jax.tree_util.tree_leaves(params)
    param_spec_leaves = jax.tree_util.tree_leaves(
        p_specs, is_leaf=lambda x: isinstance(x, P)
    )
    shape_to_spec = {}
    for leaf, spec in zip(param_leaves, param_spec_leaves):
        shape_to_spec.setdefault(tuple(leaf.shape), spec)

    def opt_state_spec(leaf):
        spec = shape_to_spec.get(tuple(leaf.shape), P())
        return NamedSharding(mesh, spec)

    opt_shard = jax.tree_util.tree_map(opt_state_spec, opt_state_proto)

    step_jit = jax.jit(
        step,
        in_shardings=(p_shard, opt_shard, repl, b_shard),
        out_shardings=(p_shard, opt_shard, repl, repl),
        donate_argnums=(0, 1),
    )

    def place_params(params):
        # Copy through host so the placed (donatable) buffers never alias the
        # caller's arrays — step_jit donates its params/opt_state arguments.
        import numpy as np

        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(np.asarray(x), s), params, p_shard
        )

    def place_batch(batch):
        return {
            k: jax.device_put(jnp.asarray(v), b_shard[k])
            for k, v in batch.items()
            if k in b_shard
        }

    return step_jit, place_params, place_batch


def build_sharded_forward(
    cfg: TrainConfig,
    params: Dict[str, Any],
    mesh: Mesh,
    compute_dtype=jnp.bfloat16,
):
    """Sharded *inference*: batch over "data", GRU gate dimension over
    "model" — the deployment-side counterpart of the sharded train step.
    Returns (fwd_fn, place_params): fwd_fn(params, x, day_idx) → (logits,
    greedy ids), fully SPMD (the greedy argmax+collapse runs sharded too).
    """
    from ..ops.ctc import greedy_decode_ids

    p_specs = param_partition_specs(params)
    p_shard = named_sharding_tree(p_specs, mesh)
    x_shard = NamedSharding(mesh, P("data", None, None))
    day_shard = NamedSharding(mesh, P("data"))
    out_shard = NamedSharding(mesh, P("data", None, None))
    ids_shard = NamedSharding(mesh, P("data", None))

    def fwd(params, x, day_idx):
        logits = gru_decoder.forward(
            params, x, day_idx,
            patch_size=cfg.model.patch_size,
            patch_stride=cfg.model.patch_stride,
            compute_dtype=compute_dtype,
        )
        P_len = logits.shape[1]
        ids = greedy_decode_ids(
            logits.astype(jnp.float32),
            jnp.full((logits.shape[0],), P_len, jnp.int32),
        )
        return logits, ids

    fwd_jit = jax.jit(
        fwd,
        in_shardings=(p_shard, x_shard, day_shard),
        out_shardings=(out_shard, ids_shard),
    )

    def place_params(params):
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), params, p_shard
        )

    return fwd_jit, place_params
