"""Optimizer + LR schedules: 3-param-group AdamW with per-group cosine/linear
warmup decay.

Parity target: ``rnn_trainer.py:259-363`` — biases (gru.bias*, out.bias) get
weight_decay 0; day parameters get their own lr/decay/warmup schedule and
weight_decay; everything else (W_ih, W_hh, out.weight, h0) gets the main
schedule. AdamW betas/eps/weight-decay semantics match torch (decay coupled
with the scheduled lr). The scheduler multiplier at step 0 is 0 (warmup
ramp starts at 0), exactly like LambdaLR stepping after each optimizer step.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import optax

from ..utils.config import TrainConfig


def lr_lambda(step, min_lr_ratio: float, decay_steps: int, warmup_steps: int):
    """The reference's cosine multiplier (rnn_trainer.py:306-326), traceable."""
    import jax.numpy as jnp

    step = jnp.asarray(step, jnp.float32)
    warm = step / jnp.maximum(1.0, float(warmup_steps))
    progress = (step - warmup_steps) / max(1.0, float(decay_steps - warmup_steps))
    cosine = 0.5 * (1.0 + jnp.cos(math.pi * progress))
    decay_val = jnp.maximum(
        min_lr_ratio, min_lr_ratio + (1.0 - min_lr_ratio) * cosine
    )
    out = jnp.where(step < warmup_steps, warm, decay_val)
    return jnp.where(step >= decay_steps, min_lr_ratio, out)


def make_schedule(cfg: TrainConfig, day: bool):
    if day:
        lr_max, lr_min = cfg.lr_max_day, cfg.lr_min_day
        decay, warmup = cfg.lr_decay_steps_day, cfg.lr_warmup_steps_day
    else:
        lr_max, lr_min = cfg.lr_max, cfg.lr_min
        decay, warmup = cfg.lr_decay_steps, cfg.lr_warmup_steps

    if cfg.lr_scheduler_type == "cosine":
        def sched(step):
            return lr_max * lr_lambda(step, lr_min / lr_max, decay, warmup)
        return sched
    elif cfg.lr_scheduler_type == "linear":
        # torch LinearLR: factor interpolates 1.0 → end_factor over total_iters.
        end_factor = lr_min / lr_max

        def sched(step):
            import jax.numpy as jnp

            frac = jnp.minimum(jnp.asarray(step, jnp.float32) / max(1, decay), 1.0)
            return lr_max * (1.0 + frac * (end_factor - 1.0))
        return sched
    raise ValueError(f"Invalid lr_scheduler_type: {cfg.lr_scheduler_type}")


def param_labels(params: Dict[str, Any]) -> Dict[str, Any]:
    """Label each leaf with its optimizer group (rnn_trainer.py:267-269)."""
    labels = jax.tree_util.tree_map(lambda _: "other", params)
    labels["day_w"] = "day"
    labels["day_b"] = "day"
    labels["layers"] = [
        {"w_ih": "other", "w_hh": "other", "b_ih": "bias", "b_hh": "bias"}
        for _ in params["layers"]
    ]
    labels["out_b"] = "bias"
    return labels


def make_optimizer(cfg: TrainConfig, params: Dict[str, Any]) -> optax.GradientTransformation:
    """clip_by_global_norm → 3-group AdamW with scheduled lrs."""
    main_sched = make_schedule(cfg, day=False)
    day_sched = make_schedule(cfg, day=True)

    def adamw(sched, wd):
        return optax.adamw(
            learning_rate=sched,
            b1=cfg.beta0,
            b2=cfg.beta1,
            eps=cfg.epsilon,
            weight_decay=wd,
        )

    groups = {
        "bias": adamw(main_sched, 0.0),
        "day": adamw(day_sched, cfg.weight_decay_day),
        "other": adamw(main_sched, cfg.weight_decay),
    }
    tx = optax.multi_transform(groups, param_labels(params))
    if cfg.grad_norm_clip_value > 0:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_norm_clip_value), tx)
    return tx


def trainability_mask(cfg: TrainConfig, params: Dict[str, Any]) -> Dict[str, Any]:
    """True where a parameter is trainable (rnn_trainer.py:249-254: only
    'gru*' params freeze with rnn_trainable=False, only 'day*' params with
    input_trainable=False; the head and h0 always train)."""
    gru_on = bool(cfg.model.rnn_trainable)
    day_on = bool(cfg.model.input_network.input_trainable)
    return {
        "day_w": day_on,
        "day_b": day_on,
        "layers": [
            {"w_ih": gru_on, "w_hh": gru_on, "b_ih": gru_on, "b_hh": gru_on}
            for _ in params["layers"]
        ],
        "out_w": True,
        "out_b": True,
        "h0": True,
    }
