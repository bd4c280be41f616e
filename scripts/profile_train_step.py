#!/usr/bin/env python
"""Ablate the full training step to locate the MFU ceiling.

The round-2 step is 77.9 ms (12.8 steps/s) at B=64/T=512 ≈ 1.6 TFLOP ≈ 10%
MFU on a ~197 TFLOP/s bf16 v5e. This times each stage in isolation (on-chip
synthetic batches, host fetch for sync): augmentations, forward (XLA vs
Pallas GRU, 1 vs 5 layers), CTC, optimizer update, full grad step, and a
batch-size sweep — the recurrence amortization lever.

  nohup timeout 3600 python scripts/profile_train_step.py > /tmp/prof_train.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.makedirs(os.path.expanduser("~/.cache/jax_comp_cache"), exist_ok=True)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from b2txt_tpu.models import gru_decoder  # noqa: E402
from b2txt_tpu.ops.augment import TransformArgs, transform_data  # noqa: E402
from b2txt_tpu.ops.ctc import ctc_loss  # noqa: E402
from b2txt_tpu.train.optimizer import make_optimizer  # noqa: E402
from b2txt_tpu.utils import TrainConfig  # noqa: E402


def timeit(fn, *args, iters=20, reps=3):
    """fn must return a SCALAR (or tiny) array — through the axon tunnel,
    fetching one element of a big device array can transfer the whole
    buffer, so syncing on param trees pollutes the timing by seconds."""
    r = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(r)[-1]).ravel()[0])
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(r)[-1]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import argparse

    argparse.ArgumentParser(
        description="Decompose the training step's device cost "
        "(transform/forward/loss/backward) at production shapes"
    ).parse_args()
    # backend init only AFTER argparse: --help must not touch the axon
    # tunnel (it can wedge for tens of minutes, and the plugin ignores
    # JAX_PLATFORMS=cpu from the environment)
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    cfg = TrainConfig()
    D, S = cfg.model.n_input_features, 128
    T = 512
    targs = TransformArgs.from_config(cfg.dataset.data_transforms)
    params = gru_decoder.init_params_from_config(
        jax.random.PRNGKey(0), cfg.model, n_days=45, n_classes=41
    )
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    def report(name, ms, extra=None):
        print(json.dumps({"stage": name, "ms": round(ms * 1e3, 2),
                          **(extra or {})}), flush=True)

    def batch_for(B, k):
        k1, k2 = jax.random.split(k)
        feats = jax.random.normal(k1, (B, T, D), jnp.float32)
        labels = jax.random.randint(k2, (B, S), 1, 41)
        return feats, labels

    def loss_fn(params, key, feats, labels, B, use_pallas, n_layers=None):
        k_aug, k_drop = jax.random.split(key)
        n_time = jnp.full((B,), T, jnp.int32)
        feats, n_time = transform_data(k_aug, feats, n_time, targs,
                                       training=True)
        adjusted = ((n_time - cfg.model.patch_size)
                    // cfg.model.patch_stride + 1)
        logits = gru_decoder.forward(
            params, feats, jnp.arange(B, dtype=jnp.int32) % 45, training=True,
            dropout_key=k_drop,
            input_dropout=cfg.model.input_network.input_layer_dropout,
            rnn_dropout=cfg.model.rnn_dropout,
            patch_size=cfg.model.patch_size,
            patch_stride=cfg.model.patch_stride,
            compute_dtype=jnp.bfloat16, use_pallas=use_pallas,
        )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.mean(ctc_loss(lp, labels, adjusted.astype(jnp.int32),
                                 jnp.full((B,), 60, jnp.int32)))

    use_pallas_default = jax.default_backend() == "tpu"
    for B in (64, 128, 256):
        flops = 3 * B * (  # fwd (1x) + bwd (2x) matmul FLOPs, T'=125
            125 * (7168 + 4 * 768 + 768 * 5) * 2304 * 2 + 125 * 768 * 41 * 2
        )

        @jax.jit
        def steps_chained(params, opt_state, k, B=B, n=10):
            """n chained steps in ONE device call: each step consumes the
            previous params, so nothing can overlap away, and only the final
            scalar loss is fetched (tunnel-safe sync)."""

            def body(carry, i):
                params, opt_state = carry
                kk = jax.random.fold_in(k, i)
                feats, labels = batch_for(B, kk)
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, kk, feats, labels, B, None
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u, params, updates
                )
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(n)
            )
            return losses[-1]

        try:
            ms = timeit(lambda: steps_chained(params, opt_state,
                                              jax.random.PRNGKey(1)),
                        iters=1, reps=3) / 10.0
            report(f"full_step_B{B}", ms, {
                "steps_per_sec": round(1 / ms, 2),
                "sentences_per_sec": round(B / ms, 1),
                "mfu_pct": round(100 * flops / ms / 197e12, 1),
            })
        except Exception as e:
            print(f"full_step_B{B} failed: {type(e).__name__}", flush=True)

    B = 64
    feats, labels = (np.random.default_rng(0).standard_normal(
        (B, T, D)).astype(np.float32),
        np.random.default_rng(1).integers(1, 41, (B, S)).astype(np.int32))
    feats, labels = jnp.asarray(feats), jnp.asarray(labels)

    @jax.jit
    def aug_only(k, feats):
        out, nt = transform_data(k, feats, jnp.full((B,), T, jnp.int32),
                                 targs, training=True)
        return out.sum()

    report("augment_only", timeit(lambda: aug_only(jax.random.PRNGKey(0),
                                                   feats)))

    for name, up, nl in (("fwd_pallas", True, None), ("fwd_xla", False, None)):
        @jax.jit
        def fwd(params, feats, up=up):
            logits = gru_decoder.forward(
                params, feats, jnp.arange(B, dtype=jnp.int32) % 45,
                patch_size=cfg.model.patch_size,
                patch_stride=cfg.model.patch_stride,
                compute_dtype=jnp.bfloat16, use_pallas=up,
            )
            return logits.sum()

        try:
            report(name, timeit(lambda: fwd(params, feats)))
        except Exception as e:
            print(f"{name} failed: {e}", flush=True)

    # forward with fewer GRU layers: recurrence share
    for nl in (1, 5):
        cfg_l = TrainConfig()
        cfg_l.model.n_layers = nl
        p_l = gru_decoder.init_params_from_config(
            jax.random.PRNGKey(0), cfg_l.model, n_days=45, n_classes=41
        )

        @jax.jit
        def fwd_l(p, feats):
            return gru_decoder.forward(
                p, feats, jnp.arange(B, dtype=jnp.int32) % 45,
                patch_size=cfg.model.patch_size,
                patch_stride=cfg.model.patch_stride,
                compute_dtype=jnp.bfloat16,
                use_pallas=use_pallas_default,
            ).sum()

        report(f"fwd_layers{nl}", timeit(lambda: fwd_l(p_l, feats)))

    # CTC alone on random logits
    lp = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(2), (B, 125, 41)), -1
    )

    @jax.jit
    def ctc_only(lp, labels):
        return jnp.mean(ctc_loss(lp, labels, jnp.full((B,), 125, jnp.int32),
                                 jnp.full((B,), 60, jnp.int32)))

    report("ctc_fwd_only", timeit(lambda: ctc_only(lp, labels)))

    @jax.jit
    def ctc_grad(lp, labels):
        return jax.grad(lambda l: jnp.mean(ctc_loss(
            l, labels, jnp.full((B,), 125, jnp.int32),
            jnp.full((B,), 60, jnp.int32))))(lp).sum()

    report("ctc_grad", timeit(lambda: ctc_grad(lp, labels)))

    # optimizer update alone
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)

    @jax.jit
    def opt_only(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree_util.tree_map(lambda p, u: p + u, params, updates
                                      ), opt_state

    report("optimizer_only", timeit(lambda: opt_only(params, opt_state, grads)))


if __name__ == "__main__":
    main()
