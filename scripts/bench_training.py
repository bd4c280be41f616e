#!/usr/bin/env python
"""Training throughput at the reference's full configuration.

Reference baseline: 120k batches in ~3.5 h on an RTX 4090
(model_training/README.md:23) ≈ 9.5 steps/s at batch 64. This measures the
jitted train step (augmentations → bf16 forward → CTC → 3-group AdamW update)
on one TPU chip with on-device synthetic batches, and projects the 120k-batch
wall-clock.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from b2txt_tpu.models import gru_decoder
    from b2txt_tpu.ops.augment import TransformArgs, transform_data
    from b2txt_tpu.ops.ctc import ctc_loss
    from b2txt_tpu.train.optimizer import make_optimizer
    from b2txt_tpu.utils import TrainConfig

    cfg = TrainConfig()
    B, T, D, S = cfg.dataset.batch_size, 512, cfg.model.n_input_features, 128
    params = gru_decoder.init_params_from_config(
        jax.random.PRNGKey(0), cfg.model, n_days=45, n_classes=41
    )
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    targs = TransformArgs.from_config(cfg.dataset.data_transforms)

    def loss_fn(params, key, feats, labels, n_time, lab_lens, day_idx):
        k_aug, k_drop = jax.random.split(key)
        feats, n_time = transform_data(k_aug, feats, n_time, targs, training=True)
        adjusted = ((n_time - cfg.model.patch_size) // cfg.model.patch_stride + 1)
        logits = gru_decoder.forward(
            params, feats, day_idx, training=True, dropout_key=k_drop,
            input_dropout=cfg.model.input_network.input_layer_dropout,
            rnn_dropout=cfg.model.rnn_dropout,
            patch_size=cfg.model.patch_size, patch_stride=cfg.model.patch_stride,
            compute_dtype=jnp.bfloat16,
        )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.mean(ctc_loss(lp, labels, adjusted.astype(jnp.int32), lab_lens))

    @jax.jit
    def one_step(params, opt_state, k):
        """One full training step; synthetic batch generated on-chip so the
        tunnel is out of the measurement."""
        k1, k2, k3 = jax.random.split(k, 3)
        feats = jax.random.normal(k1, (B, T, D), jnp.float32)
        labels = jax.random.randint(k2, (B, S), 1, 41)
        lab_lens = jnp.full((B,), 60, jnp.int32)
        n_time = jnp.full((B,), T, jnp.int32)
        day_idx = jax.random.randint(k3, (B,), 0, 45)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, k, feats, labels, n_time, lab_lens, day_idx
        )
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    print(f"compiling train step (B={B}, T={T}, D={D})...", file=sys.stderr)
    params, opt_state, loss = one_step(params, opt_state, jax.random.PRNGKey(0))
    print("loss[0] =", float(loss), file=sys.stderr)

    # Sustained rate: N async dispatches, ONE final sync — matching how the
    # trainer actually runs (it fetches metrics every 200 steps, so steps
    # pipeline; a per-step fetch would bill the axon tunnel's ~25 ms RTT to
    # every step). The per-step-synced rate is reported alongside.
    n_steps = 40
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, loss = one_step(
            params, opt_state, jax.random.PRNGKey(i + 1)
        )
    float(loss)  # one sync at the end (steps are data-dependent chained)
    dt = time.perf_counter() - t0
    steps_per_sec = n_steps / dt

    t0 = time.perf_counter()
    for i in range(10):
        params, opt_state, loss = one_step(
            params, opt_state, jax.random.PRNGKey(100 + i)
        )
        float(loss)
    synced_rate = 10 / (time.perf_counter() - t0)

    print(f"train steps/s: {steps_per_sec:.2f} sustained "
          f"({synced_rate:.2f} with a per-step host sync; "
          f"reference RTX 4090: ~9.5 steps/s)")
    print(f"projected 120k-batch wall-clock: {120000 / steps_per_sec / 3600:.2f} h "
          f"(reference: ~3.5 h)")


if __name__ == "__main__":
    main()
