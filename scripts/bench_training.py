#!/usr/bin/env python
"""Training throughput at the reference's full configuration.

Reference baseline: 120k batches in ~3.5 h on an RTX 4090
(model_training/README.md:23) ≈ 9.5 steps/s at batch 64 — INCLUDING its
4-worker HDF5 DataLoader (rnn_trainer.py:511-524). Two measurements here:

  * device-step rate (default): the jitted train step (augmentations → bf16
    forward → CTC → 3-group AdamW update) with on-device synthetic batches —
    the CANONICAL number is the chained-sync rate (N data-dependent steps,
    one final fetch); the per-step-synced rate is reported alongside (it
    bills the axon tunnel's ~25 ms RTT to every step).
  * --full_input: the WHOLE input pipeline — reference-layout HDF5 sessions
    on disk → days-per-batch sampler → host loader → prefetch thread →
    device_put → the Trainer's own jitted step — apples-to-apples with the
    reference's DataLoader-included 9.5 steps/s.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def full_input_rate(n_steps: int = 160, bf16_transfer: bool = False) -> None:
    """HDF5 → sampler → prefetch → device_put → Trainer step, full shapes."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from b2txt_tpu.data import synthetic
    from b2txt_tpu.data.loader import prefetch_iterator
    from b2txt_tpu.train import Trainer
    from b2txt_tpu.utils import TrainConfig

    tmp = tempfile.mkdtemp(prefix="b2t_train_bench_")
    sessions = [f"t15.2024.01.{d:02d}" for d in range(1, 7)]
    t0 = time.perf_counter()
    # reference-length utterances: ~9 words x ~5 phones+SIL x 8 frames ≈ 380
    # bins at the full 512-feature width
    synthetic.write_synthetic_sessions(
        tmp, sessions, trials_per_session=96, neural_dim=512,
        min_words=7, max_words=11,
    )
    write_s = time.perf_counter() - t0

    cfg = TrainConfig()
    cfg.dataset.sessions = sessions
    cfg.dataset.dataset_probability_val = [1] * len(sessions)
    cfg.dataset.dataset_dir = tmp
    cfg.num_training_batches = n_steps + 20
    cfg.batches_per_val_step = 10 ** 9
    cfg.batches_per_train_log = 10 ** 9
    cfg.output_dir = tmp + "/out"
    cfg.checkpoint_dir = tmp + "/out/ckpt"
    cfg.save_best_checkpoint = False
    cfg.save_final_model = False
    if bf16_transfer:
        # halve the host-link bytes of the dominant buffer (features); the
        # step upcasts on device (TrainConfig.feature_transfer_dtype)
        cfg.feature_transfer_dtype = "bfloat16"

    trainer = Trainer(cfg)

    # ---- decomposition: where does the input-path time go?
    # (a) host loader alone: HDF5 reads + bucket/pad, no device involvement
    t0 = time.perf_counter()
    n_host = 24
    for i, _b in enumerate(trainer.train_loader):
        if i + 1 >= n_host:
            break
    host_rate = n_host / (time.perf_counter() - t0)
    # (b) host->device transfer alone (the axon-tunnel rig bottleneck: this
    # link runs ~20 MB/s; a real v5e host feeds chips over PCIe/DMA)
    b0 = trainer.train_loader.get_batch(0)
    mb = sum(v.nbytes for v in b0.values() if hasattr(v, "nbytes")) / 1e6
    t0 = time.perf_counter()
    for _ in range(4):
        d = jax.device_put(b0["input_features"])
        # sync via a full-array device reduce fetched as ONE scalar
        # (block_until_ready is unreliable through the tunnel; an element
        # read or strided slice can transfer whole buffers back)
        float(jnp.sum(d))
    put_rate = 4 / (time.perf_counter() - t0)
    print(f"  input decomposition: host loader {host_rate:.1f} batches/s, "
          f"device_put {put_rate:.2f} batches/s ({mb:.0f} MB/batch)",
          flush=True)

    it = prefetch_iterator(trainer.train_loader, to_device=True)
    base_key = jax.random.PRNGKey(0)

    def step(i, batch):
        key = jax.random.fold_in(base_key, i)
        out = trainer._train_step(
            trainer.params, trainer.opt_state, key,
            jnp.asarray(batch["input_features"]),
            jnp.asarray(batch["seq_class_ids"]),
            jnp.asarray(batch["n_time_steps"]),
            jnp.asarray(batch["phone_seq_lens"]),
            jnp.asarray(batch["day_indicies"]),
        )
        trainer.params, trainer.opt_state = out[0], out[1]
        return out[2]

    # warm: compile every T bucket the loader emits before timing
    warm = 20
    losses = []
    t_compile = time.perf_counter()
    for i, batch in enumerate(it):
        loss = step(i, batch)
        if i < warm:
            float(loss)  # sync through each warm step (compiles)
            if i == warm - 1:
                t0 = time.perf_counter()
                n0 = i + 1
            continue
        losses.append(loss)
        if len(losses) >= 64:   # chunked sync, as Trainer.train does
            np.asarray(jnp.stack(losses))  # ONE stacked fetch
            losses.clear()
    if losses:
        np.asarray(jnp.stack(losses))
    dt = time.perf_counter() - t0
    n = cfg.num_training_batches - n0
    print(f"full-input-path train steps/s: {n / dt:.2f} "
          f"(B={cfg.dataset.batch_size}, HDF5+sampler+prefetch+device_put+step;"
          f" reference w/ DataLoader: ~9.5 steps/s)")
    print(f"  warmup/compile {time.perf_counter() - t_compile - dt:.1f}s, "
          f"session write {write_s:.1f}s, "
          f"projected 120k batches: {120000 / (n / dt) / 3600:.2f} h")


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--full_input", action="store_true")
    ap.add_argument("--bf16_transfer", action="store_true",
                    help="with --full_input: transfer input_features as "
                         "bfloat16 (half the host-link bytes)")
    ap.add_argument("--steps", type=int, default=160)
    a = ap.parse_args()
    if a.full_input:
        full_input_rate(a.steps, bf16_transfer=a.bf16_transfer)
    else:
        main()
