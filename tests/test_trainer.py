"""Trainer integration: schedules/optimizer parity vs torch, and a small
end-to-end training run on synthetic data that must learn (loss down, PER down)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from b2txt_tpu.data import synthetic
from b2txt_tpu.train import Trainer, make_schedule, load_checkpoint
from b2txt_tpu.utils import TrainConfig


def _small_cfg(tmp_path, sessions, n_batches=40) -> TrainConfig:
    cfg = TrainConfig()
    cfg.model.n_input_features = 16
    cfg.model.n_units = 48
    cfg.model.n_layers = 2
    cfg.model.rnn_dropout = 0.0
    cfg.model.input_network.input_layer_dropout = 0.0
    cfg.model.input_network.input_layer_sizes = [16]
    cfg.dataset.neural_dim = 16
    cfg.dataset.sessions = sessions
    cfg.dataset.dataset_probability_val = [1] * len(sessions)
    cfg.dataset.batch_size = 8
    cfg.dataset.days_per_batch = 2
    cfg.dataset.dataset_dir = str(tmp_path)
    cfg.dataset.data_transforms.white_noise_std = 0.1
    cfg.dataset.data_transforms.constant_offset_std = 0.02
    cfg.num_training_batches = n_batches
    cfg.lr_decay_steps = n_batches
    cfg.lr_decay_steps_day = n_batches
    cfg.lr_warmup_steps = 5
    cfg.lr_warmup_steps_day = 5
    cfg.lr_max = 0.005
    cfg.lr_max_day = 0.005
    cfg.epsilon = 1e-8  # small model: reference eps=0.1 stalls tiny-dim training
    cfg.batches_per_train_log = 10
    cfg.batches_per_val_step = 20
    cfg.use_amp = False
    cfg.output_dir = str(tmp_path / "out")
    cfg.checkpoint_dir = str(tmp_path / "out" / "checkpoint")
    return cfg


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("train")
    sessions = ["t15.2023.08.11", "t15.2023.08.13", "t15.2023.08.18"]
    synthetic.write_synthetic_sessions(
        str(tmp_path), sessions, trials_per_session=16, neural_dim=16
    )
    cfg = _small_cfg(tmp_path, sessions)
    trainer = Trainer(cfg)
    stats = trainer.train()
    return cfg, trainer, stats


def test_cosine_schedule_matches_torch_lambda():
    import math

    cfg = TrainConfig()
    cfg.lr_max, cfg.lr_min = 0.005, 0.0001
    cfg.lr_decay_steps, cfg.lr_warmup_steps = 1000, 100
    sched = make_schedule(cfg, day=False)

    def torch_lambda(step, min_lr_ratio, decay_steps, warmup_steps):
        if step < warmup_steps:
            return float(step) / float(max(1, warmup_steps))
        if step < decay_steps:
            progress = float(step - warmup_steps) / float(max(1, decay_steps - warmup_steps))
            cosine_decay = 0.5 * (1 + math.cos(math.pi * progress))
            return max(min_lr_ratio, min_lr_ratio + (1 - min_lr_ratio) * cosine_decay)
        return min_lr_ratio

    for step in [0, 1, 50, 100, 101, 500, 999, 1000, 1500]:
        expected = cfg.lr_max * torch_lambda(step, cfg.lr_min / cfg.lr_max, 1000, 100)
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-6)


def test_linear_schedule_endpoints():
    cfg = TrainConfig()
    cfg.lr_scheduler_type = "linear"
    cfg.lr_max, cfg.lr_min, cfg.lr_decay_steps = 0.01, 0.001, 100
    sched = make_schedule(cfg, day=False)
    np.testing.assert_allclose(float(sched(0)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(200)), 0.001, rtol=1e-6)


def test_training_learns(trained):
    _, trainer, stats = trained
    early = np.mean(stats["train_losses"][:5])
    late = np.mean(stats["train_losses"][-5:])
    assert late < early * 0.7, f"loss did not decrease: {early:.3f} -> {late:.3f}"
    assert stats["val_PERs"][-1] < stats["val_PERs"][0] or stats["val_PERs"][-1] < 0.5


def test_bf16_transfer_step_parity(tmp_path_factory):
    """One jitted train step on a bf16-transferred batch matches the f32
    batch's loss to bf16 quantization noise: the loader emits half-size
    feature buffers (BatchLoader transfer_dtype) and loss_fn upcasts on
    device, so the augment/smooth/CTC path is unchanged."""
    import jax
    import jax.numpy as jnp

    tmp_path = tmp_path_factory.mktemp("bf16t")
    sessions = ["t15.2023.08.11", "t15.2023.08.13"]
    synthetic.write_synthetic_sessions(
        str(tmp_path), sessions, trials_per_session=8, neural_dim=16
    )
    cfg = _small_cfg(tmp_path, sessions, n_batches=2)
    tr = Trainer(cfg)
    cfg16 = _small_cfg(tmp_path, sessions, n_batches=2)
    cfg16.feature_transfer_dtype = "bfloat16"
    tr16 = Trainer(cfg16)  # same seeds → same sampled batches

    def one_loss(trainer):
        batch = trainer.train_loader.get_batch(0)
        out = trainer._train_step(
            trainer.params, trainer.opt_state, jax.random.PRNGKey(3),
            jnp.asarray(batch["input_features"]),
            jnp.asarray(batch["seq_class_ids"]),
            jnp.asarray(batch["n_time_steps"]),
            jnp.asarray(batch["phone_seq_lens"]),
            jnp.asarray(batch["day_indicies"]),
        )
        return float(out[2])

    l32, l16 = one_loss(tr), one_loss(tr16)
    assert abs(l32 - l16) <= 0.02 * max(abs(l32), 1.0), (l32, l16)


def test_checkpoint_saved_and_loadable(trained):
    cfg, trainer, _ = trained
    path = os.path.join(cfg.checkpoint_dir, "best_checkpoint")
    assert os.path.exists(path)
    ckpt = load_checkpoint(path)
    assert ckpt["val_PER"] <= 1.0
    assert os.path.exists(os.path.join(cfg.checkpoint_dir, "args.yaml"))

    # resume: fresh trainer initialized from the checkpoint reproduces val PER
    cfg2 = TrainConfig.from_dict(cfg.to_dict())
    cfg2.mode = "eval"
    cfg2.init_from_checkpoint = True
    cfg2.init_checkpoint_path = path
    cfg2.output_dir = cfg.output_dir + "_resume"
    cfg2.checkpoint_dir = cfg.output_dir + "_resume/ckpt"
    t2 = Trainer(cfg2)
    m = t2.validation()
    assert abs(m["avg_PER"] - ckpt["val_PER"]) < 0.05


def test_frozen_day_params(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("frozen")
    sessions = ["t15.2023.08.11", "t15.2023.08.13"]
    synthetic.write_synthetic_sessions(
        str(tmp_path), sessions, trials_per_session=8, neural_dim=16
    )
    cfg = _small_cfg(tmp_path, sessions, n_batches=3)
    cfg.model.input_network.input_trainable = False
    cfg.batches_per_val_step = 1000  # skip validation
    trainer = Trainer(cfg)
    day_w_before = np.asarray(trainer.params["day_w"]).copy()
    gru_before = np.asarray(trainer.params["layers"][0]["w_ih"]).copy()
    trainer.train()
    np.testing.assert_array_equal(np.asarray(trainer.params["day_w"]), day_w_before)
    assert not np.allclose(np.asarray(trainer.params["layers"][0]["w_ih"]), gru_before)
