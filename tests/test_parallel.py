"""Multi-device sharding on the virtual 8-device CPU mesh: sharded training
step compiles + executes, matches the single-device step numerically, and
actually distributes the arrays."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from b2txt_tpu.models import gru_decoder
from b2txt_tpu.parallel import (
    build_sharded_train_step,
    make_mesh,
    param_partition_specs,
    shard_params,
)
from b2txt_tpu.train.optimizer import make_optimizer
from b2txt_tpu.utils import TrainConfig


def _tiny_cfg():
    cfg = TrainConfig()
    cfg.model.n_input_features = 16
    cfg.model.n_units = 32          # 3H=96 divisible by model axis 2/4
    cfg.model.n_layers = 2
    cfg.model.rnn_dropout = 0.0
    cfg.model.input_network.input_layer_dropout = 0.0
    cfg.dataset.data_transforms.random_cut = 0
    cfg.dataset.data_transforms.white_noise_std = 0.1
    cfg.epsilon = 1e-8
    return cfg


def _batch(rng, B=8, T=64, D=16, S=12):
    return {
        "input_features": rng.standard_normal((B, T, D)).astype(np.float32),
        "seq_class_ids": rng.integers(1, 41, (B, S)).astype(np.int32),
        "n_time_steps": np.full((B,), T, np.int32),
        "phone_seq_lens": rng.integers(4, S + 1, (B,)).astype(np.int32),
        "day_indicies": (rng.integers(0, 3, (B,))).astype(np.int32),
    }


@pytest.mark.parametrize("model_parallel", [1, 2, 4])
def test_sharded_step_runs(rng, model_parallel):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = _tiny_cfg()
    mesh = make_mesh(8, model_parallel=model_parallel)
    params = gru_decoder.init_params_from_config(
        jax.random.PRNGKey(0), cfg.model, n_days=3, n_classes=41
    )
    tx = make_optimizer(cfg, params)
    step, place_params, place_batch = build_sharded_train_step(cfg, params, tx, mesh)

    p = place_params(params)
    opt_state = tx.init(p)
    batch = place_batch(_batch(rng))
    p2, opt_state, loss, gnorm = step(p, opt_state, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))
    # a second step with the updated state also runs
    p3, opt_state, loss2, _ = step(p2, opt_state, jax.random.PRNGKey(2), batch)
    assert np.isfinite(float(loss2))


def test_sharded_matches_single_device(rng):
    """Same seed, same batch → sharded loss == single-device loss."""
    cfg = _tiny_cfg()
    cfg.dataset.data_transforms.white_noise_std = 0.0
    cfg.dataset.data_transforms.constant_offset_std = 0.0
    cfg.dataset.data_transforms.random_cut = 0

    params = gru_decoder.init_params_from_config(
        jax.random.PRNGKey(0), cfg.model, n_days=3, n_classes=41
    )
    tx = make_optimizer(cfg, params)
    batch_np = _batch(rng)

    # single-device reference
    mesh1 = make_mesh(1)
    step1, pp1, pb1 = build_sharded_train_step(cfg, params, tx, mesh1)
    p1 = pp1(params)
    o1 = tx.init(p1)
    p1b, o1b, loss1, _ = step1(p1, o1, jax.random.PRNGKey(5), pb1(batch_np))

    mesh = make_mesh(8, model_parallel=2)
    step8, pp8, pb8 = build_sharded_train_step(cfg, params, tx, mesh)
    p8 = pp8(params)
    o8 = tx.init(p8)
    p8b, o8b, loss8, _ = step8(p8, o8, jax.random.PRNGKey(5), pb8(batch_np))

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1b["layers"][0]["w_hh"]),
        np.asarray(p8b["layers"][0]["w_hh"]),
        rtol=1e-4, atol=1e-6,
    )


def test_params_actually_sharded(rng):
    cfg = _tiny_cfg()
    mesh = make_mesh(8, model_parallel=4)
    params = gru_decoder.init_params_from_config(
        jax.random.PRNGKey(0), cfg.model, n_days=3, n_classes=41
    )
    sharded = shard_params(params, mesh)
    w = sharded["layers"][0]["w_hh"]
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(w.shape[0] // 4, w.shape[1])}
    assert len(w.sharding.device_set) == 8


def test_trainer_with_mesh(rng, tmp_path):
    """Trainer(mesh=...) trains SPMD end-to-end on the virtual mesh."""
    from b2txt_tpu.data import synthetic
    from b2txt_tpu.train import Trainer
    from b2txt_tpu.utils import TrainConfig

    sessions = ["t15.2023.08.11", "t15.2023.08.13"]
    synthetic.write_synthetic_sessions(str(tmp_path), sessions,
                                       trials_per_session=8, neural_dim=16)
    cfg = _tiny_cfg()
    cfg.dataset.neural_dim = 16
    cfg.dataset.sessions = sessions
    cfg.dataset.dataset_probability_val = [1, 1]
    cfg.dataset.batch_size = 8
    cfg.dataset.days_per_batch = 2
    cfg.dataset.dataset_dir = str(tmp_path)
    cfg.num_training_batches = 10
    cfg.lr_decay_steps = cfg.lr_decay_steps_day = 10
    cfg.lr_warmup_steps = cfg.lr_warmup_steps_day = 2
    cfg.batches_per_train_log = 5
    cfg.batches_per_val_step = 100  # skip validation
    cfg.use_amp = False
    cfg.output_dir = str(tmp_path / "out")
    cfg.checkpoint_dir = str(tmp_path / "out" / "ckpt")

    mesh = make_mesh(8, model_parallel=2)
    trainer = Trainer(cfg, mesh=mesh)
    stats = trainer.train()
    losses = stats["train_losses"]
    assert len(losses) == 10 and np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # sane trajectory
    # params remained sharded across the mesh
    w = trainer.params["layers"][0]["w_hh"]
    assert len(w.sharding.device_set) == 8
