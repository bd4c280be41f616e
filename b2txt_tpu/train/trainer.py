"""Training loop for the brain-to-text GRU decoder.

Parity target: ``rnn_trainer.py:27-770`` (BrainToTextDecoder_Trainer): dataset
construction via train_test_split + day-sampled batches, device augmentations,
bf16 compute, CTC loss, 3-group AdamW + cosine warmup, grad clipping, periodic
validation with greedy-CTC PER (per-day breakdown), best-PER checkpointing with
loss tiebreak, early stopping, metrics pickles, and train_val_trials.json
provenance.

TPU design: one jitted, donated train step (augment → forward → CTC → update)
compiled per (T, S) bucket; data parallelism over a mesh is provided by
``parallel.dp`` and plugs in as an alternative step function.
"""

from __future__ import annotations

import functools
import json
import os
import pickle
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.hdf5_store import train_test_split_indices
from ..data.loader import BatchLoader, prefetch_iterator
from ..data.sampler import BatchSampler
from ..models import gru_decoder
from ..ops.augment import TransformArgs, transform_data
from ..ops.ctc import batched_greedy_collapse, ctc_loss, greedy_decode_ids
from ..utils.config import TrainConfig
from ..utils.logging import make_logger
from ..utils.metrics import batch_greedy_per
from .checkpoint import load_checkpoint, save_checkpoint
from .optimizer import make_optimizer, trainability_mask



def _flush_losses(pending: list, out: list) -> None:
    """Convert accumulated device loss scalars in ONE stacked fetch (a
    per-scalar float() would pay the ~25 ms tunnel RTT once per element)."""
    if pending:
        out.extend(np.asarray(jnp.stack(pending)).astype(float).tolist())
        pending.clear()

class Trainer:
    def __init__(self, cfg: TrainConfig, logger=None, mesh=None):
        """``mesh``: optional jax.sharding.Mesh with ("data", "model") axes —
        enables the SPMD train step (DP batch sharding + TP of the GRU gate
        dimension, parallel/dp.py). cfg.dataset.batch_size must be divisible
        by the data axis."""
        self.cfg = cfg
        self.mesh = mesh
        self.logger = logger or make_logger(
            "b2txt_tpu.train",
            os.path.join(cfg.output_dir, "training_log") if cfg.mode == "train" else None,
        )

        if cfg.mode == "train":
            os.makedirs(cfg.output_dir, exist_ok=True)
        if cfg.save_best_checkpoint or cfg.save_all_val_steps or cfg.save_final_model:
            os.makedirs(cfg.checkpoint_dir, exist_ok=True)

        self.best_val_per = float("inf")
        self.best_val_loss = float("inf")

        # Model params
        key = jax.random.PRNGKey(cfg.seed if cfg.seed != -1 else 0)
        self.n_days = len(cfg.dataset.sessions)
        self.params = gru_decoder.init_params_from_config(
            key, cfg.model, self.n_days, cfg.dataset.n_classes
        )
        self.logger.info(
            f"Initialized GRU decoder: {gru_decoder.param_count(self.params):,} parameters "
            f"on {jax.default_backend()}"
        )

        # Datasets
        train_paths = [
            os.path.join(cfg.dataset.dataset_dir, s, "data_train.hdf5")
            for s in cfg.dataset.sessions
        ]
        val_paths = [
            os.path.join(cfg.dataset.dataset_dir, s, "data_val.hdf5")
            for s in cfg.dataset.sessions
        ]
        if len(set(train_paths)) != len(train_paths):
            raise ValueError("There are duplicate sessions listed in the train dataset")

        train_trials, _ = train_test_split_indices(
            train_paths, test_percentage=0, seed=cfg.dataset.seed
        )
        _, val_trials = train_test_split_indices(
            val_paths, test_percentage=1, seed=cfg.dataset.seed
        )

        if cfg.mode == "train":
            with open(os.path.join(cfg.output_dir, "train_val_trials.json"), "w") as f:
                json.dump({"train": train_trials, "val": val_trials}, f)

        self.train_sampler = BatchSampler(
            train_trials,
            n_batches=cfg.num_training_batches,
            split="train",
            batch_size=cfg.dataset.batch_size,
            days_per_batch=cfg.dataset.days_per_batch,
            random_seed=cfg.dataset.seed,
            must_include_days=cfg.dataset.must_include_days,
            feature_subset=cfg.dataset.feature_subset,
        )
        self.val_sampler = BatchSampler(
            val_trials,
            n_batches=None,
            split="test",
            batch_size=cfg.dataset.batch_size,
            random_seed=cfg.dataset.seed,
            feature_subset=cfg.dataset.feature_subset,
        )
        self.train_loader = BatchLoader(
            self.train_sampler, transfer_dtype=cfg.feature_transfer_dtype
        )
        self.val_loader = BatchLoader(
            self.val_sampler, transfer_dtype=cfg.feature_transfer_dtype
        )

        # Optimizer
        self.tx = make_optimizer(cfg, self.params)
        self.opt_state = self.tx.init(self.params)
        self.train_mask = trainability_mask(cfg, self.params)
        self.step = 0

        self.transform_args = TransformArgs.from_config(cfg.dataset.data_transforms)
        self.compute_dtype = jnp.bfloat16 if cfg.use_amp else jnp.float32

        if cfg.init_from_checkpoint:
            self.load(cfg.init_checkpoint_path)

        if mesh is not None:
            from ..parallel.dp import build_sharded_train_step

            data_axis = mesh.shape["data"]
            if cfg.dataset.batch_size % data_axis != 0:
                raise ValueError(
                    f"batch_size {cfg.dataset.batch_size} not divisible by "
                    f"data axis {data_axis}"
                )
            sharded_step, place_params, _ = build_sharded_train_step(
                cfg, self.params, self.tx, mesh,
                compute_dtype=self.compute_dtype,
                trainable_mask=self.train_mask,
            )
            self.params = place_params(self.params)
            self.opt_state = self.tx.init(self.params)

            def step(params, opt_state, key, feats, labels, n_time, lab_lens, day_idx):
                batch = {
                    "input_features": feats, "seq_class_ids": labels,
                    "n_time_steps": n_time, "phone_seq_lens": lab_lens,
                    "day_indicies": day_idx,
                }
                return sharded_step(params, opt_state, key, batch)

            self._train_step = step
            self.logger.info(
                f"SPMD training over mesh data={mesh.shape['data']} "
                f"model={mesh.shape['model']}"
            )
        else:
            self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # ------------------------------------------------------------------ steps
    def _build_train_step(self):
        cfg = self.cfg
        targs = self.transform_args
        mask = self.train_mask

        def loss_fn(params, key, feats, labels, n_time, lab_lens, day_idx):
            # bf16-transferred batches upcast on device (no-op for f32); the
            # augment/smooth path then runs in f32 exactly as the reference's
            feats = feats.astype(jnp.float32)
            k_aug, k_drop = jax.random.split(key)
            if cfg.use_fused_preprocess:
                from ..ops.pallas.preprocess import fused_preprocess

                feats, n_time = fused_preprocess(
                    k_aug, feats, n_time, targs, training=True
                )
            else:
                feats, n_time = transform_data(
                    k_aug, feats, n_time, targs, training=True
                )
            adjusted = (
                (n_time - cfg.model.patch_size) // cfg.model.patch_stride + 1
            ).astype(jnp.int32)
            logits = gru_decoder.forward(
                params, feats, day_idx,
                training=True, dropout_key=k_drop,
                input_dropout=cfg.model.input_network.input_layer_dropout,
                rnn_dropout=cfg.model.rnn_dropout,
                patch_size=cfg.model.patch_size,
                patch_stride=cfg.model.patch_stride,
                compute_dtype=self.compute_dtype,
                use_pallas=cfg.use_pallas_gru,
            )
            log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            losses = ctc_loss(log_probs, labels, adjusted, lab_lens)
            return jnp.mean(losses)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, key, feats, labels, n_time, lab_lens, day_idx):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, key, feats, labels, n_time, lab_lens, day_idx
            )
            grads = jax.tree_util.tree_map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, mask
            )
            grad_norm = optax.global_norm(grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, grad_norm

        return train_step

    def _build_eval_step(self):
        cfg = self.cfg
        targs = self.transform_args

        @jax.jit
        def eval_step(params, feats, labels, n_time, lab_lens, day_idx):
            feats = feats.astype(jnp.float32)
            feats, n_time = transform_data(
                jax.random.PRNGKey(0), feats, n_time, targs, training=False
            )
            adjusted = (
                (n_time - cfg.model.patch_size) // cfg.model.patch_stride + 1
            ).astype(jnp.int32)
            logits = gru_decoder.forward(
                params, feats, day_idx,
                patch_size=cfg.model.patch_size,
                patch_stride=cfg.model.patch_stride,
                compute_dtype=self.compute_dtype,
                use_pallas=cfg.use_pallas_gru,
            )
            log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            losses = ctc_loss(log_probs, labels, adjusted, lab_lens)
            ids = greedy_decode_ids(log_probs, adjusted)
            return logits.astype(jnp.float32), jnp.mean(losses), ids, adjusted

        return eval_step

    # ------------------------------------------------------------------ train
    def train(self) -> Dict[str, Any]:
        cfg = self.cfg
        train_losses, val_losses, val_pers, val_results = [], [], [], []
        pending_losses: list = []
        val_steps_since_improvement = 0
        train_start = time.time()
        base_key = jax.random.PRNGKey(cfg.seed if cfg.seed != -1 else 0)

        i = 0
        for i, batch in enumerate(prefetch_iterator(self.train_loader)):
            t0 = time.time()
            key = jax.random.fold_in(base_key, i)
            self.params, self.opt_state, loss, grad_norm = self._train_step(
                self.params, self.opt_state, key,
                jnp.asarray(batch["input_features"]),
                jnp.asarray(batch["seq_class_ids"]),
                jnp.asarray(batch["n_time_steps"]),
                jnp.asarray(batch["phone_seq_lens"]),
                jnp.asarray(batch["day_indicies"]),
            )
            self.step += 1
            # loss stays a DEVICE scalar between log points: a per-step
            # float() would serialize every step on the host sync (through
            # the axon tunnel that bills ~25 ms RTT per step); converting in
            # chunks keeps dispatch pipelined — the trainer's sustained rate
            # IS the async rate (see docs/DESIGN.md training methodology)
            pending_losses.append(loss)

            if i % cfg.batches_per_train_log == 0:
                _flush_losses(pending_losses, train_losses)
                self.logger.info(
                    f"Train batch {i}: loss: {train_losses[-1]:.2f} "
                    f"grad norm: {float(grad_norm):.2f} time: {time.time() - t0:.3f}"
                )

            if i % cfg.batches_per_val_step == 0 or i == cfg.num_training_batches - 1:
                _flush_losses(pending_losses, train_losses)
                t0 = time.time()
                val_metrics = self.validation(return_logits=cfg.save_val_logits)
                self.logger.info(
                    f"Val batch {i}: PER (avg): {val_metrics['avg_PER']:.4f} "
                    f"CTC Loss (avg): {val_metrics['avg_loss']:.4f} "
                    f"time: {time.time() - t0:.3f}"
                )
                if cfg.log_individual_day_val_PER:
                    for day, dp in val_metrics["day_PERs"].items():
                        if dp["total_seq_length"] > 0:
                            self.logger.info(
                                f"{cfg.dataset.sessions[day]} val PER: "
                                f"{dp['total_edit_distance'] / dp['total_seq_length']:.4f}"
                            )

                val_pers.append(val_metrics["avg_PER"])
                val_losses.append(val_metrics["avg_loss"])
                val_results.append(
                    {k: v for k, v in val_metrics.items() if k not in ("logits",)}
                )

                new_best = False
                if val_metrics["avg_PER"] < self.best_val_per:
                    self.logger.info(
                        f"New best test PER {self.best_val_per:.4f} --> {val_metrics['avg_PER']:.4f}"
                    )
                    self.best_val_per = val_metrics["avg_PER"]
                    self.best_val_loss = val_metrics["avg_loss"]
                    new_best = True
                elif (
                    val_metrics["avg_PER"] == self.best_val_per
                    and val_metrics["avg_loss"] < self.best_val_loss
                ):
                    self.best_val_loss = val_metrics["avg_loss"]
                    new_best = True

                if new_best:
                    if cfg.save_best_checkpoint:
                        self.save(
                            os.path.join(cfg.checkpoint_dir, "best_checkpoint"),
                            self.best_val_per, self.best_val_loss,
                        )
                    if cfg.save_val_metrics:
                        with open(
                            os.path.join(cfg.checkpoint_dir, "val_metrics.pkl"), "wb"
                        ) as f:
                            pickle.dump(val_metrics, f)
                    val_steps_since_improvement = 0
                else:
                    val_steps_since_improvement += 1

                if cfg.save_all_val_steps:
                    self.save(
                        os.path.join(cfg.checkpoint_dir, f"checkpoint_batch_{i}"),
                        val_metrics["avg_PER"], val_metrics["avg_loss"],
                    )

                if cfg.early_stopping and (
                    val_steps_since_improvement >= cfg.early_stopping_val_steps
                ):
                    self.logger.info(
                        f"Early stopping at batch {i}: no improvement in "
                        f"{cfg.early_stopping_val_steps} validation steps"
                    )
                    break

        _flush_losses(pending_losses, train_losses)
        self.logger.info(f"Best avg val PER achieved: {self.best_val_per:.5f}")
        self.logger.info(
            f"Total training time: {(time.time() - train_start) / 60:.2f} minutes"
        )
        if cfg.save_final_model:
            self.save(
                os.path.join(cfg.checkpoint_dir, f"final_checkpoint_batch_{i}"),
                val_pers[-1] if val_pers else float("inf"),
                val_losses[-1] if val_losses else float("inf"),
            )
        return {
            "train_losses": train_losses,
            "val_losses": val_losses,
            "val_PERs": val_pers,
            "val_metrics": val_results,
        }

    # ------------------------------------------------------------- validation
    def validation(self, return_logits: bool = False) -> Dict[str, Any]:
        cfg = self.cfg
        metrics: Dict[str, Any] = {
            "decoded_seqs": [], "true_seq": [], "phone_seq_lens": [],
            "losses": [], "block_nums": [], "trial_nums": [], "day_indicies": [],
        }
        if return_logits:
            metrics["logits"] = []
            metrics["n_time_steps"] = []

        total_ed, total_len = 0, 0
        day_per = {
            d: {"total_edit_distance": 0, "total_seq_length": 0}
            for d in range(self.n_days)
            if not cfg.dataset.dataset_probability_val
            or cfg.dataset.dataset_probability_val[d] == 1
        }

        for batch in self.val_loader:
            day = int(batch["day_indicies"][0])
            if (
                cfg.dataset.dataset_probability_val
                and cfg.dataset.dataset_probability_val[day] == 0
            ):
                if cfg.log_val_skip_logs:
                    self.logger.info(f"Skipping validation on day {day}")
                continue

            logits, loss, ids, adjusted = self._eval_step(
                self.params,
                jnp.asarray(batch["input_features"]),
                jnp.asarray(batch["seq_class_ids"]),
                jnp.asarray(batch["n_time_steps"]),
                jnp.asarray(batch["phone_seq_lens"]),
                jnp.asarray(batch["day_indicies"]),
            )
            decoded = batched_greedy_collapse(np.asarray(ids), np.asarray(adjusted))
            trues = [
                batch["seq_class_ids"][b, : batch["phone_seq_lens"][b]]
                for b in range(len(decoded))
            ]
            ed, ln = batch_greedy_per(decoded, trues)
            total_ed += ed
            total_len += ln
            if day in day_per:
                day_per[day]["total_edit_distance"] += ed
                day_per[day]["total_seq_length"] += ln

            metrics["losses"].append(float(loss))
            metrics["decoded_seqs"].append(decoded)
            metrics["true_seq"].append(batch["seq_class_ids"])
            metrics["phone_seq_lens"].append(batch["phone_seq_lens"])
            metrics["block_nums"].append(batch["block_nums"])
            metrics["trial_nums"].append(batch["trial_nums"])
            metrics["day_indicies"].append(batch["day_indicies"])
            if return_logits:
                metrics["logits"].append(np.asarray(logits))
                metrics["n_time_steps"].append(np.asarray(adjusted))

        metrics["day_PERs"] = day_per
        metrics["avg_PER"] = total_ed / max(total_len, 1)
        metrics["avg_loss"] = float(np.mean(metrics["losses"])) if metrics["losses"] else float("inf")
        return metrics

    # ------------------------------------------------------------ checkpoints
    def save(self, path: str, val_per: float, val_loss: float) -> None:
        save_checkpoint(
            path, self.params, self.opt_state, self.step, val_per, val_loss
        )
        self.cfg.save(os.path.join(self.cfg.checkpoint_dir, "args.yaml"))
        self.logger.info(f"Saved model to checkpoint: {path}")

    def load(self, path: str) -> None:
        ckpt = load_checkpoint(path)
        self.params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        if ckpt.get("opt_state") is not None:
            self.opt_state = jax.tree_util.tree_map(
                lambda ref, saved: jnp.asarray(saved),
                self.opt_state, ckpt["opt_state"],
            )
        self.step = ckpt.get("step", 0)
        self.best_val_per = ckpt.get("val_PER", float("inf"))
        self.best_val_loss = ckpt.get("val_loss", float("inf"))
        self.logger.info(f"Loaded model from checkpoint: {path}")
