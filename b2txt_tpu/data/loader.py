"""Batch assembly + host→device prefetch.

Parity target: ``model_training/dataset.py:100-159`` (__getitem__ builds a whole
padded batch) and the DataLoader prefetch at ``rnn_trainer.py:197-203``.

XLA design delta: batches are padded to *bucketed* static shapes (time rounded
up to ``time_bucket``, labels to ``label_bucket``) so the jitted train step
compiles a bounded number of programs instead of one per ragged shape. Padding
is masked downstream by n_time_steps / phone_seq_lens exactly like the
reference's pad_sequence + length tensors.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import h5py
import numpy as np

from .hdf5_store import read_trial
from .sampler import BatchSampler


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class BatchLoader:
    """Assembles padded numpy batches from a BatchSampler over HDF5 sessions."""

    def __init__(
        self,
        sampler: BatchSampler,
        time_bucket: int = 256,
        label_bucket: int = 64,
        max_chars: int = 500,
        feature_subset: Optional[Sequence[int]] = None,
        transfer_dtype: str = "float32",
    ):
        self.sampler = sampler
        self.time_bucket = time_bucket
        self.label_bucket = label_bucket
        self.max_chars = max_chars
        self.feature_subset = feature_subset or sampler.feature_subset
        # "bfloat16" halves the host→device bytes of the dominant buffer
        # (input_features is ~98% of a batch). Neural features are binned
        # spike counts / band power whose quantization step (2^-8 relative)
        # sits far below the reference's own white-noise augmentation
        # (std 1.0, rnn_args.yaml:61-70); the train step upcasts to f32 on
        # device before the f32 smoothing/augment path. Opt-in:
        # TrainConfig.feature_transfer_dtype.
        if transfer_dtype == "bfloat16":
            import ml_dtypes

            self._feat_dtype = np.dtype(ml_dtypes.bfloat16)
        elif transfer_dtype == "float32":
            self._feat_dtype = np.dtype(np.float32)
        else:
            raise ValueError(f"transfer_dtype must be float32|bfloat16, "
                             f"got {transfer_dtype!r}")

    def __len__(self) -> int:
        return len(self.sampler)

    def get_batch(self, idx: int) -> Dict[str, np.ndarray]:
        index = self.sampler.batch_index[idx]
        feats, labels, n_steps, lab_lens, days = [], [], [], [], []
        blocks, trial_nums, transcriptions = [], [], []

        for d in index.keys():
            path = self.sampler.trial_indices[d]["session_path"]
            with h5py.File(path, "r") as f:
                for t in index[d]:
                    try:
                        tr = read_trial(f, int(t), self.feature_subset)
                    except Exception as e:  # parity: dataset.py:144-146
                        print(f"Error loading trial {t} from session {path}: {e}")
                        continue
                    feats.append(tr.input_features)
                    labels.append(
                        tr.seq_class_ids
                        if tr.seq_class_ids is not None
                        else np.zeros((0,), np.int32)
                    )
                    n_steps.append(tr.n_time_steps)
                    lab_lens.append(tr.seq_len or 0)
                    days.append(int(d))
                    blocks.append(tr.block_num)
                    trial_nums.append(tr.trial_num)
                    tx = (
                        tr.transcription
                        if tr.transcription is not None
                        else np.zeros((0,), np.uint8)
                    )
                    transcriptions.append(tx)

        B = len(feats)
        D = feats[0].shape[1]
        T_pad = _round_up(max(f.shape[0] for f in feats), self.time_bucket)
        S_pad = _round_up(max(max(len(l) for l in labels), 1), self.label_bucket)

        batch = {
            "input_features": np.zeros((B, T_pad, D), self._feat_dtype),
            "seq_class_ids": np.zeros((B, S_pad), np.int32),
            "n_time_steps": np.asarray(n_steps, np.int32),
            "phone_seq_lens": np.asarray(lab_lens, np.int32),
            "day_indicies": np.asarray(days, np.int32),
            "block_nums": np.asarray(blocks, np.int32),
            "trial_nums": np.asarray(trial_nums, np.int32),
            "transcriptions": np.zeros((B, self.max_chars), np.uint8),
        }
        for i, (f, l, tx) in enumerate(zip(feats, labels, transcriptions)):
            batch["input_features"][i, : f.shape[0]] = f
            batch["seq_class_ids"][i, : len(l)] = l
            batch["transcriptions"][i, : min(len(tx), self.max_chars)] = tx[: self.max_chars]
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for i in range(len(self)):
            yield self.get_batch(i)


def prefetch_iterator(
    loader: BatchLoader, prefetch: int = 2, to_device: bool = False
) -> Iterator[Dict[str, np.ndarray]]:
    """Background-thread prefetch (replaces DataLoader workers + pin_memory).

    ``to_device=True`` additionally issues jax.device_put from the worker
    thread — double-buffered host→device transfer that overlaps the previous
    step's compute (the DataLoader pin_memory+non_blocking analogue). The
    main thread then receives device arrays and jnp.asarray is a no-op."""
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    sentinel = object()

    def worker():
        try:
            if to_device:
                import jax

                for batch in loader:
                    q.put({k: jax.device_put(v) if isinstance(v, np.ndarray)
                           else v for k, v in batch.items()})
            else:
                for batch in loader:
                    q.put(batch)
        finally:
            q.put(sentinel)

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item
