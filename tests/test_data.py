"""Data pipeline: HDF5 store round-trip, split semantics, samplers, loader."""

import numpy as np
import pytest

from b2txt_tpu.data import (
    BatchLoader,
    BatchSampler,
    load_session_file,
    synthetic,
    train_test_split_indices,
    write_session_file,
)


@pytest.fixture(scope="module")
def sessions(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    names = ["t15.2023.08.11", "t15.2023.08.13", "t15.2023.08.18"]
    synthetic.write_synthetic_sessions(str(root), names, trials_per_session=10, neural_dim=16)
    return str(root), names


def test_session_roundtrip(sessions):
    root, names = sessions
    data = load_session_file(f"{root}/{names[0]}/data_train.hdf5")
    assert len(data["neural_features"]) == 10
    assert data["neural_features"][0].shape[1] == 16
    assert data["seq_class_ids"][0] is not None
    assert data["sentence_label"][0]
    # transcription decodes back to the sentence label
    tx = data["transcriptions"][0]
    end = np.argwhere(tx == 0)[0, 0]
    assert bytes(tx[:end]).decode() == data["sentence_label"][0]


def test_split_all_train(sessions):
    root, names = sessions
    paths = [f"{root}/{n}/data_train.hdf5" for n in names]
    train, test = train_test_split_indices(paths, test_percentage=0)
    assert all(len(train[d]["trials"]) == 10 for d in train)
    assert all(len(test[d]["trials"]) == 0 for d in test)


def test_split_fraction_deterministic(sessions):
    root, names = sessions
    paths = [f"{root}/{n}/data_train.hdf5" for n in names]
    tr1, te1 = train_test_split_indices(paths, test_percentage=0.2, seed=5)
    tr2, te2 = train_test_split_indices(paths, test_percentage=0.2, seed=5)
    for d in te1:
        assert te1[d]["trials"] == te2[d]["trials"]
        assert len(te1[d]["trials"]) == 2  # max(1, int(10*0.2))
        assert set(tr1[d]["trials"]) | set(te1[d]["trials"]) == set(range(10))


def test_split_bad_trials(sessions):
    root, names = sessions
    paths = [f"{root}/{names[0]}/data_train.hdf5"]
    bad = {names[0]: {"0": [0, 1]}}  # block 0, trial_nums 0 and 1
    train, _ = train_test_split_indices(paths, test_percentage=0, bad_trials_dict=bad)
    assert len(train[0]["trials"]) == 8
    assert 0 not in train[0]["trials"] and 1 not in train[0]["trials"]


def test_train_sampler_properties(sessions):
    root, names = sessions
    paths = [f"{root}/{n}/data_train.hdf5" for n in names]
    train, _ = train_test_split_indices(paths, test_percentage=0)
    s = BatchSampler(train, n_batches=20, split="train", batch_size=8,
                     days_per_batch=2, random_seed=3)
    assert len(s) == 20
    for b in range(20):
        batch = s.batch_index[b]
        assert len(batch) == 2  # days_per_batch unique days
        assert sum(len(v) for v in batch.values()) == 8
    # reproducible
    s2 = BatchSampler(train, n_batches=20, split="train", batch_size=8,
                      days_per_batch=2, random_seed=3)
    for b in range(20):
        assert {d: list(v) for d, v in s.batch_index[b].items()} == \
               {d: list(v) for d, v in s2.batch_index[b].items()}


def test_test_sampler_covers_all_once(sessions):
    root, names = sessions
    paths = [f"{root}/{n}/data_val.hdf5" for n in names]
    _, val = train_test_split_indices(paths, test_percentage=1)
    s = BatchSampler(val, n_batches=None, split="test", batch_size=4)
    seen = {d: [] for d in val}
    for b in range(len(s)):
        for d, trials in s.batch_index[b].items():
            assert len(s.batch_index[b]) == 1  # one day per val batch
            seen[d].extend(trials)
    for d in val:
        assert sorted(seen[d]) == sorted(val[d]["trials"])


def test_loader_batch_shapes(sessions):
    root, names = sessions
    paths = [f"{root}/{n}/data_train.hdf5" for n in names]
    train, _ = train_test_split_indices(paths, test_percentage=0)
    s = BatchSampler(train, n_batches=3, split="train", batch_size=6,
                     days_per_batch=2, random_seed=1)
    loader = BatchLoader(s, time_bucket=32, label_bucket=16)
    batch = loader.get_batch(0)
    B, T, D = batch["input_features"].shape
    assert B == 6 and D == 16 and T % 32 == 0
    assert batch["seq_class_ids"].shape[1] % 16 == 0
    assert batch["n_time_steps"].shape == (6,)
    assert (batch["n_time_steps"] <= T).all()
    # features zero-padded past n_time_steps
    i = int(np.argmin(batch["n_time_steps"]))
    assert np.all(batch["input_features"][i, batch["n_time_steps"][i]:] == 0)


def test_loader_bf16_transfer(sessions):
    """feature_transfer_dtype="bfloat16" halves the feature bytes and stays
    within bf16 quantization (2^-8 relative) of the f32 batch; the train
    step upcasts on device (trainer loss_fn), so compute is unchanged."""
    import jax.numpy as jnp
    import ml_dtypes

    root, names = sessions
    paths = [f"{root}/{n}/data_train.hdf5" for n in names]
    train, _ = train_test_split_indices(paths, test_percentage=0)
    s = BatchSampler(train, n_batches=3, split="train", batch_size=6,
                     days_per_batch=2, random_seed=1)
    f32 = BatchLoader(s, time_bucket=32, label_bucket=16).get_batch(0)
    b16 = BatchLoader(s, time_bucket=32, label_bucket=16,
                      transfer_dtype="bfloat16").get_batch(0)
    assert b16["input_features"].dtype == ml_dtypes.bfloat16
    assert b16["input_features"].nbytes * 2 == f32["input_features"].nbytes
    a = f32["input_features"]
    b = b16["input_features"].astype(np.float32)
    denom = np.maximum(np.abs(a), 1.0)
    assert np.max(np.abs(a - b) / denom) <= 2.0 ** -8
    # jnp round-trips the ml_dtypes array and the on-device upcast is exact
    up = np.asarray(jnp.asarray(b16["input_features"]).astype(jnp.float32))
    np.testing.assert_array_equal(up, b)
    with pytest.raises(ValueError):
        BatchLoader(s, transfer_dtype="float16")


def test_days_per_batch_exceeds_days_raises(sessions):
    root, names = sessions
    paths = [f"{root}/{names[0]}/data_train.hdf5"]
    train, _ = train_test_split_indices(paths, test_percentage=0)
    with pytest.raises(ValueError):
        BatchSampler(train, n_batches=2, split="train", batch_size=4, days_per_batch=5)
