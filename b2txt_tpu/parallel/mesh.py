"""Device mesh construction and sharding rules.

The reference has no multi-device parallelism (SURVEY.md §2.5) — scaling here
is native to the TPU design: a ("data", "model") mesh where batches shard over
"data" and the GRU gate dimension (3H rows of W_ih/W_hh, biases, and the output
head) shards over "model" (tensor parallelism). XLA inserts the all-gather of
the hidden state between scan steps over ICI; day-specific parameters stay
replicated (they are gathered per-batch-row).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "model") mesh over the first n_devices devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def param_partition_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree for the GRU decoder params: gate dim over "model"."""
    return {
        "day_w": P(),          # (n_days, D, D) replicated — tiny, gathered per row
        "day_b": P(),
        "layers": [
            {
                "w_ih": P("model", None),   # (3H, in)
                "w_hh": P("model", None),   # (3H, H)
                "b_ih": P("model"),
                "b_hh": P("model"),
            }
            for _ in params["layers"]
        ],
        "out_w": P(None, "model"),          # (C, H): C=41 indivisible → shard H
        "out_b": P(),
        "h0": P(),
    }


def batch_partition_specs() -> Dict[str, P]:
    """Batch arrays shard over "data" on the leading (batch) axis."""
    return {
        "input_features": P("data", None, None),
        "seq_class_ids": P("data", None),
        "n_time_steps": P("data"),
        "phone_seq_lens": P("data"),
        "day_indicies": P("data"),
    }


def shard_params(params, mesh: Mesh):
    specs = param_partition_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )


def named_sharding_tree(tree_specs, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        tree_specs,
        is_leaf=lambda x: isinstance(x, P),
    )
