"""Checkpoint save/load: params + optimizer state + step + metrics, plus the
config YAML saved alongside.

Parity target: ``rnn_trainer.py:365-406`` (dict checkpoint with model/optimizer/
scheduler state and val metrics, args.yaml next to it). The on-disk format is a
pickle of numpy-ified pytrees — portable and free of torch; a torch-style
state_dict export is available via models.state_dict_from_params for users
returning to the reference stack.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
    val_per: float = float("inf"),
    val_loss: float = float("inf"),
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    ckpt = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
        "step": int(step),
        "val_PER": float(val_per),
        "val_loss": float(val_loss),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(ckpt, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_checkpoint_orbax(
    path: str,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
    val_per: float = float("inf"),
    val_loss: float = float("inf"),
) -> None:
    """Orbax-backed save: the multi-host/sharded-array path (each host writes
    its shards; restores with or without shardings). Use the pickle format for
    single-host runs and the torch exporter for reference interchange."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {
            "params": params,
            "opt_state": opt_state,
            "meta": {
                "step": step, "val_PER": float(val_per),
                "val_loss": float(val_loss),
            },
        },
        force=True,
    )
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    meta = tree.get("meta", {})
    return {
        "params": tree["params"],
        "opt_state": tree.get("opt_state"),
        "step": int(meta.get("step", 0)),
        "val_PER": float(meta.get("val_PER", float("inf"))),
        "val_loss": float(meta.get("val_loss", float("inf"))),
    }
