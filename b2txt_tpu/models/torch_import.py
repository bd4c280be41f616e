"""PyTorch checkpoint importer for the pretrained t15 GRUDecoder.

Parity target: the checkpoint dict saved by ``rnn_trainer.py:387-406``
({'model_state_dict', 'optimizer_state_dict', ...}) with the key layout of
``rnn_model.py`` (day_weights.{i}, day_biases.{i}, gru.weight_ih_l{k},
gru.weight_hh_l{k}, gru.bias_*_l{k}, out.weight/bias, h0), including the
``module.`` / ``_orig_mod.`` prefixes stripped at ``evaluate_model.py:73-76``.

torch is only needed for ``load_torch_checkpoint`` (reading a .pt file); the
state-dict→pytree mapping itself is pure numpy so it also accepts dicts of
arrays (e.g. exported via numpy for torch-free environments).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from .gru_decoder import Params


def _strip_prefixes(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "").replace("_orig_mod.", "")
        out[k] = v
    return out


def _to_numpy(v: Any) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        return v.detach().cpu().to_dense().float().numpy()
    return np.asarray(v, dtype=np.float32)


def params_from_state_dict(state_dict: Mapping[str, Any]) -> Params:
    """Convert a torch GRUDecoder state_dict to the b2txt_tpu param pytree."""
    sd = {k: _to_numpy(v) for k, v in _strip_prefixes(state_dict).items()}

    n_days = len([k for k in sd if k.startswith("day_weights.")])
    n_layers = len([k for k in sd if k.startswith("gru.weight_ih_l")])
    if n_days == 0 or n_layers == 0:
        raise ValueError(
            f"state_dict does not look like a GRUDecoder checkpoint; keys: {sorted(sd)[:8]}..."
        )

    day_w = np.stack([sd[f"day_weights.{i}"] for i in range(n_days)], axis=0)
    day_b = np.stack([sd[f"day_biases.{i}"].reshape(-1) for i in range(n_days)], axis=0)

    layers = []
    for l in range(n_layers):
        layers.append(
            {
                "w_ih": sd[f"gru.weight_ih_l{l}"],
                "w_hh": sd[f"gru.weight_hh_l{l}"],
                "b_ih": sd[f"gru.bias_ih_l{l}"],
                "b_hh": sd[f"gru.bias_hh_l{l}"],
            }
        )

    return {
        "day_w": day_w,
        "day_b": day_b,
        "layers": layers,
        "out_w": sd["out.weight"],
        "out_b": sd["out.bias"],
        "h0": sd["h0"].reshape(-1),
    }


def load_torch_checkpoint(path: str) -> Params:
    """Load a reference training checkpoint (.pt) and return the param pytree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    return params_from_state_dict(state_dict)


def state_dict_from_params(params: Params) -> Dict[str, np.ndarray]:
    """Inverse mapping: export the pytree as a torch-style state_dict (numpy
    values), so checkpoints trained here load into the reference code."""
    sd: Dict[str, np.ndarray] = {}
    day_w = np.asarray(params["day_w"])
    day_b = np.asarray(params["day_b"])
    for i in range(day_w.shape[0]):
        sd[f"day_weights.{i}"] = day_w[i]
        sd[f"day_biases.{i}"] = day_b[i].reshape(1, -1)
    for l, layer in enumerate(params["layers"]):
        sd[f"gru.weight_ih_l{l}"] = np.asarray(layer["w_ih"])
        sd[f"gru.weight_hh_l{l}"] = np.asarray(layer["w_hh"])
        sd[f"gru.bias_ih_l{l}"] = np.asarray(layer["b_ih"])
        sd[f"gru.bias_hh_l{l}"] = np.asarray(layer["b_hh"])
    sd["out.weight"] = np.asarray(params["out_w"])
    sd["out.bias"] = np.asarray(params["out_b"])
    sd["h0"] = np.asarray(params["h0"]).reshape(1, 1, -1)
    return sd
