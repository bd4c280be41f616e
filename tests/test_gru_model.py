"""GRU decoder numerical parity vs a torch oracle built from torch primitives
(nn.GRU + einsum day layer + unfold patching), weights shared via the
state_dict converter. This is the gate for the pretrained-checkpoint import
(SURVEY.md §7 step 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from b2txt_tpu.models import (
    extract_patches,
    forward,
    init_params,
    param_count,
    params_from_state_dict,
    state_dict_from_params,
)

NEURAL_DIM = 24
N_UNITS = 16
N_DAYS = 3
N_CLASSES = 41
N_LAYERS = 3
PATCH, STRIDE = 14, 4


class TorchOracle:
    """Reference-equivalent forward using torch building blocks."""

    def __init__(self, state_dict):
        import torch
        from torch import nn

        self.torch = torch
        self.day_w = [torch.tensor(state_dict[f"day_weights.{i}"]) for i in range(N_DAYS)]
        self.day_b = [torch.tensor(state_dict[f"day_biases.{i}"]) for i in range(N_DAYS)]
        self.gru = nn.GRU(
            input_size=NEURAL_DIM * PATCH,
            hidden_size=N_UNITS,
            num_layers=N_LAYERS,
            batch_first=True,
            bidirectional=False,
        )
        with torch.no_grad():
            for l in range(N_LAYERS):
                getattr(self.gru, f"weight_ih_l{l}").copy_(torch.tensor(state_dict[f"gru.weight_ih_l{l}"]))
                getattr(self.gru, f"weight_hh_l{l}").copy_(torch.tensor(state_dict[f"gru.weight_hh_l{l}"]))
                getattr(self.gru, f"bias_ih_l{l}").copy_(torch.tensor(state_dict[f"gru.bias_ih_l{l}"]))
                getattr(self.gru, f"bias_hh_l{l}").copy_(torch.tensor(state_dict[f"gru.bias_hh_l{l}"]))
        self.out_w = torch.tensor(state_dict["out.weight"])
        self.out_b = torch.tensor(state_dict["out.bias"])
        self.h0 = torch.tensor(state_dict["h0"])

    def __call__(self, x, day_idx, states=None):
        torch = self.torch
        x = torch.tensor(x)
        day_weights = torch.stack([self.day_w[i] for i in day_idx], dim=0)
        day_biases = torch.cat([self.day_b[i] for i in day_idx], dim=0).unsqueeze(1)
        x = torch.einsum("btd,bdk->btk", x, day_weights) + day_biases
        x = torch.nn.functional.softsign(x)
        # patching via unfold, same dim gymnastics as the reference model
        x = x.unsqueeze(1).permute(0, 3, 1, 2)
        xu = x.unfold(3, PATCH, STRIDE).squeeze(2).permute(0, 2, 3, 1)
        x = xu.reshape(x.size(0), xu.size(1), -1)
        if states is None:
            states = self.h0.expand(N_LAYERS, x.shape[0], N_UNITS).contiguous()
        with torch.no_grad():
            out, hidden = self.gru(x, states)
            logits = out @ self.out_w.T + self.out_b
        return logits.numpy(), hidden.numpy()


@pytest.fixture(scope="module")
def shared():
    params = init_params(
        jax.random.PRNGKey(42),
        neural_dim=NEURAL_DIM, n_units=N_UNITS, n_days=N_DAYS,
        n_classes=N_CLASSES, n_layers=N_LAYERS,
        patch_size=PATCH, patch_stride=STRIDE,
    )
    sd = state_dict_from_params(params)
    return params, TorchOracle(sd)


def test_param_count_formula(shared):
    params, _ = shared
    expected = (
        N_DAYS * (NEURAL_DIM**2 + NEURAL_DIM)
        + 3 * N_UNITS * (NEURAL_DIM * PATCH + N_UNITS + 2)
        + (N_LAYERS - 1) * 3 * N_UNITS * (2 * N_UNITS + 2)
        + N_CLASSES * (N_UNITS + 1)
        + N_UNITS
    )
    assert param_count(params) == expected


def test_extract_patches_matches_unfold(rng, shared):
    import torch

    x = rng.standard_normal((2, 37, NEURAL_DIM)).astype(np.float32)
    ours = np.asarray(extract_patches(jnp.asarray(x), PATCH, STRIDE))
    xt = torch.tensor(x).unsqueeze(1).permute(0, 3, 1, 2)
    xu = xt.unfold(3, PATCH, STRIDE).squeeze(2).permute(0, 2, 3, 1)
    ref = xu.reshape(x.shape[0], xu.size(1), -1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_forward_parity_with_torch(rng, shared):
    params, oracle = shared
    x = rng.standard_normal((3, 50, NEURAL_DIM)).astype(np.float32)
    day_idx = np.array([0, 2, 1])
    ours = np.asarray(
        forward(params, jnp.asarray(x), jnp.asarray(day_idx),
                patch_size=PATCH, patch_stride=STRIDE)
    )
    ref, _ = oracle(x, day_idx)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_streaming_state_parity(rng, shared):
    """Chunked forward with carried state == full forward (streaming decode path)."""
    params, oracle = shared
    x = rng.standard_normal((1, 62, NEURAL_DIM)).astype(np.float32)
    day_idx = np.array([1])

    full, h_full = forward(
        params, jnp.asarray(x), jnp.asarray(day_idx),
        return_state=True, patch_size=PATCH, patch_stride=STRIDE,
    )
    ref, h_ref = oracle(x, day_idx)
    np.testing.assert_allclose(np.asarray(h_full), h_ref, rtol=1e-4, atol=1e-5)

    # Streaming over the *patched* sequence: feed the same patches in 2 chunks.
    pre = (
        jnp.einsum("btd,bdk->btk", jnp.asarray(x), params["day_w"][day_idx])
        + params["day_b"][day_idx][:, None, :]
    )
    patched = extract_patches(pre / (1.0 + jnp.abs(pre)), PATCH, STRIDE)
    P = patched.shape[1]
    logits1, h1 = forward(
        params, patched[:, : P // 2], jnp.asarray(day_idx),
        return_state=True, patch_size=0, patch_stride=0, skip_day_layer=True,
    )
    logits2, _ = forward(
        params, patched[:, P // 2 :], jnp.asarray(day_idx),
        states=h1, return_state=True, patch_size=0, patch_stride=0, skip_day_layer=True,
    )
    chunked = np.concatenate([np.asarray(logits1), np.asarray(logits2)], axis=1)
    np.testing.assert_allclose(chunked, np.asarray(full), rtol=1e-4, atol=1e-5)


def test_identity_day_init():
    params = init_params(
        jax.random.PRNGKey(0), neural_dim=8, n_units=4, n_days=2,
        n_classes=5, n_layers=1, patch_size=0, patch_stride=0,
    )
    np.testing.assert_array_equal(np.asarray(params["day_w"][0]), np.eye(8))
    np.testing.assert_array_equal(np.asarray(params["day_b"]), np.zeros((2, 8)))


def test_state_dict_roundtrip(shared):
    params, _ = shared
    sd = state_dict_from_params(params)
    back = params_from_state_dict(sd)
    np.testing.assert_allclose(np.asarray(params["day_w"]), back["day_w"])
    np.testing.assert_allclose(np.asarray(params["layers"][1]["w_hh"]), back["layers"][1]["w_hh"])
    np.testing.assert_allclose(np.asarray(params["h0"]), back["h0"])


def test_prefix_stripping():
    params = init_params(
        jax.random.PRNGKey(1), neural_dim=4, n_units=3, n_days=1,
        n_classes=5, n_layers=1, patch_size=0, patch_stride=0,
    )
    sd = state_dict_from_params(params)
    prefixed = {f"_orig_mod.module.{k}": v for k, v in sd.items()}
    back = params_from_state_dict(prefixed)
    np.testing.assert_allclose(np.asarray(params["out_w"]), back["out_w"])


def test_full_size_checkpoint_parity(rng):
    """Full reference shapes (512 feats, 5x768 GRU, 45 days): imported torch
    weights reproduce torch logits to float32 precision — the
    posterior-fidelity gate for the pretrained t15 checkpoint."""
    import torch
    from torch import nn

    D, H, L, DAYS, C, PAT, STR = 512, 768, 5, 45, 41, 14, 4
    torch.manual_seed(0)
    gru = nn.GRU(input_size=D * PAT, hidden_size=H, num_layers=L, batch_first=True)
    out_lin = nn.Linear(H, C)
    day_w = [torch.eye(D) + 0.01 * torch.randn(D, D) for _ in range(DAYS)]
    day_b = [0.01 * torch.randn(1, D) for _ in range(DAYS)]
    h0 = 0.1 * torch.randn(1, 1, H)

    sd = {}
    for i in range(DAYS):
        sd[f"day_weights.{i}"] = day_w[i]
        sd[f"day_biases.{i}"] = day_b[i]
    for l in range(L):
        for n in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            sd[f"gru.{n}_l{l}"] = getattr(gru, f"{n}_l{l}").detach()
    sd["out.weight"] = out_lin.weight.detach()
    sd["out.bias"] = out_lin.bias.detach()
    sd["h0"] = h0

    params = params_from_state_dict(sd)
    B, T = 2, 120
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    day_idx = np.array([3, 44])
    ours = np.asarray(
        forward(params, jnp.asarray(x), jnp.asarray(day_idx),
                patch_size=PAT, patch_stride=STR)
    )
    with torch.no_grad():
        xt = torch.tensor(x)
        dw = torch.stack([day_w[i] for i in day_idx])
        db = torch.cat([day_b[i] for i in day_idx]).unsqueeze(1)
        h = nn.functional.softsign(torch.einsum("btd,bdk->btk", xt, dw) + db)
        hu = (h.unsqueeze(1).permute(0, 3, 1, 2).unfold(3, PAT, STR)
              .squeeze(2).permute(0, 2, 3, 1).reshape(B, -1, PAT * D))
        o, _ = gru(hu, h0.expand(L, B, H).contiguous())
        ref = (o @ out_lin.weight.T + out_lin.bias).numpy()
    assert np.abs(ours - ref).max() < 1e-5
    assert (np.argmax(ours, -1) == np.argmax(ref, -1)).all()
