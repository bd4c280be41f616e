"""Pallas GRU sequence kernel parity vs the XLA scan implementation.

On the CPU test backend the kernel runs in interpreter mode; the same code
compiles to Mosaic on a real TPU (exercised by bench.py / eval paths).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from b2txt_tpu.models.gru_decoder import _gru_layer, forward, init_params
from b2txt_tpu.ops.pallas.gru import gru_layer_pallas


def _layer_params(rng, in_dim, H):
    return {
        "w_ih": rng.standard_normal((3 * H, in_dim)).astype(np.float32) * 0.1,
        "w_hh": rng.standard_normal((3 * H, H)).astype(np.float32) * 0.1,
        "b_ih": rng.standard_normal((3 * H,)).astype(np.float32) * 0.1,
        "b_hh": rng.standard_normal((3 * H,)).astype(np.float32) * 0.1,
    }


@pytest.mark.parametrize("B,T,H", [(4, 12, 16), (8, 33, 32)])
def test_kernel_matches_scan(rng, B, T, H):
    layer = _layer_params(rng, H, H)
    x = rng.standard_normal((B, T, H)).astype(np.float32)
    h0 = rng.standard_normal((B, H)).astype(np.float32)

    x_proj = np.einsum("bti,gi->btg", x, layer["w_ih"]) + layer["b_ih"]
    out, hf = gru_layer_pallas(
        jnp.asarray(x_proj),
        jnp.asarray(layer["w_hh"]),
        jnp.asarray(layer["b_hh"]),
        jnp.asarray(h0),
        interpret=True,
    )
    ref_out, ref_hf = _gru_layer(
        jnp.asarray(x), jnp.asarray(h0),
        {k: jnp.asarray(v) for k, v in layer.items()}, jnp.float32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(ref_hf), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,T,H", [(4, 12, 16), (8, 33, 32)])
def test_kernel_gradients_match_scan(rng, B, T, H):
    """Custom-VJP backward kernel == autodiff through the XLA scan for every
    input: x_proj, w_hh, b_hh, h0 (and through both out and h_final)."""
    layer = _layer_params(rng, H, H)
    x = rng.standard_normal((B, T, H)).astype(np.float32)
    h0 = rng.standard_normal((B, H)).astype(np.float32)
    x_proj = (np.einsum("bti,gi->btg", x, layer["w_ih"]) + layer["b_ih"]).astype(np.float32)

    def loss_pallas(xp, w_hh, b_hh, h):
        out, hf = gru_layer_pallas(xp, w_hh, b_hh, h, interpret=True)
        return jnp.sum(out * jnp.cos(out)) + 2.0 * jnp.sum(hf)

    def loss_scan(xp, w_hh, b_hh, h):
        # scan reference on the same x_proj parameterization
        w_hh_T = w_hh.T
        H_ = w_hh.shape[1]

        def step(hc, xp_t):
            hh = hc @ w_hh_T + b_hh
            r = jax.nn.sigmoid(xp_t[:, :H_] + hh[:, :H_])
            z = jax.nn.sigmoid(xp_t[:, H_:2*H_] + hh[:, H_:2*H_])
            n = jnp.tanh(xp_t[:, 2*H_:] + r * hh[:, 2*H_:])
            h_new = (1.0 - z) * n + z * hc
            return h_new, h_new

        hf, outs = jax.lax.scan(step, h, jnp.moveaxis(xp, 1, 0))
        out = jnp.moveaxis(outs, 0, 1)
        return jnp.sum(out * jnp.cos(out)) + 2.0 * jnp.sum(hf)

    args = (jnp.asarray(x_proj), jnp.asarray(layer["w_hh"]),
            jnp.asarray(layer["b_hh"]), jnp.asarray(h0))
    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    g_scan = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(*args)
    for gp, gs, name in zip(g_pallas, g_scan, ["x_proj", "w_hh", "b_hh", "h0"]):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gs), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_training_forward_use_pallas_differentiable(rng):
    """use_pallas now works under jax.grad through the full model forward."""
    import b2txt_tpu.ops.pallas.gru as pg

    params = init_params(
        jax.random.PRNGKey(3), neural_dim=12, n_units=16, n_days=2,
        n_classes=41, n_layers=2, patch_size=6, patch_stride=2,
    )
    x = rng.standard_normal((3, 30, 12)).astype(np.float32)
    day = np.array([0, 1, 0])

    def loss(p, use_pallas):
        logits = forward(p, jnp.asarray(x), jnp.asarray(day),
                         patch_size=6, patch_stride=2, use_pallas=use_pallas)
        return jnp.mean(logits ** 2)

    g_ref = jax.grad(loss)(params, False)
    orig = pg.gru_layer_pallas
    try:
        pg.gru_layer_pallas = lambda *a, **k: orig(*a, interpret=True, **k)
        g_pal = jax.grad(loss)(params, True)
    finally:
        pg.gru_layer_pallas = orig
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_pal = jax.tree_util.tree_leaves(g_pal)
    for a, b in zip(flat_ref, flat_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_forward_use_pallas_matches(rng):
    """Full model forward with use_pallas (interpret on CPU) == XLA scan."""
    import b2txt_tpu.ops.pallas.gru as pg

    params = init_params(
        jax.random.PRNGKey(3), neural_dim=12, n_units=16, n_days=2,
        n_classes=41, n_layers=2, patch_size=6, patch_stride=2,
    )
    x = rng.standard_normal((3, 30, 12)).astype(np.float32)
    day = np.array([0, 1, 0])

    ref = forward(params, jnp.asarray(x), jnp.asarray(day),
                  patch_size=6, patch_stride=2)

    orig = pg.gru_layer_pallas
    try:
        pg.gru_layer_pallas = lambda *a, **k: orig(*a, interpret=True, **k)
        got = forward(params, jnp.asarray(x), jnp.asarray(day),
                      patch_size=6, patch_stride=2, use_pallas=True)
    finally:
        pg.gru_layer_pallas = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
