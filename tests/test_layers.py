"""Parity tests for the conv/GRU building blocks against torch reference semantics.

The reference model is torch (src/nets/gru_vae.py); torch-cpu is available, so
we instantiate the same ops in torch with identical weights and require float
agreement.  These tests pin down the exact layouts (gate order, tap order,
padding) that checkpoint/parity transfer depends on.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cyclevae_tpu.models.layers import (
    dilconv_apply,
    dilconv_effective,
    init_dilconv,
    init_gru_stack,
    window_gather,
)
from cyclevae_tpu.ops.gru_scan import gru_ar_scan


def torch_dilconv(in_dim, kernel_size, layers, seed=0):
    """Build the reference TwoSidedDilConv1d (gru_vae.py:36-66) in torch."""
    torch.manual_seed(seed)
    convs = torch.nn.ModuleList()
    rec = kernel_size ** layers
    padding = (rec - 1) // 2
    for i in range(layers):
        if i > 0:
            convs.append(torch.nn.Conv1d(
                in_dim * kernel_size ** i, in_dim * kernel_size ** (i + 1),
                kernel_size, stride=1, dilation=kernel_size ** i, padding=0))
        else:
            convs.append(torch.nn.Conv1d(
                in_dim, in_dim * kernel_size, kernel_size,
                stride=1, dilation=1, padding=padding))
    return convs


@pytest.mark.parametrize("in_dim,k,layers", [(6, 3, 2), (5, 3, 1), (4, 5, 2)])
def test_dilconv_matches_torch(in_dim, k, layers):
    convs = torch_dilconv(in_dim, k, layers)
    B, T = 2, 17
    x = torch.randn(B, in_dim, T)
    with torch.no_grad():
        y = x
        for c in convs:
            y = c(y)
    y_ref = y.transpose(1, 2).numpy()  # (B, T, C_out)

    params = {
        "w": [jnp.asarray(c.weight.detach().numpy()) for c in convs],
        "b": [jnp.asarray(c.bias.detach().numpy()) for c in convs],
    }
    y_jax = np.asarray(dilconv_apply(params, jnp.asarray(x.transpose(1, 2).numpy()), k))
    np.testing.assert_allclose(y_jax, y_ref, atol=2e-5, rtol=1e-4)


def test_dilconv_effective_shapes():
    key = jax.random.PRNGKey(0)
    params = init_dilconv(key, 54, 3, 2)
    w_eff, b_eff = dilconv_effective(params, 3)
    assert w_eff.shape == (9 * 54, 54 * 9)
    assert b_eff.shape == (54 * 9,)


def test_window_gather_padding():
    x = jnp.arange(5.0).reshape(1, 5, 1)
    win = window_gather(x, 3)
    assert win.shape == (1, 5, 3)
    np.testing.assert_allclose(np.asarray(win[0, 0]), [0.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(win[0, 4]), [3.0, 4.0, 0.0])


@pytest.mark.parametrize("n_layers", [1, 2])
def test_gru_ar_scan_matches_torch_loop(n_layers):
    """The lax.scan recurrence must reproduce the reference per-frame loop
    (gru_vae.py:376-399): input = concat(conv_out[t], y_prev), y = out_1(gru_out)."""
    torch.manual_seed(1)
    conv_dim, out_dim, hidden, B, T = 7, 4, 12, 3, 11
    tot_in = conv_dim + out_dim
    gru = torch.nn.GRU(tot_in, hidden, n_layers, batch_first=True)
    out_1 = torch.nn.Conv1d(hidden, out_dim, 1)

    conv_seq = torch.randn(B, T, conv_dim)
    y0 = torch.randn(B, 1, out_dim)
    h0 = torch.randn(n_layers, B, hidden)

    with torch.no_grad():
        y_in = y0
        h = h0
        trj = []
        for t in range(T):
            out, h = gru(torch.cat((conv_seq[:, t:t + 1], y_in), 2), h)
            y_in = out_1(out.transpose(1, 2)).transpose(1, 2)
            trj.append(y_in)
        trj_ref = torch.cat(trj, 1).numpy()

    gru_layers = []
    for l in range(n_layers):
        gru_layers.append({
            "w_ih": jnp.asarray(getattr(gru, f"weight_ih_l{l}").detach().numpy()),
            "w_hh": jnp.asarray(getattr(gru, f"weight_hh_l{l}").detach().numpy()),
            "b_ih": jnp.asarray(getattr(gru, f"bias_ih_l{l}").detach().numpy()),
            "b_hh": jnp.asarray(getattr(gru, f"bias_hh_l{l}").detach().numpy()),
        })
    out_proj = {
        "w": jnp.asarray(out_1.weight.detach().numpy()[:, :, 0]),
        "b": jnp.asarray(out_1.bias.detach().numpy()),
    }
    trj_jax, y_T, h_T = gru_ar_scan(
        gru_layers, out_proj,
        jnp.asarray(conv_seq.numpy()),
        jnp.asarray(y0.numpy()[:, 0]),
        jnp.asarray(h0.numpy()),
    )
    np.testing.assert_allclose(np.asarray(trj_jax), trj_ref, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y_T), trj_ref[:, -1], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h_T), h.numpy(), atol=2e-5, rtol=1e-4)


def test_gru_init_shapes():
    layers = init_gru_stack(jax.random.PRNGKey(0), 10, 16, 2)
    assert layers[0]["w_ih"].shape == (48, 10)
    assert layers[1]["w_ih"].shape == (48, 16)
    assert layers[0]["w_hh"].shape == (48, 16)
