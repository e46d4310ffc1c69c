"""Custom-VJP fused AR-GRU: forward + gradient parity vs autodiff of the
XLA scan (ops/gru_scan.py), which itself is torch-parity tested.  The Pallas
forward path is exercised on TPU; here the XLA impl validates the hand-derived
backward (ops/gru_ar_vjp.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from cyclevae_tpu.models.layers import init_dense, init_gru_stack
from cyclevae_tpu.ops.gru_scan import gru_ar_scan, precompute_input_gates
from cyclevae_tpu.ops.gru_ar_vjp import gru_ar_fused


def _setup(B=3, T=12, conv_dim=10, hidden=16, out_dim=6, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5, k6 = jax.random.split(k, 6)
    gru = init_gru_stack(k1, conv_dim + out_dim, hidden, 1)[0]
    out = init_dense(k2, hidden, out_dim)
    conv_seq = jax.random.normal(k3, (B, T, conv_dim))
    y0 = 0.1 * jax.random.normal(k4, (B, out_dim))
    h0 = 0.1 * jax.random.normal(k5, (B, hidden))
    mask = (jax.random.bernoulli(k6, 0.7, (B, T, hidden)) / 0.7).astype(
        jnp.float32)
    return gru, out, conv_seq, y0, h0, mask


def _loss_ref(gru, out, conv_seq, y0, h0, mask):
    trj, y_T, h_T = gru_ar_scan([gru], out, conv_seq, y0, h0[None], mask)
    return (jnp.sum(trj ** 2) + jnp.sum(jnp.sin(y_T)) + jnp.sum(h_T[0] ** 2),
            trj)


def _loss_fused(gru, out, conv_seq, y0, h0, mask):
    conv_dim = conv_seq.shape[-1]
    gx = precompute_input_gates(gru, conv_seq)
    trj, y_T, h_T = gru_ar_fused(
        gru["w_ih"][:, conv_dim:], gru["w_hh"], gru["b_hh"],
        out["w"], out["b"], gx, y0, h0, mask, "xla")
    return (jnp.sum(trj ** 2) + jnp.sum(jnp.sin(y_T)) + jnp.sum(h_T ** 2),
            trj)


def test_forward_matches_scan():
    gru, out, conv_seq, y0, h0, mask = _setup()
    _, trj_ref = _loss_ref(gru, out, conv_seq, y0, h0, mask)
    _, trj = _loss_fused(gru, out, conv_seq, y0, h0, mask)
    np.testing.assert_allclose(np.asarray(trj), np.asarray(trj_ref),
                               atol=1e-5)


def test_gradients_match_autodiff():
    gru, out, conv_seq, y0, h0, mask = _setup()

    def f_ref(args):
        gru_, out_, conv_, y0_, h0_ = args
        return _loss_ref(gru_, out_, conv_, y0_, h0_, mask)[0]

    def f_fused(args):
        gru_, out_, conv_, y0_, h0_ = args
        return _loss_fused(gru_, out_, conv_, y0_, h0_, mask)[0]

    args = (gru, out, conv_seq, y0, h0)
    g_ref = jax.grad(f_ref)(args)
    g_fused = jax.grad(f_fused)(args)
    flat_ref, tree_def = jax.tree_util.tree_flatten(g_ref)
    flat_fused, tree_def2 = jax.tree_util.tree_flatten(g_fused)
    assert tree_def == tree_def2
    for a, b in zip(flat_fused, flat_ref):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale, rtol=2e-4)


def test_pallas_bwd_kernel_matches_xla_reverse_scan():
    """The fused Pallas reverse-scan backward (interpret mode) produces the
    same gradients as the XLA lax.scan backward."""
    from jax.experimental.pallas import tpu as pltpu

    gru, out, conv_seq, y0, h0, mask = _setup(B=2, T=9, hidden=16, seed=5)
    conv_dim = conv_seq.shape[-1]
    gx = precompute_input_gates(gru, conv_seq)

    def loss(args, impl):
        wy, whh, bhh, w, b, gx_, y0_, h0_ = args
        trj, y_T, h_T = gru_ar_fused(wy, whh, bhh, w, b, gx_, y0_, h0_,
                                     mask, impl)
        return (jnp.sum(trj ** 2) + jnp.sum(jnp.sin(y_T))
                + jnp.sum(h_T ** 2))

    args = (gru["w_ih"][:, conv_dim:], gru["w_hh"], gru["b_hh"],
            out["w"], out["b"], gx, y0, h0)
    g_ref = jax.grad(lambda a: loss(a, "xla"))(args)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(lambda a: loss(a, "pallas"))(args)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_ref)):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale, rtol=2e-4)


def test_gradients_match_under_jit_and_longer_T():
    gru, out, conv_seq, y0, h0, mask = _setup(B=2, T=40, hidden=24, seed=3)

    @jax.jit
    def g_ref(gru_, out_, conv_):
        return jax.grad(
            lambda a: _loss_ref(a[0], a[1], a[2], y0, h0, mask)[0])(
                (gru_, out_, conv_))

    @jax.jit
    def g_fused(gru_, out_, conv_):
        return jax.grad(
            lambda a: _loss_fused(a[0], a[1], a[2], y0, h0, mask)[0])(
                (gru_, out_, conv_))

    ga = g_ref(gru, out, conv_seq)
    gb = g_fused(gru, out, conv_seq)
    for a, b in zip(jax.tree_util.tree_leaves(gb),
                    jax.tree_util.tree_leaves(ga)):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4 * scale, rtol=5e-4)


def test_bf16_stream_gradients_track_f32_reference():
    """The fast config streams the backward's residuals and gate cotangents
    at bf16 (pallas_gru_ar_bwd docstring).  Quantify the rounding: grads of
    the Pallas path (interpret mode) with bf16 weights must track the f32
    XLA reference in direction (cosine > 0.999) and scale (rel L2 < 3e-2)
    for every parameter leaf."""
    from jax.experimental.pallas import tpu as pltpu

    gru, out, conv_seq, y0, h0, mask = _setup(B=2, T=16, hidden=16, seed=7)
    conv_dim = conv_seq.shape[-1]
    gx = precompute_input_gates(gru, conv_seq)

    def loss(args, impl, dt):
        wy, whh, bhh, w, b = [a.astype(dt) for a in args]
        trj, y_T, h_T = gru_ar_fused(wy, whh, bhh, w, b,
                                     gx.astype(dt), y0, h0,
                                     mask.astype(dt), impl)
        return jnp.sum(trj ** 2) + jnp.sum(h_T ** 2)

    args = (gru["w_ih"][:, conv_dim:], gru["w_hh"], gru["b_hh"],
            out["w"], out["b"])
    g_ref = jax.grad(lambda a: loss(a, "xla", jnp.float32))(args)
    with pltpu.force_tpu_interpret_mode():
        g_bf16 = jax.grad(lambda a: loss(a, "pallas", jnp.bfloat16))(args)
    for a, b in zip(jax.tree_util.tree_leaves(g_bf16),
                    jax.tree_util.tree_leaves(g_ref)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        assert denom > 0
        cos = float(a @ b) / denom
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert cos > 0.999, f"cosine {cos}"
        assert rel < 3e-2, f"rel L2 {rel}"
