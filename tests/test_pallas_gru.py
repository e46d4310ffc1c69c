"""Pallas fused AR-GRU kernel parity vs the XLA scan (interpreter mode on CPU;
the TPU path is exercised by bench.py / decode on hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cyclevae_tpu.models import GRURNNConfig, init_gru_rnn
from cyclevae_tpu.ops.gru_scan import gru_ar_scan, precompute_input_gates


def test_pallas_gru_matches_scan_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from cyclevae_tpu.ops.pallas_gru import pallas_gru_ar

    cfg = GRURNNConfig(in_dim=6, out_dim=8, hidden_units=32,
                       scale_in=False, scale_out=False)
    params = init_gru_rnn(jax.random.PRNGKey(0), cfg)
    B, T = 4, 12
    rng = np.random.default_rng(0)
    conv_seq = jnp.asarray(rng.normal(size=(B, T, 6 * 9)).astype(np.float32)) * 0.3
    y0 = jnp.zeros((B, 8))
    h0 = jnp.zeros((1, B, 32))

    trj_ref, yT_ref, hT_ref = gru_ar_scan(params["gru"], params["out"],
                                          conv_seq, y0, h0)
    gx = precompute_input_gates(params["gru"][0], conv_seq)
    with pltpu.force_tpu_interpret_mode():
        trj, yT, hT = pallas_gru_ar(params["gru"][0], params["out"], gx, y0,
                                    h0[0])
    np.testing.assert_allclose(np.asarray(trj), np.asarray(trj_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(yT), np.asarray(yT_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_ref[0]), atol=2e-5)


def test_pallas_gru_train_kernel_matches_scan_interpret():
    """The TRAIN kernel (mask input + h_seq streaming output) against the
    XLA reference forward of the custom VJP — on hardware this kernel only
    runs on real TPUs, so interpreter-mode parity is its CI coverage."""
    from jax.experimental.pallas import tpu as pltpu
    from cyclevae_tpu.ops.pallas_gru import pallas_gru_ar_train
    from cyclevae_tpu.ops.gru_ar_vjp import _forward_scan

    cfg = GRURNNConfig(in_dim=6, out_dim=8, hidden_units=32,
                       scale_in=False, scale_out=False)
    params = init_gru_rnn(jax.random.PRNGKey(1), cfg)
    B, T, H = 4, 12, 32
    rng = np.random.default_rng(1)
    conv_seq = jnp.asarray(rng.normal(size=(B, T, 6 * 9)).astype(np.float32)) * 0.3
    y0 = jnp.zeros((B, 8))
    h0 = jnp.zeros((B, H))
    # inverted-dropout mask with real zeros: exercises the mask path
    mask = jnp.asarray(
        (rng.random((B, T, H)) > 0.3).astype(np.float32)) / 0.7

    g0 = params["gru"][0]
    gx = precompute_input_gates(g0, conv_seq)
    conv_dim = conv_seq.shape[-1]
    trj_ref, yT_ref, hT_ref, hseq_ref = _forward_scan(
        g0["w_ih"][:, conv_dim:], g0["w_hh"], g0["b_hh"],
        params["out"]["w"], params["out"]["b"], gx, y0, h0, mask)
    with pltpu.force_tpu_interpret_mode():
        trj, yT, hT, hseq = pallas_gru_ar_train(
            g0, params["out"], gx, y0, h0, mask)
    np.testing.assert_allclose(np.asarray(trj), np.asarray(trj_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(yT), np.asarray(yT_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hseq), np.asarray(hseq_ref),
                               atol=2e-5)
