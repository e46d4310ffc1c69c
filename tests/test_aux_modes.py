"""Torch parity for the GRU_RNN aux output modes (residual AR mode, the
softmax/sigmoid/exp heads, relu_vae parameterization) and the TWFSEloss
RMSE+corr mode — reference src/nets/gru_vae.py:359,373,445-450,501-521.

These modes are unused by the shipped gauss pipeline but are part of the
declared model surface (the VQ / classifier variants need them)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from cyclevae_tpu.models import GRURNNConfig, loss_vae, loss_vae_laplace
from cyclevae_tpu.models.gru_vae import gru_rnn_apply, set_scale_stats
from tests.test_gru_vae import TorchGRURNN, _port_params


class TorchGRURNNAux(TorchGRURNN):
    """Extends the parity restatement with res mode + output heads
    (reference gru_vae.py:359-399,445-450)."""

    def forward(self, x, y_in, h_in=None, res=False, res_stdim=0,
                res_endim=None, softmax=False, sigmoid=False, exp=False):
        T = x.shape[1]
        if self.scale_in_flag:
            x_in_raw = self.scale_in(x.transpose(1, 2))
        else:
            x_in_raw = x.transpose(1, 2)
        x_in = x_in_raw
        for c in self.conv:
            x_in = c(x_in)
        x_conv = x_in.transpose(1, 2)
        x_norm = x_in_raw.transpose(1, 2)   # reference's x_in after :359
        if h_in is None:
            out, h = self.gru(torch.cat((x_conv[:, :1], y_in), 2))
        else:
            out, h = self.gru(torch.cat((x_conv[:, :1], y_in), 2), h_in)
        if not res:
            y_in = self.out_1(out.transpose(1, 2)).transpose(1, 2)
        else:
            y_in = x_norm[:, :1, res_stdim:res_endim] + \
                self.out_1(out.transpose(1, 2)).transpose(1, 2)
        trj = y_in
        for i in range(1, T):
            out, h = self.gru(torch.cat((x_conv[:, i:i + 1], y_in), 2), h)
            if not res:
                y_in = self.out_1(out.transpose(1, 2)).transpose(1, 2)
            else:
                y_in = x_norm[:, i:i + 1, res_stdim:res_endim] + \
                    self.out_1(out.transpose(1, 2)).transpose(1, 2)
            trj = torch.cat((trj, y_in), 1)
        if self.scale_out_flag:
            trj_out = self.scale_out(trj.transpose(1, 2)).transpose(1, 2)
        else:
            trj_out = trj
        if exp:
            return (torch.exp(trj_out) - 1) / 10000, y_in, h
        if softmax:
            return torch.nn.functional.softmax(trj_out, dim=-1), y_in, h
        if sigmoid:
            return torch.sigmoid(trj_out), y_in, h
        return trj_out, y_in, h


def _make_pair(in_dim=8, out_dim=6, hidden=24, seed=7, scale_out=False):
    cfg = GRURNNConfig(in_dim=in_dim, out_dim=out_dim, hidden_units=hidden,
                       hidden_layers=1, kernel_size=3, dilation_size=2,
                       scale_in=True, scale_out=scale_out)
    torch.manual_seed(seed)
    tm = TorchGRURNNAux(in_dim, out_dim, hidden, 1, 3, 2, True, scale_out)
    mean_in = np.random.RandomState(0).randn(in_dim).astype(np.float32)
    std_in = (np.random.RandomState(1).rand(in_dim) + 0.5).astype(np.float32)
    with torch.no_grad():
        tm.scale_in.weight.copy_(
            torch.diag(torch.tensor(1.0 / std_in)).unsqueeze(2))
        tm.scale_in.bias.copy_(torch.tensor(-mean_in / std_in))
    params = _port_params(tm, cfg)
    params = set_scale_stats(params, mean_in=mean_in, scale_in=std_in)
    return cfg, tm, params


def test_residual_mode_parity():
    """res mode: output AND AR feedback carry the normalized-input residual
    (reference gru_vae.py:373,388-399)."""
    cfg, tm, params = _make_pair()
    B, T = 2, 11
    x = torch.randn(B, T, cfg.in_dim)
    y0 = torch.zeros(B, 1, cfg.out_dim)
    res_stdim, res_endim = 1, 1 + cfg.out_dim
    with torch.no_grad():
        trj_ref, y_ref, h_ref = tm(x, y0, res=True, res_stdim=res_stdim,
                                   res_endim=res_endim)
    trj, y_last, h_last = gru_rnn_apply(
        params, cfg, jnp.asarray(x.numpy()), jnp.asarray(y0.numpy()[:, 0]),
        res=True, res_stdim=res_stdim, res_endim=res_endim)
    np.testing.assert_allclose(np.asarray(trj), trj_ref.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y_last), y_ref.numpy()[:, 0],
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h_last), h_ref.numpy(),
                               atol=3e-5, rtol=1e-4)


def test_output_heads_parity():
    """softmax / sigmoid / exp heads on trj_out; feedback stays pre-head
    (reference gru_vae.py:445-450)."""
    cfg, tm, params = _make_pair(seed=11)
    B, T = 2, 9
    x = torch.randn(B, T, cfg.in_dim)
    y0 = torch.zeros(B, 1, cfg.out_dim)
    for head in ("softmax", "sigmoid", "exp"):
        kw = {head: True}
        with torch.no_grad():
            trj_ref, y_ref, _ = tm(x, y0, **kw)
        trj, y_last, _ = gru_rnn_apply(
            params, cfg, jnp.asarray(x.numpy()),
            jnp.asarray(y0.numpy()[:, 0]), **kw)
        np.testing.assert_allclose(np.asarray(trj), trj_ref.numpy(),
                                   atol=3e-5, rtol=1e-4, err_msg=head)
        # feedback is the raw projection, not the head output
        np.testing.assert_allclose(np.asarray(y_last), y_ref.numpy()[:, 0],
                                   atol=3e-5, rtol=1e-4, err_msg=head)


def test_relu_vae_clamp():
    """relu_vae: variance lanes are relu'd and clamped at 1e-6
    (reference gru_vae.py:412-435)."""
    cfg, tm, params = _make_pair(seed=13)
    B, T, lat = 2, 7, 3
    x = jnp.asarray(np.random.RandomState(2).randn(B, T, cfg.in_dim)
                    .astype(np.float32))
    y0 = jnp.zeros((B, cfg.out_dim))
    trj, _, _ = gru_rnn_apply(params, cfg, x, y0, clamp_vae=True,
                              relu_vae=True, lat_dim=lat)
    aux = np.asarray(trj[..., lat:])
    assert (aux >= 1e-6 - 1e-12).all()
    # mu lanes unchanged vs the no-clamp forward
    trj_raw, _, _ = gru_rnn_apply(params, cfg, x, y0)
    np.testing.assert_allclose(np.asarray(trj[..., :lat]),
                               np.asarray(trj_raw[..., :lat]), atol=1e-6)


def test_loss_vae_relu_branch_matches_torch():
    """Variance-parameterized KL (reference gru_vae.py:123-127, 140-142)."""
    rng = np.random.RandomState(3)
    T, D = 6, 4
    mu = rng.randn(T, D).astype(np.float32)
    var = (rng.rand(T, D).astype(np.float32) + 0.1)
    param = np.concatenate([mu, var], axis=1)
    ours = float(loss_vae(jnp.asarray(param), lat_dim=D, relu_vae=True))
    tp = torch.tensor(param)
    ref = torch.mean(0.5 * torch.sum(
        tp[:, D:] + tp[:, :D] ** 2 - torch.log(tp[:, D:]) - 1.0, 1)).item()
    assert abs(ours - ref) < 1e-5

    ours_l = float(loss_vae_laplace(jnp.asarray(param), lat_dim=D,
                                    relu_vae=True))
    mu_t, sc = tp[:, :D], tp[:, D:]
    ref_l = torch.mean(torch.sum(
        -torch.log(sc) + sc * torch.exp(-mu_t.abs() / sc)
        + mu_t.abs() - 1, 1)).item()
    assert abs(ours_l - ref_l) < 1e-5


def test_rmse_corr_matches_torch():
    """TWFSEloss rmse mode (reference gru_vae.py:511-521): per-dim RMSE (L2)
    or MAE (L1) + per-dim Pearson corr over frames, each averaged over dims."""
    from cyclevae_tpu.vi.elbo import rmse_corr
    rng = np.random.RandomState(4)
    T, D = 12, 5
    x = rng.randn(T, D).astype(np.float32)
    y = (0.5 * x + 0.5 * rng.randn(T, D)).astype(np.float32)
    tx, ty = torch.tensor(x), torch.tensor(y)
    crit = torch.nn.MSELoss(reduction="none")
    for l2 in (True, False):
        if l2:
            r_ref = torch.sqrt(torch.mean(crit(tx, ty), 0))
        else:
            r_ref = torch.mean(torch.abs(tx - ty), 0)
        xd = tx - torch.mean(tx, 0)
        yd = ty - torch.mean(ty, 0)
        c_ref = torch.sum(xd * yd, 0) / (
            torch.sqrt(torch.sum(xd * xd, 0)) * torch.sqrt(torch.sum(yd * yd, 0)))
        r, c = rmse_corr(jnp.asarray(x), jnp.asarray(y), l2=l2)
        assert abs(float(r) - torch.mean(r_ref).item()) < 1e-5
        assert abs(float(c) - torch.mean(c_ref).item()) < 1e-5


def test_rmse_corr_masked_equals_sliced():
    from cyclevae_tpu.vi.elbo import rmse_corr
    rng = np.random.RandomState(6)
    T, D, n = 10, 4, 6
    x = rng.randn(T, D).astype(np.float32)
    y = rng.randn(T, D).astype(np.float32)
    mask = np.zeros(T, np.float32); mask[:n] = 1
    r_m, c_m = rmse_corr(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
    r_s, c_s = rmse_corr(jnp.asarray(x[:n]), jnp.asarray(y[:n]))
    assert abs(float(r_m) - float(r_s)) < 1e-5
    assert abs(float(c_m) - float(c_s)) < 1e-5


def test_input_noise_mode():
    """noise>0 adds N(0, noise^2) on the normalized input (gru_vae.py:348-350):
    mean behavior preserved, outputs differ from the noiseless forward."""
    cfg, tm, params = _make_pair(seed=17)
    B, T = 2, 8
    x = jnp.asarray(np.random.RandomState(9).randn(B, T, cfg.in_dim)
                    .astype(np.float32))
    y0 = jnp.zeros((B, cfg.out_dim))
    clean, _, _ = gru_rnn_apply(params, cfg, x, y0)
    noisy, _, _ = gru_rnn_apply(params, cfg, x, y0, noise=0.1,
                                rng=jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(clean), np.asarray(noisy))
    assert np.max(np.abs(np.asarray(clean) - np.asarray(noisy))) < 5.0
