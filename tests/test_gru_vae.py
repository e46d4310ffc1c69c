"""End-to-end GRU_RNN forward parity vs the reference torch module, plus
sampling/KL numerics (reference src/nets/gru_vae.py:69-144, 265-463)."""

import sys
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cyclevae_tpu.models import (
    GRURNNConfig,
    gru_rnn_apply,
    init_gru_rnn,
    loss_vae,
    sampling_vae_batch,
    LOG_VAR_MIN,
)
from cyclevae_tpu.models.gru_vae import set_scale_stats, init_hidden


class TorchGRURNN(torch.nn.Module):
    """Minimal re-statement of the reference GRU_RNN forward (gru_vae.py:265-455)
    for the gauss pipeline paths (no dropout, batch mode)."""

    def __init__(self, in_dim, out_dim, hidden_units, hidden_layers,
                 kernel_size, layers, scale_in, scale_out):
        super().__init__()
        self.scale_in_flag = scale_in
        self.scale_out_flag = scale_out
        rec = kernel_size ** layers
        pad = (rec - 1) // 2
        if scale_in:
            self.scale_in = torch.nn.Conv1d(in_dim, in_dim, 1)
        convs = []
        for i in range(layers):
            if i > 0:
                convs.append(torch.nn.Conv1d(
                    in_dim * kernel_size ** i, in_dim * kernel_size ** (i + 1),
                    kernel_size, dilation=kernel_size ** i, padding=0))
            else:
                convs.append(torch.nn.Conv1d(
                    in_dim, in_dim * kernel_size, kernel_size, dilation=1, padding=pad))
        self.conv = torch.nn.ModuleList(convs)
        self.gru = torch.nn.GRU(in_dim * rec + out_dim, hidden_units,
                                hidden_layers, batch_first=True)
        self.out_1 = torch.nn.Conv1d(hidden_units, out_dim, 1)
        if scale_out:
            self.scale_out = torch.nn.Conv1d(out_dim, out_dim, 1)

    def forward(self, x, y_in, h_in=None, clamp_vae=False, lat_dim=16):
        T = x.shape[1]
        if self.scale_in_flag:
            x_in = self.scale_in(x.transpose(1, 2))
        else:
            x_in = x.transpose(1, 2)
        for c in self.conv:
            x_in = c(x_in)
        x_conv = x_in.transpose(1, 2)
        if h_in is None:
            out, h = self.gru(torch.cat((x_conv[:, :1], y_in), 2))
        else:
            out, h = self.gru(torch.cat((x_conv[:, :1], y_in), 2), h_in)
        y_in = self.out_1(out.transpose(1, 2)).transpose(1, 2)
        trj = y_in
        for i in range(1, T):
            out, h = self.gru(torch.cat((x_conv[:, i:i + 1], y_in), 2), h)
            y_in = self.out_1(out.transpose(1, 2)).transpose(1, 2)
            trj = torch.cat((trj, y_in), 1)
        if self.scale_out_flag:
            trj_out = self.scale_out(trj.transpose(1, 2)).transpose(1, 2)
        else:
            trj_out = trj
            if clamp_vae:
                trj_out = torch.cat(
                    (trj_out[:, :, :lat_dim],
                     torch.clamp(trj_out[:, :, lat_dim:], min=LOG_VAR_MIN)), 2)
        return trj_out, y_in, h


def _port_params(tm: TorchGRURNN, cfg: GRURNNConfig):
    params = {
        "conv": {
            "w": [jnp.asarray(c.weight.detach().numpy()) for c in tm.conv],
            "b": [jnp.asarray(c.bias.detach().numpy()) for c in tm.conv],
        },
        "gru": [
            {
                "w_ih": jnp.asarray(getattr(tm.gru, f"weight_ih_l{l}").detach().numpy()),
                "w_hh": jnp.asarray(getattr(tm.gru, f"weight_hh_l{l}").detach().numpy()),
                "b_ih": jnp.asarray(getattr(tm.gru, f"bias_ih_l{l}").detach().numpy()),
                "b_hh": jnp.asarray(getattr(tm.gru, f"bias_hh_l{l}").detach().numpy()),
            }
            for l in range(cfg.hidden_layers)
        ],
        "out": {
            "w": jnp.asarray(tm.out_1.weight.detach().numpy()[:, :, 0]),
            "b": jnp.asarray(tm.out_1.bias.detach().numpy()),
        },
    }
    return params


@pytest.mark.parametrize("scale_out,clamp", [(True, False), (False, True)])
def test_gru_rnn_forward_parity(scale_out, clamp):
    """Decoder-like (scale_out) and encoder-like (clamp_vae) paths vs torch."""
    in_dim, out_dim, hidden, B, T, lat = 8, 6, 24, 2, 13, 3
    cfg = GRURNNConfig(in_dim=in_dim, out_dim=out_dim, hidden_units=hidden,
                       hidden_layers=1, kernel_size=3, dilation_size=2,
                       scale_in=True, scale_out=scale_out)
    torch.manual_seed(3)
    tm = TorchGRURNN(in_dim, out_dim, hidden, 1, 3, 2, True, scale_out)

    # bake normalization stats into the torch frozen convs the reference way
    mean_in = np.random.RandomState(0).randn(in_dim).astype(np.float32)
    std_in = (np.random.RandomState(1).rand(in_dim) + 0.5).astype(np.float32)
    with torch.no_grad():
        tm.scale_in.weight.copy_(torch.diag(torch.tensor(1.0 / std_in)).unsqueeze(2))
        tm.scale_in.bias.copy_(torch.tensor(-mean_in / std_in))
        if scale_out:
            mean_out = np.random.RandomState(2).randn(out_dim).astype(np.float32)
            std_out = (np.random.RandomState(3).rand(out_dim) + 0.5).astype(np.float32)
            tm.scale_out.weight.copy_(torch.diag(torch.tensor(std_out)).unsqueeze(2))
            tm.scale_out.bias.copy_(torch.tensor(mean_out))

    params = _port_params(tm, cfg)
    params = set_scale_stats(params, mean_in=mean_in, scale_in=std_in)
    if scale_out:
        params = set_scale_stats(params, mean_out=mean_out, scale_out=std_out)

    x = torch.randn(B, T, in_dim)
    y0 = torch.zeros(B, 1, out_dim)
    with torch.no_grad():
        trj_ref, y_ref, h_ref = tm(x, y0, clamp_vae=clamp, lat_dim=lat)

    trj, y_last, h_last = gru_rnn_apply(
        params, cfg, jnp.asarray(x.numpy()), jnp.asarray(y0.numpy()[:, 0]),
        clamp_vae=clamp, lat_dim=lat)
    np.testing.assert_allclose(np.asarray(trj), trj_ref.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y_last), y_ref.numpy()[:, 0], atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h_last), h_ref.numpy(), atol=3e-5, rtol=1e-4)


def test_state_carry_equals_full_sequence():
    """Splitting a sequence into two segments with (y, h) carry must equal a
    single full-length forward — the TBPTT carry contract (train…py:1298-1316)."""
    # kernel_size=1 → receptive field 1, so segmenting introduces no conv
    # boundary halo and carry must reproduce the full forward EXACTLY.  (With
    # k>1 the reference pads each segment independently, so segmented != full
    # there too — that behavior is covered by the torch parity test above.)
    cfg = GRURNNConfig(in_dim=5, out_dim=4, hidden_units=16, hidden_layers=1,
                       kernel_size=1, dilation_size=2, scale_in=False, scale_out=False)
    key = jax.random.PRNGKey(0)
    params = init_gru_rnn(key, cfg)
    B, T = 2, 20
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 5))
    y0 = jnp.zeros((B, 4))

    trj_full, _, _ = gru_rnn_apply(params, cfg, x, y0)
    t_split = 10
    trj_a, y_a, h_a = gru_rnn_apply(params, cfg, x[:, :t_split], y0)
    trj_b, _, _ = gru_rnn_apply(params, cfg, x[:, t_split:], y_a, h_in=h_a)
    np.testing.assert_allclose(np.asarray(trj_a), np.asarray(trj_full[:, :t_split]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(trj_b), np.asarray(trj_full[:, t_split:]),
                               atol=1e-5)


def test_sampling_vae_moments():
    key = jax.random.PRNGKey(0)
    mu = jnp.full((4000, 2), 1.5)
    lv = jnp.full((4000, 2), -1.0)
    param = jnp.concatenate([mu, lv], axis=-1)
    z = sampling_vae_batch(key, param[None])[0]
    assert abs(float(z.mean()) - 1.5) < 0.05
    assert abs(float(z.std()) - np.exp(-0.5)) < 0.02


def test_loss_vae_matches_closed_form_and_torch():
    rng = np.random.RandomState(0)
    T, D = 7, 3
    mu = rng.randn(T, D).astype(np.float32)
    lv = rng.randn(T, D).astype(np.float32)
    param = np.concatenate([mu, lv], axis=1)
    ours = float(loss_vae(jnp.asarray(param), lat_dim=D))
    tp = torch.tensor(param)
    ref = torch.mean(0.5 * torch.sum(
        torch.exp(tp[:, D:]) + tp[:, :D] ** 2 - tp[:, D:] - 1.0, 1)).item()
    assert abs(ours - ref) < 1e-5
    # masked version equals slicing
    mask = np.zeros(T, np.float32); mask[:4] = 1
    ours_mask = float(loss_vae(jnp.asarray(param), lat_dim=D, mask=jnp.asarray(mask)))
    ref_slice = float(loss_vae(jnp.asarray(param[:4]), lat_dim=D))
    assert abs(ours_mask - ref_slice) < 1e-5


def test_loss_vae_laplace_matches_torch():
    from cyclevae_tpu.models import loss_vae_laplace
    rng = np.random.RandomState(5)
    T, D = 6, 3
    mu = rng.randn(T, D).astype(np.float32)
    ls = rng.randn(T, D).astype(np.float32) * 0.5
    param = np.concatenate([mu, ls], axis=1)
    ours = float(loss_vae_laplace(jnp.asarray(param), lat_dim=D))
    tp = torch.tensor(param)
    mu_t, sg = tp[:, :D], tp[:, D:]
    scale = torch.exp(sg)
    ref = torch.mean(torch.sum(
        -sg + scale * torch.exp(-mu_t.abs() / scale) + mu_t.abs() - 1, 1)).item()
    assert abs(ours - ref) < 1e-5


def test_laplace_posterior_training_mode():
    """CycleVAE with posterior='laplace' (reference gru_vae.py:101-144 surface)
    trains: finite decreasing loss through the full train step."""
    from cyclevae_tpu.vi.train import (
        CycleVAEConfig, TrainState, init_cyclevae, make_optimizer,
        make_train_step)
    cfg = CycleVAEConfig(hidden_units=16, n_cyc=1, lat_dim=4,
                         posterior="laplace")
    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    B, seg, n_segs = 2, 20, 2
    T = seg * n_segs
    rng = np.random.default_rng(0)
    t = np.arange(T)[None, :, None]
    feats = (np.sin(t * 0.05 + np.arange(54)[None, None, :])
             + 0.1 * rng.normal(size=(B, T, 54))).astype(np.float32)
    batch = {"feats": jnp.asarray(feats),
             "src_code": jnp.asarray(np.tile([1., 0.], (B, T, 1)).astype(np.float32)),
             "trg_code": jnp.asarray(np.tile([0., 1.], (B, T, 1)).astype(np.float32)),
             "cv_excit": jnp.asarray(feats[..., :4]),
             "flens": jnp.asarray([T, T], dtype=np.int32)}
    opt = make_optimizer(cfg, lr=1e-3)
    ts = TrainState(params, opt.init(params), jax.random.PRNGKey(1),
                    jnp.zeros((), jnp.int32))
    step = make_train_step(cfg, opt, seg, n_segs)
    hist = []
    for _ in range(15):
        ts, m = step(ts, batch)
        hist.append(float(jnp.sum(m["loss"])))
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_two_layer_gru_train_step():
    """hidden_layers=2 (reference --hidden_layers surface) through the full
    train step; pallas path must also fall back cleanly."""
    from cyclevae_tpu.vi.train import (
        CycleVAEConfig, TrainState, init_cyclevae, make_optimizer,
        make_train_step)
    cfg = CycleVAEConfig(hidden_units=12, hidden_layers=2, n_cyc=1, lat_dim=4)
    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    assert len(params.encoder["gru"]) == 2
    B, seg, n_segs = 2, 10, 2
    T = seg * n_segs
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(B, T, 54)).astype(np.float32)
    batch = {"feats": jnp.asarray(feats),
             "src_code": jnp.asarray(np.tile([1., 0.], (B, T, 1)).astype(np.float32)),
             "trg_code": jnp.asarray(np.tile([0., 1.], (B, T, 1)).astype(np.float32)),
             "cv_excit": jnp.asarray(feats[..., :4]),
             "flens": jnp.asarray([T, T], dtype=np.int32)}
    opt = make_optimizer(cfg, lr=1e-3)
    ts = TrainState(params, opt.init(params), jax.random.PRNGKey(1),
                    jnp.zeros((), jnp.int32))
    step = make_train_step(cfg, opt, seg, n_segs)
    ts, m = step(ts, batch)
    assert np.isfinite(float(jnp.sum(m["loss"])))

    # pallas flag on a 2-layer net must fall back to the scan without error
    # (params was donated into the step; use the updated copy)
    from cyclevae_tpu.models.gru_vae import gru_rnn_apply
    params = ts.params
    out, _, _ = gru_rnn_apply(params.encoder, cfg.enc_cfg,
                              jnp.asarray(feats[:, :10]),
                              jnp.zeros((B, cfg.lat_dim * 2)),
                              use_pallas=True)
    assert out.shape == (B, 10, cfg.lat_dim * 2)


def test_bernoulli_rbg_dropout_draw():
    """The TPU dropout fast path (_bernoulli_rbg) must be a deterministic,
    key-sensitive Bernoulli(p) draw — same contract as jax.random.bernoulli,
    different (hardware RngBitGenerator) bit stream."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cyclevae_tpu.models.gru_vae import _bernoulli_rbg

    k = jax.random.PRNGKey(42)
    m1 = np.asarray(_bernoulli_rbg(k, 0.5, (64, 80, 128)))
    m2 = np.asarray(_bernoulli_rbg(k, 0.5, (64, 80, 128)))
    m3 = np.asarray(_bernoulli_rbg(jax.random.PRNGKey(43), 0.5, (64, 80, 128)))
    assert (m1 == m2).all(), "not deterministic in the key"
    assert (m1 != m3).mean() > 0.4, "not key-sensitive"
    assert abs(m1.mean() - 0.5) < 5e-3, f"marginal off: {m1.mean()}"
    # works under jit (the train step draws masks inside the jitted segment)
    mj = np.asarray(jax.jit(
        lambda kk: _bernoulli_rbg(kk, 0.5, (64, 80, 128)))(k))
    assert (mj == m1).all()
