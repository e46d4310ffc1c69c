"""ELBO parity gate: the jitted segment loss must match a reference-equivalent
torch computation with IDENTICAL weights and latent noise (BASELINE.json
"bit-accurate ELBO parity" — defined deterministically by feeding both sides
the same eps draws; sampled-quantity parity is otherwise MC-error-bounded).

The torch side restates the reference flow verbatim (train…py:1326-1410):
encoder -> sample -> decoder(src/trg) -> encoder(cv) -> decoder(src), loss =
sum over utterances of [L1-MCD(recon) + L1-MCD(cyc) + KL + KL_cv] per cycle.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from cyclevae_tpu.vi.train import (
    CycleVAEConfig,
    CycleVAEParams,
    init_cycle_state,
    init_cyclevae,
)
from cyclevae_tpu.models.gru_vae import gru_rnn_apply, loss_vae, LOG_VAR_MIN
from cyclevae_tpu.vi.elbo import mcd_l1

from test_gru_vae import TorchGRURNN, _port_params  # noqa: E402


def _torch_from_jax(params: CycleVAEParams, cfg: CycleVAEConfig,
                    mean_jnt, scale_jnt):
    enc_t = TorchGRURNN(cfg.in_dim, cfg.lat_dim * 2, cfg.hidden_units, 1,
                        cfg.kernel_size, cfg.dilation_size, True, False)
    dec_t = TorchGRURNN(cfg.lat_dim + cfg.n_spk, cfg.out_dim,
                        cfg.hidden_units, 1, cfg.kernel_size,
                        cfg.dilation_size, False, True)
    with torch.no_grad():
        # copy jax params into torch
        for tm, jp in ((enc_t, params.encoder), (dec_t, params.decoder)):
            for i, c in enumerate(tm.conv):
                c.weight.copy_(torch.tensor(np.asarray(jp["conv"]["w"][i])))
                c.bias.copy_(torch.tensor(np.asarray(jp["conv"]["b"][i])))
            tm.gru.weight_ih_l0.copy_(torch.tensor(np.asarray(jp["gru"][0]["w_ih"])))
            tm.gru.weight_hh_l0.copy_(torch.tensor(np.asarray(jp["gru"][0]["w_hh"])))
            tm.gru.bias_ih_l0.copy_(torch.tensor(np.asarray(jp["gru"][0]["b_ih"])))
            tm.gru.bias_hh_l0.copy_(torch.tensor(np.asarray(jp["gru"][0]["b_hh"])))
            tm.out_1.weight.copy_(torch.tensor(np.asarray(jp["out"]["w"]))[:, :, None])
            tm.out_1.bias.copy_(torch.tensor(np.asarray(jp["out"]["b"])))
        enc_t.scale_in.weight.copy_(
            torch.diag(torch.tensor(1.0 / scale_jnt)).unsqueeze(2))
        enc_t.scale_in.bias.copy_(torch.tensor(-mean_jnt / scale_jnt))
        dec_t.scale_out.weight.copy_(
            torch.diag(torch.tensor(scale_jnt[cfg.stdim:])).unsqueeze(2))
        dec_t.scale_out.bias.copy_(torch.tensor(mean_jnt[cfg.stdim:]))
    return enc_t, dec_t


def test_cyclic_elbo_matches_torch_reference():
    cfg = CycleVAEConfig(hidden_units=24, lat_dim=6, n_cyc=2, do_prob=0.0)
    rng = np.random.default_rng(0)
    mean_jnt = rng.normal(size=54).astype(np.float32) * 0.1
    scale_jnt = (rng.uniform(0.5, 2.0, size=54)).astype(np.float32)
    params = init_cyclevae(jax.random.PRNGKey(3), cfg, mean_jnt, scale_jnt)
    enc_t, dec_t = _torch_from_jax(params, cfg, mean_jnt, scale_jnt)

    B, T = 2, 30
    feats = rng.normal(size=(B, T, 54)).astype(np.float32)
    cv = rng.normal(size=(B, T, 4)).astype(np.float32)
    src_code = np.tile([1.0, 0.0], (B, T, 1)).astype(np.float32)
    trg_code = np.tile([0.0, 1.0], (B, T, 1)).astype(np.float32)
    # shared latent noise: 3 draws per cycle
    eps = rng.normal(size=(cfg.n_cyc, 3, B, T, cfg.lat_dim)).astype(np.float32)

    # ---------------- torch reference flow ----------------
    tf = torch.tensor(feats)
    tcv = torch.tensor(cv)
    tsrc = torch.tensor(src_code)
    ttrg = torch.tensor(trg_code)
    y_pp = torch.zeros(B, 1, cfg.lat_dim * 2)
    s_out = np.asarray(params.decoder["scale_out"]["mean"])
    sc_out = np.asarray(params.decoder["scale_out"]["scale"])
    y_dec = torch.tensor(
        np.broadcast_to((0 - s_out) / sc_out, (B, 1, cfg.out_dim)).copy(),
        dtype=torch.float32)
    mcd_k = (10.0 / 2.3025850929940456840179914546844) * 1.4142135623730950488

    def kl(lat):
        mu, lv = lat[..., :cfg.lat_dim], lat[..., cfg.lat_dim:]
        return torch.mean(0.5 * torch.sum(torch.exp(lv) + mu ** 2 - lv - 1.0, 2),
                          dim=1)

    with torch.no_grad():
        loss_t = 0.0
        cyc_prev = None
        for i in range(cfg.n_cyc):
            enc_in = tf if i == 0 else torch.cat((tf[..., :cfg.stdim], cyc_prev), 2)
            lat, _, _ = enc_t(enc_in, y_pp, clamp_vae=True, lat_dim=cfg.lat_dim)
            z1 = lat[..., :cfg.lat_dim] + torch.exp(lat[..., cfg.lat_dim:] / 2) \
                * torch.tensor(eps[i, 0])
            rec, _, _ = dec_t(torch.cat((tsrc, z1), 2), y_dec)
            z2 = lat[..., :cfg.lat_dim] + torch.exp(lat[..., cfg.lat_dim:] / 2) \
                * torch.tensor(eps[i, 1])
            cnv, _, _ = dec_t(torch.cat((ttrg, z2), 2), y_dec)
            lat_cv, _, _ = enc_t(torch.cat((tcv, cnv), 2), y_pp,
                                 clamp_vae=True, lat_dim=cfg.lat_dim)
            z3 = lat_cv[..., :cfg.lat_dim] + torch.exp(lat_cv[..., cfg.lat_dim:] / 2) \
                * torch.tensor(eps[i, 2])
            cyc, _, _ = dec_t(torch.cat((tsrc, z3), 2), y_dec)
            cyc_prev = cyc
            mcd_rec = mcd_k * torch.sum(torch.abs(rec - tf[..., cfg.stdim:]), 2).mean(1)
            mcd_cyc = mcd_k * torch.sum(torch.abs(cyc - tf[..., cfg.stdim:]), 2).mean(1)
            loss_t = loss_t + (mcd_rec + mcd_cyc + kl(lat) + kl(lat_cv)).sum()
    loss_t = float(loss_t)

    # ---------------- jax flow with the same eps ----------------
    state = init_cycle_state(cfg, params, B)
    loss_j = 0.0
    cyc_prev = None
    jf = jnp.asarray(feats)
    for i in range(cfg.n_cyc):
        enc_in = jf if i == 0 else jnp.concatenate(
            [jf[..., :cfg.stdim], cyc_prev], axis=-1)
        lat, _, _ = gru_rnn_apply(params.encoder, cfg.enc_cfg, enc_in,
                                  state["enc_y"][i], state["enc_h"][i],
                                  clamp_vae=True, lat_dim=cfg.lat_dim)
        def draw(lat_, e):
            return lat_[..., :cfg.lat_dim] + jnp.exp(lat_[..., cfg.lat_dim:] / 2) \
                * jnp.asarray(e)
        rec, _, _ = gru_rnn_apply(params.decoder, cfg.dec_cfg,
                                  jnp.concatenate([jnp.asarray(src_code),
                                                   draw(lat, eps[i, 0])], axis=-1),
                                  state["dec_src_y"][i], state["dec_src_h"][i])
        cnv, _, _ = gru_rnn_apply(params.decoder, cfg.dec_cfg,
                                  jnp.concatenate([jnp.asarray(trg_code),
                                                   draw(lat, eps[i, 1])], axis=-1),
                                  state["dec_trg_y"][i], state["dec_trg_h"][i])
        lat_cv, _, _ = gru_rnn_apply(params.encoder, cfg.enc_cfg,
                                     jnp.concatenate([jnp.asarray(cv), cnv], axis=-1),
                                     state["enc_cv_y"][i], state["enc_cv_h"][i],
                                     clamp_vae=True, lat_dim=cfg.lat_dim)
        cyc, _, _ = gru_rnn_apply(params.decoder, cfg.dec_cfg,
                                  jnp.concatenate([jnp.asarray(src_code),
                                                   draw(lat_cv, eps[i, 2])], axis=-1),
                                  state["dec_cyc_y"][i], state["dec_cyc_h"][i])
        cyc_prev = cyc
        mcep = jf[..., cfg.stdim:]
        loss_j = loss_j + float(jnp.sum(
            mcd_l1(rec, mcep) + mcd_l1(cyc, mcep)
            + loss_vae(lat, cfg.lat_dim) + loss_vae(lat_cv, cfg.lat_dim)))

    assert abs(loss_j - loss_t) / abs(loss_t) < 2e-4, (loss_j, loss_t)
