"""Cyclic-ELBO amortized VI: the CycleVAE training core.

Re-designs the reference stage-4 driver (src/bin/train_gru_cyclevae_gauss_batch.py)
as one jitted program:

  * The cyclic flow per segment (reference :1292-1353):
      lat      = encoder(feats | cycle>0: excit ⧺ cyc_recon[prev])
      recon    = decoder(src_code ⧺ sample(lat))
      conv     = decoder(trg_code ⧺ sample(lat))        # fresh draw, as reference
      lat_cv   = encoder(cv_excit ⧺ conv)
      cyc_recon= decoder(src_code ⧺ sample(lat_cv))
  * Loss per cycle (reference :1401-1410): per-utterance mean L1-MCD(recon, mcep)
    + L1-MCD(cyc_recon, mcep) + KL(lat) + KL(lat_cv), SUMMED over utterances;
    the src→trg conversion MCD is logged but NOT optimized (:1368).
    half-cycle mode (n_cyc=0 → 1 cycle, VAE) drops the cyc/cv terms (:283-287).
  * TBPTT (reference :45-149, 1298-1316): 80-frame segments; GRU hidden h and AR
    feedback y are carried across segments of the same utterance batch but
    DETACHED — here a ``lax.scan`` over segments whose carry is stop-gradiented,
    with one Adam update per segment inside the scan (reference steps the
    optimizer per segment, :1418-1420).

Everything runs on device: no per-segment host round-trips, no Python loops
over frames.  Variable utterance lengths are handled with per-frame masks
instead of the reference's dynamic ``[:flen]`` slicing (static shapes for XLA).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.gru_vae import (
    GRURNNConfig,
    gru_rnn_apply,
    init_gru_rnn,
    init_hidden,
    loss_vae,
    loss_vae_laplace,
    sampling_vae_batch,
    sampling_vae_laplace_batch,
)
from .elbo import mcd_l1


# ---------------------------------------------------------------------------
# Model assembly
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CycleVAEConfig:
    """Encoder/decoder pair configuration (reference train…py:310-329)."""

    in_dim: int = 54
    out_dim: int = 50
    lat_dim: int = 32
    n_spk: int = 2
    hidden_units: int = 1024
    hidden_layers: int = 1
    kernel_size: int = 3
    dilation_size: int = 2
    n_cyc: int = 2
    do_prob: float = 0.5
    stdim: int = 4
    posterior: str = "gauss"    # "gauss" | "laplace" (reference gru_vae.py:101-144)
    # perf knobs (numerics-affecting — off by default for reference parity):
    # use_pallas routes the AR recurrence through the fused Pallas kernel with
    # its custom VJP (ops/gru_ar_vjp.py); compute_dtype="bfloat16" runs the
    # matmuls in bf16 with f32 master weights and f32 loss/clamp algebra
    use_pallas: bool = False
    compute_dtype: str = "float32"

    @property
    def half_cyc(self) -> bool:
        return self.n_cyc < 1

    @property
    def eff_cyc(self) -> int:
        return max(self.n_cyc, 1)

    @property
    def enc_cfg(self) -> GRURNNConfig:
        return GRURNNConfig(
            in_dim=self.in_dim, out_dim=self.lat_dim * 2,
            hidden_units=self.hidden_units, hidden_layers=self.hidden_layers,
            kernel_size=self.kernel_size, dilation_size=self.dilation_size,
            do_prob=self.do_prob, scale_in=True, scale_out=False,
            compute_dtype=self.compute_dtype)

    @property
    def dec_cfg(self) -> GRURNNConfig:
        return GRURNNConfig(
            in_dim=self.lat_dim + self.n_spk, out_dim=self.out_dim,
            hidden_units=self.hidden_units, hidden_layers=self.hidden_layers,
            kernel_size=self.kernel_size, dilation_size=self.dilation_size,
            do_prob=self.do_prob, scale_in=False, scale_out=True,
            compute_dtype=self.compute_dtype)


class CycleVAEParams(NamedTuple):
    encoder: Dict
    decoder: Dict


def init_cyclevae(key, cfg: CycleVAEConfig,
                  mean_jnt=None, scale_jnt=None) -> CycleVAEParams:
    """Init both nets; bake joint stats into frozen scalers if given
    (reference train…py:296-299, 344-347: encoder normalizes the full 54-d
    feature, decoder un-normalizes the 50-d mcep block = stats[stdim:])."""
    k_enc, k_dec = jax.random.split(key)
    enc = init_gru_rnn(k_enc, cfg.enc_cfg)
    dec = init_gru_rnn(k_dec, cfg.dec_cfg)
    if mean_jnt is not None:
        mean_jnt = jnp.asarray(mean_jnt)
        scale_jnt = jnp.asarray(scale_jnt)
        enc["scale_in"] = {"mean": mean_jnt, "scale": scale_jnt}
        dec["scale_out"] = {"mean": mean_jnt[cfg.stdim:], "scale": scale_jnt[cfg.stdim:]}
    return CycleVAEParams(encoder=enc, decoder=dec)


# ---------------------------------------------------------------------------
# Carried AR/hidden state for the cyclic flow
# ---------------------------------------------------------------------------

def init_cycle_state(cfg: CycleVAEConfig, params: CycleVAEParams, batch: int) -> Dict:
    """Fresh-state init (reference train…py:357-363): encoder feedback = zeros;
    decoder feedback = normalized zero mcep = (0 - mean)/scale."""
    n = cfg.eff_cyc
    s = params.decoder["scale_out"]
    y_dec0 = jnp.broadcast_to((0.0 - s["mean"]) / s["scale"], (batch, cfg.out_dim))
    zeros_enc_y = jnp.zeros((n, batch, cfg.lat_dim * 2))
    enc_h = jnp.stack([init_hidden(cfg.enc_cfg, batch)] * n)
    dec_h = jnp.stack([init_hidden(cfg.dec_cfg, batch)] * n)
    return {
        "enc_y": zeros_enc_y, "enc_h": enc_h,
        "enc_cv_y": zeros_enc_y, "enc_cv_h": enc_h,
        "dec_src_y": jnp.stack([y_dec0] * n), "dec_src_h": dec_h,
        "dec_trg_y": jnp.stack([y_dec0] * n), "dec_trg_h": dec_h,
        "dec_cyc_y": jnp.stack([y_dec0] * n), "dec_cyc_h": dec_h,
    }


def cyclic_forward(
    params: CycleVAEParams,
    cfg: CycleVAEConfig,
    rng: jax.Array,
    feats: jnp.ndarray,       # (B, T, in_dim) raw (unnormalized) features
    src_code: jnp.ndarray,    # (B, T, n_spk)
    trg_code: jnp.ndarray,    # (B, T, n_spk) or (n_cyc, B, T, n_spk)
    cv_excit: jnp.ndarray,    # (B, T, stdim) or (n_cyc, B, T, stdim)
    state: Dict,
    do: bool = False,
) -> Tuple[Dict, Dict]:
    """One segment of the cyclic flow for all cycles.  Returns (outputs, new_state).

    outputs: dict with stacked per-cycle arrays:
      lat (n, B, T, 2*lat), lat_cv, recon (n, B, T, out), conv, cyc_recon.

    Many-to-many surface: pass ``trg_code`` / ``cv_excit`` with a leading
    n_cyc axis to convert to a DIFFERENT randomly-drawn speaker each cycle
    (reference dataset.py:101-135 contract); 3-D inputs reuse one pair for
    every cycle (the one-to-one pipeline).
    """
    n = cfg.eff_cyc
    lat_dim = cfg.lat_dim
    laplace = cfg.posterior == "laplace"
    sample_fn = sampling_vae_laplace_batch if laplace else sampling_vae_batch
    clamp_kw = ({"clamp_vae_laplace": True} if laplace else {"clamp_vae": True})
    new_state = {k: v for k, v in state.items()}
    outs = {k: [] for k in ("lat", "lat_cv", "recon", "conv", "cyc_recon")}
    cyc_prev = None
    for i in range(n):
        trg_code_i = trg_code[i] if trg_code.ndim == 4 else trg_code
        cv_excit_i = cv_excit[i] if cv_excit.ndim == 4 else cv_excit
        rng, *ks = jax.random.split(rng, 9)
        if i == 0:
            enc_in = feats
        else:
            enc_in = jnp.concatenate([feats[..., :cfg.stdim], cyc_prev], axis=-1)
        lat, y, h = gru_rnn_apply(
            params.encoder, cfg.enc_cfg, enc_in,
            state["enc_y"][i], state["enc_h"][i],
            rng=ks[0], do=do, lat_dim=lat_dim, use_pallas=cfg.use_pallas,
            **clamp_kw)
        new_state["enc_y"] = new_state["enc_y"].at[i].set(y)
        new_state["enc_h"] = new_state["enc_h"].at[i].set(h)

        # recon (src code) and conversion (trg code) decodes are independent
        # given the latent draws — fuse them into ONE decoder call on a 2B
        # batch (the AR step cost is batch-insensitive up to ~128, so this
        # halves the wall time of these two paths; numerics are identical)
        z_src = sample_fn(ks[1], lat, lat_dim)
        z_trg = sample_fn(ks[3], lat, lat_dim)
        B = feats.shape[0]
        dec_in = jnp.concatenate([
            jnp.concatenate([src_code, z_src], axis=-1),
            jnp.concatenate([trg_code_i, z_trg], axis=-1)], axis=0)
        y_in2 = jnp.concatenate([state["dec_src_y"][i],
                                 state["dec_trg_y"][i]], axis=0)
        h_in2 = jnp.concatenate([state["dec_src_h"][i],
                                 state["dec_trg_h"][i]], axis=1)
        out2, y2, h2 = gru_rnn_apply(
            params.decoder, cfg.dec_cfg, dec_in, y_in2, h_in2,
            rng=ks[2], do=do, use_pallas=cfg.use_pallas)
        recon, conv = out2[:B], out2[B:]
        new_state["dec_src_y"] = new_state["dec_src_y"].at[i].set(y2[:B])
        new_state["dec_src_h"] = new_state["dec_src_h"].at[i].set(h2[:, :B])
        new_state["dec_trg_y"] = new_state["dec_trg_y"].at[i].set(y2[B:])
        new_state["dec_trg_h"] = new_state["dec_trg_h"].at[i].set(h2[:, B:])

        lat_cv, y, h = gru_rnn_apply(
            params.encoder, cfg.enc_cfg,
            jnp.concatenate([cv_excit_i, conv], axis=-1),
            state["enc_cv_y"][i], state["enc_cv_h"][i],
            rng=ks[5], do=do, lat_dim=lat_dim, use_pallas=cfg.use_pallas,
            **clamp_kw)
        new_state["enc_cv_y"] = new_state["enc_cv_y"].at[i].set(y)
        new_state["enc_cv_h"] = new_state["enc_cv_h"].at[i].set(h)

        z_cv = sample_fn(ks[6], lat_cv, lat_dim)
        cyc_recon, y, h = gru_rnn_apply(
            params.decoder, cfg.dec_cfg,
            jnp.concatenate([src_code, z_cv], axis=-1),
            state["dec_cyc_y"][i], state["dec_cyc_h"][i], rng=ks[7], do=do,
            use_pallas=cfg.use_pallas)
        new_state["dec_cyc_y"] = new_state["dec_cyc_y"].at[i].set(y)
        new_state["dec_cyc_h"] = new_state["dec_cyc_h"].at[i].set(h)

        cyc_prev = cyc_recon
        outs["lat"].append(lat)
        outs["lat_cv"].append(lat_cv)
        outs["recon"].append(recon)
        outs["conv"].append(conv)
        outs["cyc_recon"].append(cyc_recon)
    outputs = {k: jnp.stack(v) for k, v in outs.items()}
    return outputs, new_state


def segment_loss(
    params: CycleVAEParams,
    cfg: CycleVAEConfig,
    rng: jax.Array,
    seg: Dict,
    state: Dict,
    do: bool = True,
) -> Tuple[jnp.ndarray, Tuple[Dict, Dict]]:
    """Loss over one TBPTT segment; seg contains feats/src_code/trg_code/cv_excit
    (B, S, .) and mask (B, S) of valid frames."""
    outputs, new_state = cyclic_forward(
        params, cfg, rng, seg["feats"], seg["src_code"], seg["trg_code"],
        seg["cv_excit"], state, do=do)
    mcep = seg["feats"][..., cfg.stdim:]
    mask = seg["mask"]  # (B, S)
    utt_valid = (jnp.sum(mask, axis=-1) > 0).astype(mcep.dtype)  # (B,)

    loss = 0.0
    metrics = {}
    for i in range(cfg.eff_cyc):
        mcd_rec = mcd_l1(outputs["recon"][i], mcep, mask)          # (B,)
        mcd_cyc = mcd_l1(outputs["cyc_recon"][i], mcep, mask)
        mcd_cv = mcd_l1(outputs["conv"][i], mcep, mask)            # logged only
        kl_fn = loss_vae_laplace if cfg.posterior == "laplace" else loss_vae
        kl = kl_fn(outputs["lat"][i], cfg.lat_dim, mask)
        kl_cv = kl_fn(outputs["lat_cv"][i], cfg.lat_dim, mask)
        if cfg.half_cyc:
            cyc_loss = mcd_rec + kl
        else:
            cyc_loss = mcd_rec + mcd_cyc + kl + kl_cv
        loss = loss + jnp.sum(cyc_loss * utt_valid)
        nvalid = jnp.maximum(jnp.sum(utt_valid), 1.0)
        metrics[f"mcd_src_src_{i}"] = jnp.sum(mcd_rec * utt_valid) / nvalid
        metrics[f"mcd_src_trg_src_{i}"] = jnp.sum(mcd_cyc * utt_valid) / nvalid
        metrics[f"mcd_src_trg_{i}"] = jnp.sum(mcd_cv * utt_valid) / nvalid
        metrics[f"kl_lat_{i}"] = jnp.sum(kl * utt_valid) / nvalid
        metrics[f"kl_lat_cv_{i}"] = jnp.sum(kl_cv * utt_valid) / nvalid
    metrics["loss"] = loss
    return loss, (new_state, metrics)


# ---------------------------------------------------------------------------
# Train step: scan over segments with per-segment Adam updates
# ---------------------------------------------------------------------------

class TrainState(NamedTuple):
    params: CycleVAEParams
    opt_state: Any
    rng: jax.Array
    step: jnp.ndarray


def make_optimizer(cfg: CycleVAEConfig, lr: float = 1e-4,
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam over conv+gru+out params only; frozen scalers get zero updates
    (reference train…py:369-377).  Note: ``optax.masked`` alone is NOT enough —
    it passes raw gradients through for masked-out leaves, which would apply
    gradient *ascent* at step size 1.0 to the frozen normalizers."""
    def label_fn(params: CycleVAEParams):
        def net_labels(net):
            return {k: jax.tree_util.tree_map(
                lambda _: "freeze" if k in ("scale_in", "scale_out") else "train", v)
                for k, v in net.items()}
        return CycleVAEParams(encoder=net_labels(params.encoder),
                              decoder=net_labels(params.decoder))
    if weight_decay > 0:
        base = optax.adamw(lr, weight_decay=weight_decay)
    else:
        base = optax.adam(lr)
    return optax.multi_transform(
        {"train": base, "freeze": optax.set_to_zero()}, label_fn)


def build_step_fn(cfg: CycleVAEConfig, optimizer: optax.GradientTransformation,
                  seg_len: int, n_segs: int):
    """Unjitted train step over one utterance batch (shared by the single-
    device and DP-sharded wrappers).

    batch: feats (B, n_segs*seg_len, in_dim), src_code, trg_code (B, ·, n_spk),
           cv_excit (B, ·, stdim), flens (B,) int32.
    Returns (new_train_state, metrics dict of (n_segs, …) per-segment values;
    metrics["seg_valid"] flags segments with any real frame).
    """

    def step_fn(ts: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        B = batch["feats"].shape[0]
        T = n_segs * seg_len
        frame_idx = jnp.arange(T)
        mask_full = (frame_idx[None, :] < batch["flens"][:, None]).astype(
            batch["feats"].dtype)  # (B, T)

        def to_segs(x):
            if x.ndim == 4:  # (n_cyc, B, T, D): per-cycle many-to-many arrays
                xr = x[:, :, :T].reshape(x.shape[0], x.shape[1], n_segs,
                                         seg_len, x.shape[3])
                return jnp.moveaxis(xr, 2, 0)  # (n_segs, n_cyc, B, seg, D)
            x = x[:, :T]
            return x.reshape(x.shape[0], n_segs, seg_len, *x.shape[2:]).swapaxes(0, 1)

        segs = {
            "feats": to_segs(batch["feats"]),
            "src_code": to_segs(batch["src_code"]),
            "trg_code": to_segs(batch["trg_code"]),
            "cv_excit": to_segs(batch["cv_excit"]),
            "mask": to_segs(mask_full),
        }

        state0 = init_cycle_state(cfg, ts.params, B)

        def seg_step(carry, seg):
            params, opt_state, cyc_state, rng = carry
            rng, k_seg = jax.random.split(rng)
            # TBPTT: detach carried AR/hidden state (reference Variable(.data).detach())
            cyc_state = jax.tree_util.tree_map(jax.lax.stop_gradient, cyc_state)
            (loss, (new_cyc_state, metrics)), grads = jax.value_and_grad(
                segment_loss, has_aux=True)(params, cfg, k_seg, seg, cyc_state, True)
            # A segment past every utterance's true length (bucket_len rounds T
            # up to n_segs*seg_len quanta) has an all-zero mask: its loss and
            # grads are identically zero, but Adam's momentum-driven update
            # m_hat/sqrt(v_hat) would still move params — a step the reference
            # never takes (it only steps on selected utterances,
            # train…py:1418-1420).  Gate params AND opt state on validity.
            seg_valid = jnp.sum(seg["mask"]) > 0
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(seg_valid, a, b), new, old)
            new_params = keep(new_params, params)
            new_opt = keep(new_opt, opt_state)
            metrics["seg_valid"] = seg_valid.astype(jnp.float32)
            return (new_params, new_opt, new_cyc_state, rng), metrics

        (params, opt_state, _, rng), metrics = jax.lax.scan(
            seg_step, (ts.params, ts.opt_state, state0, ts.rng), segs)
        new_ts = TrainState(params=params, opt_state=opt_state, rng=rng,
                            step=ts.step + 1)
        return new_ts, metrics

    return step_fn


def make_train_step(cfg: CycleVAEConfig, optimizer: optax.GradientTransformation,
                    seg_len: int, n_segs: int):
    """Jitted single-device train step (see build_step_fn)."""
    return jax.jit(build_step_fn(cfg, optimizer, seg_len, n_segs),
                   donate_argnums=(0,))


def make_eval_forward(cfg: CycleVAEConfig):
    """Full-length no-dropout cyclic forward for the eval epoch
    (reference train…py:817-1152 runs the same flow under no_grad)."""

    def eval_fn(params: CycleVAEParams, rng: jax.Array, batch: Dict):
        B = batch["feats"].shape[0]
        state0 = init_cycle_state(cfg, params, B)
        outputs, _ = cyclic_forward(
            params, cfg, rng, batch["feats"], batch["src_code"],
            batch["trg_code"], batch["cv_excit"], state0, do=False)
        return outputs

    return jax.jit(eval_fn)
