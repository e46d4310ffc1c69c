"""Diagnose the amortized-proposal ESS collapse (VERDICT r4 weak #2).

BENCH_SMC_PARTICLES.json showed the encoder-guided ("amortized") proposal
COLLAPSING ESS (2586 -> 10 at N=4096) and losing ~2,557 nats of log-marginal
vs bootstrap, contradicting the old docstring claim in infer/smc.py.

Hypotheses instrumented here (small scale, CPU, trained flagship params):
  H1 (tempering mismatch): the bench runs the SSM at obs_scale=50 — a 50x
      flattened observation likelihood under which the tempered posterior is
      ~the prior, so the prior proposal is near-OPTIMAL and the amortized
      q (trained for the untempered decoder) pays ~KL(q_t || N(0,I)) nats of
      importance-weight variance per frame with no likelihood compensation.
  H2 (context mismatch): the SSM decodes with the center-tap-only conv
      approximation (smc.py make_decoder_ssm), while q was trained against
      the full two-sided-conv decoder — so even at obs_scale=1 the
      likelihood surface the proposal was tuned for differs from the SSM's.

Per (proposal, obs_scale) cell this reports: mean per-step incremental
log-likelihood, mean per-step importance correction (-KL estimate for the
amortized proposal), their net drift (what the log-marginal loses per frame),
ESS, resample rate, and log-marginal.  A summary verdict per obs_scale says
which proposal wins.  Also reports mean KL(q_t||prior) from enc_lat directly.

Usage: CYCLEVAE_PLATFORM=cpu python tools/diag_smc_amortized.py
Writes DIAG_SMC_AMORTIZED.json (repo root).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_hmc_chains import find_ckpt


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--particles", type=int, default=256)
    ap.add_argument("--obs-scales", type=float, nargs="+",
                    default=[1.0, 2.0, 5.0, 10.0, 50.0])
    ap.add_argument("--real", default=None,
                    help="h5 path of a REAL utterance (feat_org_lf0) to use "
                         "instead of the bench's synthetic sinusoids — the "
                         "encoder is only in-distribution on real features")
    ap.add_argument("--spk-idx", type=int, default=0,
                    help="speaker one-hot index for --real (0=src)")
    ap.add_argument("--out", default="DIAG_SMC_AMORTIZED.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cyclevae_tpu import enable_compilation_cache
    from cyclevae_tpu.infer.smc import SMCConfig, make_decoder_ssm, smc_filter
    from cyclevae_tpu.models.gru_vae import gru_rnn_apply
    from cyclevae_tpu.vi.train import CycleVAEConfig, init_cyclevae

    enable_compilation_cache()
    cfg = CycleVAEConfig(hidden_units=1024, n_cyc=2)
    ckpt = None if args.ckpt == "none" else find_ckpt(args.ckpt)
    if ckpt:
        from cyclevae_tpu.vi.checkpoint import load_checkpoint
        params = load_checkpoint(ckpt)["params"]
        params = jax.tree_util.tree_map(jnp.asarray, params)
        src = os.path.basename(os.path.dirname(ckpt))
    else:
        params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                               np.zeros(54, np.float32),
                               np.ones(54, np.float32))
        src = "fresh-init"

    T, N = args.frames, args.particles
    if args.real:
        import h5py
        with h5py.File(args.real, "r") as h:
            raw = np.asarray(h["feat_org_lf0"], np.float32)
        feats = jnp.asarray(raw[:T])
        T = int(feats.shape[0])
        onehot = np.zeros(2, np.float32)
        onehot[args.spk_idx] = 1.0
        code = jnp.asarray(np.tile(onehot, (T, 1)))
        data_src = os.path.basename(args.real)
    else:
        # same synthetic utterance family as bench_smc_particles.py
        rng = np.random.default_rng(0)
        t = np.arange(T)[:, None]
        feats = jnp.asarray(
            (np.sin(t * 0.05 + np.arange(54)[None, :])
             + 0.1 * rng.normal(size=(T, 54))).astype(np.float32))
        code = jnp.asarray(np.tile([0.0, 1.0], (T, 1)).astype(np.float32))
        data_src = "synthetic-sin"

    enc_lat, _, _ = gru_rnn_apply(
        params.encoder, cfg.enc_cfg, feats[None],
        jnp.zeros((1, cfg.lat_dim * 2)), lat_dim=cfg.lat_dim, clamp_vae=True)
    enc_lat = enc_lat[0]
    mu = enc_lat[:, :cfg.lat_dim]
    lv = enc_lat[:, cfg.lat_dim:]
    kl_t = 0.5 * jnp.sum(jnp.exp(lv) + mu ** 2 - lv - 1.0, axis=-1)
    mean_kl = float(jnp.mean(kl_t))
    print(f"params={src}  T={T} N={N}  "
          f"mean KL(q_t || N(0,I)) = {mean_kl:.2f} nats/frame")

    results = {"params": src, "data": data_src, "frames": T, "particles": N,
               "mean_kl_q_prior_per_frame": round(mean_kl, 3), "cells": []}
    for obs_scale in args.obs_scales:
        row_pair = {}
        for proposal in ("prior", "amortized"):
            init, prop, logw = make_decoder_ssm(
                params, cfg, feats, code, obs_scale=obs_scale,
                proposal=proposal,
                enc_lat=enc_lat if proposal == "amortized" else None)

            # instrumented per-step stats: wrap log_weight to also record
            # the likelihood part and the importance correction separately
            def logw_like_only(state, t):
                lw = logw(state, t)
                if proposal == "amortized":
                    lw = lw - state["log_iw"]
                return lw

            @jax.jit
            def run(key):
                states, info = smc_filter(key, T, init, prop, logw,
                                          SMCConfig(n_particles=N))
                return info

            info = run(jax.random.PRNGKey(int(obs_scale * 101)))
            jax.block_until_ready(info["log_marginal"])

            # one extra unweighted pass to estimate E_proposal[log-lik] and
            # E_proposal[log_iw] per step (no resampling, raw increments)
            @jax.jit
            def raw_increments(key):
                key, k_init = jax.random.split(key)
                states = jax.vmap(init)(jax.random.split(k_init, N))

                def step(carry, t):
                    key, states = carry
                    key, k = jax.random.split(key)
                    states = jax.vmap(lambda kk, s: prop(kk, s, t))(
                        jax.random.split(k, N), states)
                    ll = jax.vmap(lambda s: logw_like_only(s, t))(states)
                    iw = (jax.vmap(lambda s: s["log_iw"])(states)
                          if proposal == "amortized" else jnp.zeros(N))
                    return (key, states), (jnp.mean(ll), jnp.mean(iw))

                _, (ll_t, iw_t) = jax.lax.scan(
                    step, (jax.random.PRNGKey(7), states), jnp.arange(T))
                return jnp.mean(ll_t), jnp.mean(iw_t)

            mean_ll, mean_iw = raw_increments(jax.random.PRNGKey(3))
            cell = {
                "log_marginal": round(float(info["log_marginal"]), 2),
                "mean_ess": round(float(jnp.mean(info["ess"])), 1),
                "resample_rate": round(
                    float(jnp.mean(info["resampled"].astype(jnp.float32))), 3),
                "mean_loglik_per_step": round(float(mean_ll), 3),
                "mean_log_iw_per_step": round(float(mean_iw), 3),
            }
            row_pair[proposal] = cell
            print(f"obs_scale={obs_scale:5.1f} {proposal:9s} "
                  f"logZ={cell['log_marginal']:10.2f} "
                  f"ESS={cell['mean_ess']:7.1f} "
                  f"rr={cell['resample_rate']:.3f} "
                  f"E[loglik]={cell['mean_loglik_per_step']:9.3f} "
                  f"E[log_iw]={cell['mean_log_iw_per_step']:8.3f}")
        dz = (row_pair["amortized"]["log_marginal"]
              - row_pair["prior"]["log_marginal"])
        dess = (row_pair["amortized"]["mean_ess"]
                - row_pair["prior"]["mean_ess"])
        # likelihood gain the guided proposal buys per step, vs the KL it pays
        gain = (row_pair["amortized"]["mean_loglik_per_step"]
                - row_pair["prior"]["mean_loglik_per_step"])
        pay = -row_pair["amortized"]["mean_log_iw_per_step"]
        results["cells"].append({
            "obs_scale": obs_scale, **{f"{k}_{p}": v for p, c in
                                       row_pair.items() for k, v in c.items()},
            "dlogZ_amortized_minus_prior": round(dz, 2),
            "dESS": round(dess, 1),
            "loglik_gain_per_step": round(gain, 3),
            "kl_paid_per_step": round(pay, 3),
            "amortized_wins": bool(dz > 0 and dess > 0)})
        print(f"  -> dlogZ={dz:+.2f}  dESS={dess:+.1f}  "
              f"lik-gain/step={gain:+.3f} vs KL-paid/step={pay:.3f}  "
              f"{'AMORTIZED WINS' if dz > 0 and dess > 0 else 'prior wins'}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
