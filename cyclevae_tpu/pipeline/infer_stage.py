"""Posterior-inference stage: MCMC over utterance latents with the frozen
decoder + posterior-predictive conversion.

The new capability stage (BASELINE.json configs 2-4; no reference
counterpart): where the reference's stage 6 converts with the amortized
encoder mean (decode…py:302-308), this stage draws the latent trajectory from
its TRUE posterior p(z | x, decoder) by HMC/NUTS (chains ride the decoder's
batch axis) or SMC (particles over frame latents), then decodes posterior
samples — yielding credible intervals over converted mcep alongside the
point conversion.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..infer.hmc import HMCConfig, hmc_sample_batch
from ..infer.logjoint import make_utterance_logjoint_batched
from ..infer.nuts import NUTSConfig, nuts_sample
from ..infer.smc import SMCConfig, make_decoder_ssm, smc_filter
from ..models.gru_vae import gru_rnn_apply
from ..vi.train import CycleVAEConfig, CycleVAEParams
from ..utils.hdf5 import read_hdf5, write_hdf5


def _decode_batch(params: CycleVAEParams, cfg: CycleVAEConfig,
                  code: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Decode a batch of latent trajectories: z (C, T, lat) -> (C, T, out)."""
    C = z.shape[0]
    s = params.decoder["scale_out"]
    y0 = jnp.broadcast_to((0.0 - s["mean"]) / s["scale"], (C, cfg.out_dim))
    code_b = jnp.broadcast_to(code, (C,) + code.shape)
    out, _, _ = gru_rnn_apply(params.decoder, cfg.dec_cfg,
                              jnp.concatenate([code_b, z], axis=-1), y0,
                              use_pallas=getattr(cfg, "use_pallas", False))
    return out


def posterior_convert_hmc(
    params: CycleVAEParams, cfg: CycleVAEConfig, feats: np.ndarray,
    enc_code_idx: int, dec_code_idx: int, key,
    n_chains: int = 8, hmc: HMCConfig = HMCConfig(
        step_size=0.02, n_leapfrog=8, n_warmup=100, n_samples=100),
    obs_scale: float = 50.0, n_predictive: int = 16,
) -> Dict[str, np.ndarray]:
    """HMC posterior over the latent trajectory of one utterance + posterior-
    predictive converted mcep.

    enc_code_idx: speaker whose decoder defines the likelihood (usually the
    source — the latent must explain the observed features through the
    source-code decoder); dec_code_idx: conversion target code.
    Returns posterior mean/std of z, posterior-predictive mean/std of the
    converted mcep, and sampler diagnostics.
    """
    T = feats.shape[0]
    feats_j = jnp.asarray(feats, jnp.float32)
    code_enc = np.zeros((T, cfg.n_spk), np.float32)
    code_enc[:, enc_code_idx] = 1
    code_dec = np.zeros((T, cfg.n_spk), np.float32)
    code_dec[:, dec_code_idx] = 1

    def run(params, feats_j, code_enc, key, z0):
        lj = make_utterance_logjoint_batched(params, cfg, feats_j,
                                             jnp.asarray(code_enc),
                                             obs_scale=obs_scale)
        return hmc_sample_batch(key, lj, z0, hmc)

    key, k_run = jax.random.split(key)
    z0 = jnp.zeros((n_chains, T, cfg.lat_dim))
    samples, info = jax.jit(run)(params, feats_j, jnp.asarray(code_enc),
                                 k_run, z0)
    # samples: (n_samples, C, T, lat)
    flat = samples.reshape(-1, T, cfg.lat_dim)
    z_mean = jnp.mean(flat, axis=0)
    z_std = jnp.std(flat, axis=0)

    # posterior predictive: decode the last n_predictive draws (round-robin
    # over chains) through the target-speaker code
    take = flat[-n_predictive:]
    pred = jax.jit(_decode_batch, static_argnums=(1,))(params, cfg,
                                                       jnp.asarray(code_dec),
                                                       take)
    return {
        "z_mean": np.asarray(z_mean),
        "z_std": np.asarray(z_std),
        "cv_mcep_mean": np.asarray(jnp.mean(pred, axis=0)),
        "cv_mcep_std": np.asarray(jnp.std(pred, axis=0)),
        "accept_prob": float(info["accept_prob"]),
        "step_size": float(info["step_size"]),
    }


def posterior_marginal_smc(
    params: CycleVAEParams, cfg: CycleVAEConfig, feats: np.ndarray,
    code_idx: int, key, n_particles: int = 256, obs_scale: float = 50.0,
) -> Dict[str, float]:
    """SMC estimate of log p(x | decoder, speaker code) over frame latents —
    a model-evidence score usable for speaker verification / model comparison
    (BASELINE.json config 4)."""
    T = feats.shape[0]
    code = np.zeros((T, cfg.n_spk), np.float32)
    code[:, code_idx] = 1
    init, prop, logw = make_decoder_ssm(
        params, cfg, jnp.asarray(feats, jnp.float32), jnp.asarray(code),
        obs_scale=obs_scale)
    scfg = SMCConfig(n_particles=n_particles)
    _, info = jax.jit(lambda k: smc_filter(k, T, init, prop, logw, scfg))(key)
    return {"log_marginal": float(info["log_marginal"]),
            "mean_ess": float(jnp.mean(info["ess"])),
            "resample_rate": float(jnp.mean(
                info["resampled"].astype(jnp.float32)))}


def run_infer_stage(params: CycleVAEParams, cfg: CycleVAEConfig,
                    feat_files, out_h5: str, key=None,
                    enc_code_idx: int = 0, dec_code_idx: int = 1,
                    **kwargs) -> Dict:
    """Run posterior conversion over a list of utterances; write posterior
    stats into ``out_h5`` keyed by utterance basename."""
    key = jax.random.PRNGKey(0) if key is None else key
    results = {}
    for f in feat_files:
        key, k = jax.random.split(key)
        feats = read_hdf5(f, "/feat_org_lf0").astype(np.float32)
        r = posterior_convert_hmc(params, cfg, feats, enc_code_idx,
                                  dec_code_idx, k, **kwargs)
        base = os.path.splitext(os.path.basename(f))[0]
        for k2 in ("z_mean", "z_std", "cv_mcep_mean", "cv_mcep_std"):
            write_hdf5(out_h5, f"/{base}/{k2}", r[k2])
        results[base] = {"accept_prob": r["accept_prob"]}
        logging.info("posterior inference %s: accept=%.2f", base,
                     r["accept_prob"])
    return results
