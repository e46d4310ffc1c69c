"""Log-joint assembly for posterior inference over CycleVAE latents.

The new capability layer (BASELINE.json north star): the frozen decoder + a
standard-normal prior over the per-frame latent trajectory become a vectorized
log-joint log p(x, z) = log p(x | dec(z)) + log p(z), against which NUTS/HMC
(per-utterance latents) and SMC (frame-sequence latents) run.

Likelihood: the training objective's L1-MCD reconstruction term corresponds to
a Laplace observation model; we expose it as an energy with the same constant
(10/ln10)*sqrt(2) used in training (vi/elbo.py), so VI and MCMC target
consistent distributions.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.gru_vae import gru_rnn_apply
from ..vi.elbo import mcd_constant
from ..vi.train import CycleVAEConfig, CycleVAEParams

_SQRT2 = 1.4142135623730950488016887242097


def make_utterance_logjoint(
    params: CycleVAEParams,
    cfg: CycleVAEConfig,
    feats: jnp.ndarray,        # (T, in_dim) raw features of the utterance
    spk_code: jnp.ndarray,     # (T, n_spk) decoder conditioning code
    obs_scale: float = 1.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return logjoint(z) for z of shape (T, lat_dim).

    log p(x, z) = -beta * sum_t sum_d |mcep_td - dec(z)_td|  (Laplace lik.)
                  - 0.5 * sum z^2                           (N(0, I) prior)
    with beta = (10/ln10)*sqrt(2)/obs_scale matching the training MCD weight.
    """
    mcep = feats[..., cfg.stdim:]
    beta = mcd_constant() * _SQRT2 / obs_scale
    s = params.decoder["scale_out"]
    y0 = ((0.0 - s["mean"]) / s["scale"])[None]

    def logjoint(z: jnp.ndarray) -> jnp.ndarray:
        code_z = jnp.concatenate([spk_code, z], axis=-1)[None]
        out, _, _ = gru_rnn_apply(params.decoder, cfg.dec_cfg, code_z, y0,
                                  use_pallas=cfg.use_pallas,
                                  differentiable=True)
        lik = -beta * jnp.sum(jnp.abs(out[0] - mcep))
        prior = -0.5 * jnp.sum(z ** 2)
        return lik + prior

    return logjoint


def make_utterance_logjoint_batched(
    params: CycleVAEParams,
    cfg: CycleVAEConfig,
    feats: jnp.ndarray,        # (T, in_dim)
    spk_code: jnp.ndarray,     # (T, n_spk)
    obs_scale: float = 1.0,
):
    """Batched-chain log-joint: z (C, T, lat_dim) -> (C,) log p(x, z_c).

    Chains ride the decoder's BATCH axis — one big AR scan whose matmuls fill
    the MXU tile (C up to 128 rides free; see ops/pallas_gru notes) instead of
    vmapping C separate scans.  This is the fast path for multi-chain HMC on
    one chip.
    """
    mcep = feats[..., cfg.stdim:]
    beta = mcd_constant() * _SQRT2 / obs_scale
    s = params.decoder["scale_out"]

    def logjoint(z: jnp.ndarray) -> jnp.ndarray:
        C = z.shape[0]
        y0 = jnp.broadcast_to((0.0 - s["mean"]) / s["scale"],
                              (C, cfg.out_dim))
        code = jnp.broadcast_to(spk_code, (C,) + spk_code.shape)
        code_z = jnp.concatenate([code, z], axis=-1)
        out, _, _ = gru_rnn_apply(params.decoder, cfg.dec_cfg, code_z, y0,
                                  use_pallas=cfg.use_pallas,
                                  differentiable=True)
        lik = -beta * jnp.sum(jnp.abs(out - mcep), axis=(-2, -1))
        prior = -0.5 * jnp.sum(z ** 2, axis=(-2, -1))
        return lik + prior

    return logjoint


def make_gaussian_logjoint(mean: jnp.ndarray, cov_diag: jnp.ndarray):
    """Diagonal-Gaussian target for sampler correctness tests."""
    def logjoint(z):
        return -0.5 * jnp.sum((z - mean) ** 2 / cov_diag)
    return logjoint
