"""Posterior-inference stage: HMC posterior conversion + SMC evidence."""

import numpy as np

import jax

from cyclevae_tpu.infer.hmc import HMCConfig
from cyclevae_tpu.pipeline.infer_stage import (
    posterior_convert_hmc,
    posterior_marginal_smc,
)
from cyclevae_tpu.vi.train import CycleVAEConfig, init_cyclevae


def _setup():
    cfg = CycleVAEConfig(hidden_units=16, lat_dim=4)
    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    feats = np.random.default_rng(0).normal(size=(12, 54)).astype(np.float32)
    return cfg, params, feats


def test_posterior_convert_hmc_shapes_and_diagnostics():
    cfg, params, feats = _setup()
    r = posterior_convert_hmc(
        params, cfg, feats, 0, 1, jax.random.PRNGKey(1), n_chains=2,
        hmc=HMCConfig(step_size=0.05, n_leapfrog=4, n_warmup=5, n_samples=10),
        n_predictive=4)
    assert r["z_mean"].shape == (12, 4)
    assert r["cv_mcep_mean"].shape == (12, 50)
    assert np.all(r["cv_mcep_std"] >= 0)
    assert 0.0 <= r["accept_prob"] <= 1.0
    assert np.isfinite(r["cv_mcep_mean"]).all()


def test_posterior_marginal_smc_evidence():
    cfg, params, feats = _setup()
    m = posterior_marginal_smc(params, cfg, feats, 0, jax.random.PRNGKey(2),
                               n_particles=64)
    assert np.isfinite(m["log_marginal"])
    assert 0.0 < m["mean_ess"] <= 64.0
