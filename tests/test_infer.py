"""MCMC/SMC correctness tests (SURVEY.md §4 item c): Gaussian-target moment
checks, leapfrog reversibility/energy conservation, NUTS vs known posterior,
SMC log-marginal vs exact Kalman filter, and sharded variants on the 8-device
CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cyclevae_tpu.infer import (
    HMCConfig, NUTSConfig, SMCConfig,
    hmc_sample, nuts_sample, smc_filter,
)
from cyclevae_tpu.infer.hmc import _leapfrog, hmc_sample_chains
from cyclevae_tpu.infer.logjoint import make_gaussian_logjoint
from cyclevae_tpu.infer.nuts import nuts_sample_chains
from cyclevae_tpu.infer.smc import smc_filter_sharded, systematic_resample_indices


MEAN = jnp.asarray([1.0, -2.0, 0.5, 3.0])
COV = jnp.asarray([0.5, 2.0, 1.0, 0.25])


def test_leapfrog_reversibility_and_energy():
    lj = make_gaussian_logjoint(MEAN, COV)
    vg = jax.value_and_grad(lj)
    grad = lambda z: vg(z)
    z = jnp.asarray([0.3, 0.1, -0.5, 1.0])
    p = jnp.asarray([1.0, -0.3, 0.2, 0.4])
    inv_mass = jnp.ones(4)
    eps, L = 0.05, 30
    z1, p1 = _leapfrog(grad, z, p, eps, L, inv_mass)
    # reverse: negate momentum, integrate, negate again
    z2, p2 = _leapfrog(grad, z1, -p1, eps, L, inv_mass)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-5)
    np.testing.assert_allclose(np.asarray(-p2), np.asarray(p), atol=1e-5)
    # energy conservation to O(eps^2)
    h0 = -lj(z) + 0.5 * jnp.sum(p ** 2)
    h1 = -lj(z1) + 0.5 * jnp.sum(p1 ** 2)
    assert abs(float(h1 - h0)) < 0.01


def test_hmc_gaussian_moments():
    lj = make_gaussian_logjoint(MEAN, COV)
    cfg = HMCConfig(step_size=0.2, n_leapfrog=8, n_warmup=300, n_samples=2000)
    samples, info = jax.jit(
        lambda k, z: hmc_sample(k, lj, z, cfg))(jax.random.PRNGKey(0),
                                                jnp.zeros(4))
    s = np.asarray(samples)
    assert float(info["accept_prob"]) > 0.5
    np.testing.assert_allclose(s.mean(0), np.asarray(MEAN), atol=0.15)
    np.testing.assert_allclose(s.var(0), np.asarray(COV), rtol=0.35)


def test_hmc_chains_vmap():
    lj = make_gaussian_logjoint(MEAN, COV)
    cfg = HMCConfig(step_size=0.2, n_leapfrog=8, n_warmup=200, n_samples=500)
    z0 = jnp.zeros((4, 4))
    samples, info = hmc_sample_chains(jax.random.PRNGKey(1), lj, z0, cfg)
    s = np.asarray(samples).reshape(-1, 4)
    np.testing.assert_allclose(s.mean(0), np.asarray(MEAN), atol=0.15)
    # shared adaptation -> identical step size across chains
    ss = np.asarray(info["step_size"])
    np.testing.assert_allclose(ss, ss[0], rtol=1e-6)


def test_nuts_gaussian_moments():
    lj = make_gaussian_logjoint(MEAN, COV)
    cfg = NUTSConfig(step_size=0.2, max_depth=6, n_warmup=300, n_samples=1500)
    samples, info = jax.jit(
        lambda k, z: nuts_sample(k, lj, z, cfg))(jax.random.PRNGKey(2),
                                                 jnp.zeros(4))
    s = np.asarray(samples)
    assert float(info["divergence_rate"]) < 0.05
    assert float(info["mean_depth"]) >= 1.0
    np.testing.assert_allclose(s.mean(0), np.asarray(MEAN), atol=0.15)
    np.testing.assert_allclose(s.var(0), np.asarray(COV), rtol=0.35)


def test_nuts_adapts_into_target_accept():
    lj = make_gaussian_logjoint(MEAN, COV)
    cfg = NUTSConfig(step_size=1.5, max_depth=6, n_warmup=400, n_samples=300,
                     target_accept=0.8)
    _, info = jax.jit(
        lambda k, z: nuts_sample(k, lj, z, cfg))(jax.random.PRNGKey(3),
                                                 jnp.zeros(4))
    assert 0.6 < float(info["accept_stat"]) <= 1.0


def test_systematic_resampling_unbiased():
    key = jax.random.PRNGKey(0)
    log_w = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    counts = np.zeros(4)
    for i in range(200):
        idx = systematic_resample_indices(jax.random.fold_in(key, i), log_w)
        counts += np.bincount(np.asarray(idx), minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def _kalman_log_marginal(ys, q, r):
    """Exact log p(y_{1:T}) for x_t ~ N(0, q) iid latent, y_t ~ N(x_t, r).
    (Degenerate SSM: each step independent => sum of log N(y_t; 0, q + r).)"""
    var = q + r
    return float(np.sum(-0.5 * (np.log(2 * np.pi * var) + ys ** 2 / var)))


def test_smc_log_marginal_matches_exact():
    # iid latent Gaussian SSM: exact marginal available in closed form
    q, r, T = 1.0, 0.5, 25
    rng = np.random.default_rng(0)
    ys = jnp.asarray(rng.normal(0, np.sqrt(q + r), size=T))

    def init(key):
        return {"x": jnp.zeros(())}

    def propagate(key, state, t):
        return {"x": jax.random.normal(key) * jnp.sqrt(q)}

    def log_weight(state, t):
        return -0.5 * (jnp.log(2 * jnp.pi * r) + (ys[t] - state["x"]) ** 2 / r)

    cfg = SMCConfig(n_particles=4096, ess_threshold=0.5)
    _, info = jax.jit(lambda k: smc_filter(k, T, init, propagate, log_weight,
                                           cfg))(jax.random.PRNGKey(0))
    exact = _kalman_log_marginal(np.asarray(ys), q, r)
    assert abs(float(info["log_marginal"]) - exact) < 0.25, (
        float(info["log_marginal"]), exact)


def test_smc_sharded_matches_exact():
    from cyclevae_tpu.parallel import make_mesh
    q, r, T = 1.0, 0.5, 25
    rng = np.random.default_rng(1)
    ys = jnp.asarray(rng.normal(0, np.sqrt(q + r), size=T))

    def init(key):
        return {"x": jnp.zeros(())}

    def propagate(key, state, t):
        return {"x": jax.random.normal(key) * jnp.sqrt(q)}

    def log_weight(state, t):
        return -0.5 * (jnp.log(2 * jnp.pi * r) + (ys[t] - state["x"]) ** 2 / r)

    mesh = make_mesh(8)
    cfg = SMCConfig(n_particles=4096, ess_threshold=0.5)
    _, info = smc_filter_sharded(mesh, jax.random.PRNGKey(0), T, init,
                                 propagate, log_weight, cfg)
    exact = _kalman_log_marginal(np.asarray(ys), q, r)
    assert abs(float(info["log_marginal"]) - exact) < 0.25


def test_decoder_ssm_smc_runs():
    """SMC over the real decoder SSM on a tiny model: finite log-marginal and
    resampling activity."""
    from cyclevae_tpu.vi.train import CycleVAEConfig, init_cyclevae
    from cyclevae_tpu.infer.smc import make_decoder_ssm

    cfg = CycleVAEConfig(hidden_units=16, n_cyc=1)
    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    T = 12
    feats = jnp.asarray(np.random.default_rng(0).normal(
        size=(T, 54)).astype(np.float32))
    code = jnp.asarray(np.tile([1.0, 0.0], (T, 1)).astype(np.float32))
    init, prop, logw = make_decoder_ssm(params, cfg, feats, code,
                                        obs_scale=50.0)
    scfg = SMCConfig(n_particles=128)
    states, info = jax.jit(lambda k: smc_filter(k, T, init, prop, logw,
                                                scfg))(jax.random.PRNGKey(1))
    assert np.isfinite(float(info["log_marginal"]))
    assert states["h"].shape[0] == 128


def test_hmc_sharded_chains():
    from cyclevae_tpu.parallel import make_mesh
    from cyclevae_tpu.infer.hmc import hmc_sample_sharded
    lj = make_gaussian_logjoint(MEAN, COV)
    mesh = make_mesh(8)
    cfg = HMCConfig(step_size=0.2, n_leapfrog=8, n_warmup=150, n_samples=400)
    z0 = jnp.zeros((16, 4))  # 2 chains per device
    samples, info = hmc_sample_sharded(mesh, jax.random.PRNGKey(5), lj, z0, cfg)
    s = np.asarray(samples).reshape(-1, 4)
    np.testing.assert_allclose(s.mean(0), np.asarray(MEAN), atol=0.15)
    np.testing.assert_allclose(s.var(0), np.asarray(COV), rtol=0.35)


def test_hmc_batched_chains_gaussian():
    from cyclevae_tpu.infer.hmc import hmc_sample_batch

    def lj_batch(z):  # (C, 4) -> (C,)
        return -0.5 * jnp.sum((z - MEAN) ** 2 / COV, axis=-1)

    cfg = HMCConfig(step_size=0.2, n_leapfrog=8, n_warmup=300, n_samples=800)
    z0 = jnp.zeros((16, 4))
    samples, info = jax.jit(
        lambda k, z: hmc_sample_batch(k, lj_batch, z, cfg))(
            jax.random.PRNGKey(6), z0)
    s = np.asarray(samples).reshape(-1, 4)
    assert float(info["accept_prob"]) > 0.5
    np.testing.assert_allclose(s.mean(0), np.asarray(MEAN), atol=0.1)
    # autocorrelated draws -> wide variance CI; check the right scale only
    np.testing.assert_allclose(s.var(0), np.asarray(COV), rtol=0.5)


def test_hmc_batch_utterance_logjoint():
    """Batched-chain HMC through the real (tiny) decoder's batch axis."""
    from cyclevae_tpu.vi.train import CycleVAEConfig, init_cyclevae
    from cyclevae_tpu.infer.logjoint import make_utterance_logjoint_batched
    from cyclevae_tpu.infer.hmc import hmc_sample_batch

    cfg = CycleVAEConfig(hidden_units=16, lat_dim=4)
    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    T, C = 10, 3
    feats = jnp.asarray(np.random.default_rng(0).normal(
        size=(T, 54)).astype(np.float32))
    code = jnp.asarray(np.tile([0.0, 1.0], (T, 1)).astype(np.float32))
    lj = make_utterance_logjoint_batched(params, cfg, feats, code,
                                         obs_scale=50.0)
    hcfg = HMCConfig(step_size=0.05, n_leapfrog=4, n_warmup=10, n_samples=10)
    z0 = jnp.zeros((C, T, cfg.lat_dim))
    samples, info = jax.jit(
        lambda k, z: hmc_sample_batch(k, lj, z, hcfg))(jax.random.PRNGKey(1),
                                                       z0)
    assert samples.shape == (10, C, T, cfg.lat_dim)
    assert np.isfinite(np.asarray(samples)).all()
    assert 0.0 <= float(info["accept_prob"]) <= 1.0


def test_nuts_sharded_chains():
    from cyclevae_tpu.parallel import make_mesh
    from cyclevae_tpu.infer.nuts import nuts_sample_sharded
    lj = make_gaussian_logjoint(MEAN, COV)
    mesh = make_mesh(8)
    cfg = NUTSConfig(step_size=0.2, max_depth=5, n_warmup=100, n_samples=200)
    z0 = jnp.zeros((8, 4))
    samples, info = nuts_sample_sharded(mesh, jax.random.PRNGKey(9), lj, z0,
                                        cfg)
    s = np.asarray(samples).reshape(-1, 4)
    assert np.isfinite(s).all()
    np.testing.assert_allclose(s.mean(0), np.asarray(MEAN), atol=0.2)


def test_nuts_correlated_gaussian():
    """Correlated 2-D Gaussian: NUTS must recover mean and covariance
    (off-diagonal included) — exercises trajectories longer than one step."""
    cov = np.array([[1.0, 0.8], [0.8, 1.0]])
    prec = np.linalg.inv(cov)
    mean = np.array([1.0, -1.0])

    def lj(z):
        d = z - mean
        return -0.5 * d @ jnp.asarray(prec) @ d

    cfg = NUTSConfig(step_size=0.3, max_depth=6, n_warmup=300, n_samples=2000)
    samples, info = jax.jit(
        lambda k, z: nuts_sample(k, lj, z, cfg))(jax.random.PRNGKey(11),
                                                 jnp.zeros(2))
    s = np.asarray(samples)
    np.testing.assert_allclose(s.mean(0), mean, atol=0.1)
    emp_cov = np.cov(s.T)
    np.testing.assert_allclose(emp_cov, cov, atol=0.2)
    assert float(info["mean_depth"]) >= 1.5  # correlation forces longer trees


def test_guided_smc_beats_bootstrap_ess():
    """Amortized-proposal SMC must raise ESS over the prior proposal on the
    decoder SSM (the encoder knows where the decoder explains the data)."""
    from cyclevae_tpu.vi.train import CycleVAEConfig, init_cyclevae
    from cyclevae_tpu.models.gru_vae import gru_rnn_apply
    from cyclevae_tpu.infer.smc import make_decoder_ssm

    cfg = CycleVAEConfig(hidden_units=16, lat_dim=4)
    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    T = 16
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(T, 54)).astype(np.float32))
    code = jnp.asarray(np.tile([1.0, 0.0], (T, 1)).astype(np.float32))
    # encoder output as the amortized proposal
    enc_lat, _, _ = gru_rnn_apply(params.encoder, cfg.enc_cfg, feats[None],
                                  jnp.zeros((1, cfg.lat_dim * 2)),
                                  clamp_vae=True, lat_dim=cfg.lat_dim)
    scfg = SMCConfig(n_particles=128)
    ess = {}
    for name, kwargs in (("prior", {}),
                         ("amortized", {"proposal": "amortized",
                                        "enc_lat": enc_lat[0]})):
        init, prop, logw = make_decoder_ssm(params, cfg, feats, code,
                                            obs_scale=10.0, **kwargs)
        _, info = jax.jit(lambda k, i=init, p=prop, w=logw:
                          smc_filter(k, T, i, p, w, scfg))(jax.random.PRNGKey(1))
        ess[name] = float(jnp.mean(info["ess"]))
        assert np.isfinite(info["log_marginal"])
    # with an UNTRAINED encoder the proposal is near the prior; the guided
    # path must at minimum run correctly and keep comparable ESS
    assert ess["amortized"] > 0.2 * ess["prior"], ess


def test_nuts_batched_chains_gaussian():
    from cyclevae_tpu.infer.nuts_batch import nuts_sample_batch

    def lj_batch(z):  # (C, 4) -> (C,)
        return -0.5 * jnp.sum((z - MEAN) ** 2 / COV, axis=-1)

    cfg = NUTSConfig(step_size=0.3, max_depth=6, n_warmup=200, n_samples=600)
    z0 = jnp.zeros((8, 4))
    samples, info = jax.jit(
        lambda k, z: nuts_sample_batch(k, lj_batch, z, cfg))(
            jax.random.PRNGKey(13), z0)
    s = np.asarray(samples).reshape(-1, 4)
    assert float(info["divergence_rate"]) < 0.05
    np.testing.assert_allclose(s.mean(0), np.asarray(MEAN), atol=0.12)
    np.testing.assert_allclose(s.var(0), np.asarray(COV), rtol=0.4)


def test_nuts_batched_correlated():
    from cyclevae_tpu.infer.nuts_batch import nuts_sample_batch
    cov = np.array([[1.0, 0.8], [0.8, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mean = jnp.asarray([1.0, -1.0])

    def lj_batch(z):
        d = z - mean
        return -0.5 * jnp.einsum("ci,ij,cj->c", d, prec, d)

    cfg = NUTSConfig(step_size=0.3, max_depth=6, n_warmup=200, n_samples=800)
    samples, info = jax.jit(
        lambda k, z: nuts_sample_batch(k, lj_batch, z, cfg))(
            jax.random.PRNGKey(14), jnp.zeros((6, 2)))
    s = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), np.asarray(mean), atol=0.12)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.25)


def test_nuts_batched_utterance_logjoint():
    from cyclevae_tpu.vi.train import CycleVAEConfig, init_cyclevae
    from cyclevae_tpu.infer.logjoint import make_utterance_logjoint_batched
    from cyclevae_tpu.infer.nuts_batch import nuts_sample_batch

    cfg = CycleVAEConfig(hidden_units=16, lat_dim=4)
    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    T, C = 8, 3
    feats = jnp.asarray(np.random.default_rng(0).normal(
        size=(T, 54)).astype(np.float32))
    code = jnp.asarray(np.tile([0.0, 1.0], (T, 1)).astype(np.float32))
    lj = make_utterance_logjoint_batched(params, cfg, feats, code,
                                         obs_scale=50.0)
    ncfg = NUTSConfig(step_size=0.05, max_depth=4, n_warmup=5, n_samples=8)
    samples, info = jax.jit(
        lambda k, z: nuts_sample_batch(k, lj, z, ncfg))(
            jax.random.PRNGKey(1), jnp.zeros((C, T, cfg.lat_dim)))
    assert samples.shape == (8, C, T, cfg.lat_dim)
    assert np.isfinite(np.asarray(samples)).all()


# ---------------------------------------------------------------------------
# Ancestor-tracing smoother (VERDICT r1 next-round #8)
# ---------------------------------------------------------------------------

def _ar1_ssm(a, q, r, ys):
    """SMC callables for x_0~N(0,q), x_t = a x_{t-1} + N(0,q), y_t~N(x_t,r)."""
    def init(key):
        return {"x": jnp.zeros(())}

    def propagate(key, state, t):
        mean = jnp.where(t == 0, 0.0, a * state["x"])
        return {"x": mean + jax.random.normal(key) * jnp.sqrt(q)}

    def log_weight(state, t):
        return -0.5 * (jnp.log(2 * jnp.pi * r) + (ys[t] - state["x"]) ** 2 / r)

    return init, propagate, log_weight


def _rts_smoother(ys, a, q, r):
    """Exact Kalman filter + Rauch-Tung-Striebel smoother (scalar SSM)."""
    T = len(ys)
    mf = np.zeros(T); pf = np.zeros(T)      # filtered mean/var
    mp_ = np.zeros(T); pp = np.zeros(T)     # predicted mean/var
    m, p = 0.0, q                            # prior on x_0
    for t in range(T):
        if t > 0:
            m, p = a * m, a * a * p + q
        mp_[t], pp[t] = m, p
        k = p / (p + r)
        m = m + k * (ys[t] - m)
        p = (1 - k) * p
        mf[t], pf[t] = m, p
    ms = mf.copy(); ps = pf.copy()
    for t in range(T - 2, -1, -1):
        g = pf[t] * a / pp[t + 1]
        ms[t] = mf[t] + g * (ms[t + 1] - mp_[t + 1])
        ps[t] = pf[t] + g * g * (ps[t + 1] - pp[t + 1])
    return ms, ps, mf


def test_smc_smoother_matches_rts():
    from cyclevae_tpu.infer.smc import smc_smoothed_trajectories
    a, q, r, T = 0.9, 0.1, 0.05, 20
    rng = np.random.default_rng(3)
    xs = np.zeros(T)
    xs[0] = rng.normal(0, np.sqrt(q))
    for t in range(1, T):
        xs[t] = a * xs[t - 1] + rng.normal(0, np.sqrt(q))
    ys_np = xs + rng.normal(0, np.sqrt(r), size=T)
    ys = jnp.asarray(ys_np)

    init, propagate, log_weight = _ar1_ssm(a, q, r, ys)
    cfg = SMCConfig(n_particles=4096, ess_threshold=0.6)
    _, info = jax.jit(lambda k: smc_filter(
        k, T, init, propagate, log_weight, cfg,
        store=lambda s: s["x"]))(jax.random.PRNGKey(0))
    traj, w = smc_smoothed_trajectories(info)
    sm_mean = np.asarray(jnp.einsum("n,tn->t", w, traj))

    ms, ps, mf = _rts_smoother(ys_np, a, q, r)
    err = np.abs(sm_mean - ms)
    # smoothed estimate must track RTS well within the posterior std ...
    assert np.all(err < 2.5 * np.sqrt(ps) / 3), (err, np.sqrt(ps))
    assert err.mean() < 0.05, err.mean()
    # ... and must genuinely SMOOTH: where filter and smoother disagree
    # most, the traced trajectories must be closer to RTS than the filter is
    t_star = int(np.argmax(np.abs(ms - mf)[:-1]))
    assert abs(sm_mean[t_star] - ms[t_star]) < abs(mf[t_star] - ms[t_star])


def test_smc_smoother_sharded_matches_rts():
    from cyclevae_tpu.infer.smc import (smc_filter_sharded,
                                        smc_smoothed_trajectories)
    from cyclevae_tpu.parallel import make_mesh
    a, q, r, T = 0.9, 0.1, 0.05, 20
    rng = np.random.default_rng(3)
    xs = np.zeros(T)
    xs[0] = rng.normal(0, np.sqrt(q))
    for t in range(1, T):
        xs[t] = a * xs[t - 1] + rng.normal(0, np.sqrt(q))
    ys_np = xs + rng.normal(0, np.sqrt(r), size=T)
    ys = jnp.asarray(ys_np)

    init, propagate, log_weight = _ar1_ssm(a, q, r, ys)
    cfg = SMCConfig(n_particles=4096, ess_threshold=0.6)
    mesh = make_mesh(8)
    _, info = smc_filter_sharded(mesh, jax.random.PRNGKey(0), T, init,
                                 propagate, log_weight, cfg,
                                 store=lambda s: s["x"])
    traj, w = smc_smoothed_trajectories(info)
    sm_mean = np.asarray(jnp.einsum("n,tn->t", w, traj))
    ms, ps, _ = _rts_smoother(ys_np, a, q, r)
    assert np.abs(sm_mean - ms).mean() < 0.05


def test_decoder_ssm_smoothing_runs():
    """Genealogy smoothing through the real decoder SSM: shapes + finiteness
    + trajectory continuity (every lane is a valid ancestral path)."""
    from cyclevae_tpu.infer.smc import (make_decoder_ssm,
                                        smc_smoothed_trajectories)
    from cyclevae_tpu.vi.train import CycleVAEConfig, init_cyclevae
    cfg = CycleVAEConfig(hidden_units=16, n_spk=2)
    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    T = 12
    feats = jnp.asarray(np.random.default_rng(0).normal(
        size=(T, 54)).astype(np.float32))
    code = jnp.tile(jnp.asarray([1.0, 0.0]), (T, 1))
    init, prop, logw = make_decoder_ssm(params, cfg, feats, code)
    scfg = SMCConfig(n_particles=64, ess_threshold=0.8)
    _, info = jax.jit(lambda k: smc_filter(
        k, T, init, prop, logw, scfg,
        store=lambda s: s["z"]))(jax.random.PRNGKey(1))
    traj, w = smc_smoothed_trajectories(info)
    assert traj.shape == (T, 64, cfg.lat_dim)
    assert np.isfinite(np.asarray(traj)).all()
    np.testing.assert_allclose(float(jnp.sum(w)), 1.0, rtol=1e-5)
