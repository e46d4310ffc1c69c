"""Device-side DSP ops must match the host C++ implementations."""

import numpy as np

import jax.numpy as jnp

from cyclevae_tpu.dsp import jax_ops, sptk

FFTL = 512


def test_sp2mc_device_matches_host():
    rng = np.random.default_rng(0)
    ps = (np.abs(np.fft.rfft(rng.normal(size=(3, 64)), FFTL, axis=-1)) + 1.0) ** 2
    host = sptk.sp2mc(ps, 24, 0.455)
    dev = np.asarray(jax_ops.sp2mc(jnp.asarray(ps), 24, 0.455))
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_mc2sp_device_matches_host():
    rng = np.random.default_rng(1)
    mc = rng.normal(size=(3, 25)) * 0.3
    host = sptk.mc2sp(mc, 0.455, FFTL)
    dev = np.asarray(jax_ops.mc2sp(jnp.asarray(mc), 0.455, FFTL))
    np.testing.assert_allclose(dev, host, rtol=1e-3)


def test_device_mcd_matches_host():
    from cyclevae_tpu.dsp import dtw
    rng = np.random.default_rng(2)
    x = rng.normal(size=(9, 5))
    y = rng.normal(size=(9, 5))
    mean_h, per_h = dtw.calc_mcd(x, y)
    mean_d, per_d = jax_ops.calc_mcd(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(mean_d), mean_h, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(per_d), per_h, rtol=1e-6)


def test_gv_postfilter_device_matches_host():
    from cyclevae_tpu.pipeline.decode import gv_postfilter as host_pf
    rng = np.random.default_rng(3)
    cv = rng.normal(size=(40, 10))
    gv_data = np.abs(rng.normal(size=9)) + 0.5
    gv_model = np.abs(rng.normal(size=9)) + 0.5
    host = host_pf(cv, gv_data, gv_model)
    dev = np.asarray(jax_ops.gv_postfilter(jnp.asarray(cv),
                                           jnp.asarray(gv_data),
                                           jnp.asarray(gv_model)))
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)


def test_mod_pow_device_close_to_host():
    from cyclevae_tpu.pipeline.features import mod_pow
    rng = np.random.default_rng(4)
    mc_ref = rng.normal(size=(6, 25)) * 0.2
    mc_cv = mc_ref + rng.normal(size=(6, 25)) * 0.05
    host = mod_pow(mc_cv, mc_ref, alpha=0.455, irlen=1024)
    dev = np.asarray(jax_ops.mod_pow_device(jnp.asarray(mc_cv),
                                            jnp.asarray(mc_ref), 0.455, 1024))
    # host uses irlen-truncated IR energy; spectral form agrees closely
    np.testing.assert_allclose(dev[:, 0], host[:, 0], atol=5e-3)
    np.testing.assert_allclose(dev[:, 1:], host[:, 1:], atol=1e-7)


def test_gv_log_rmse_matches_eval_epoch_numpy():
    from cyclevae_tpu.vi.elbo import gv_log_rmse
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 40, 9)).astype(np.float32) * 2 + 1
    gv_mean = np.abs(rng.normal(size=9)) + 0.5
    # numpy form used by the train_stage eval epoch
    var_x = np.var(x[0], axis=0)
    ref = float(np.mean(np.sqrt((np.log(var_x) - np.log(gv_mean)) ** 2)))
    ours = float(gv_log_rmse(jnp.asarray(x), jnp.asarray(gv_mean))[0])
    assert abs(ours - ref) < 1e-5
