"""Perf-path guardrails: the fused-VJP kernel route and the bf16 compute
path must track the default f32 XLA-scan training numerics."""

import numpy as np

import jax
import jax.numpy as jnp

from cyclevae_tpu.vi.train import (
    CycleVAEConfig, TrainState, init_cyclevae, make_optimizer,
    make_train_step)


def _batch(B, T, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(T)[None, :, None]
    feats = (np.sin(t * 0.05 + np.arange(54)[None, None, :])
             + 0.1 * rng.normal(size=(B, T, 54))).astype(np.float32)
    return {
        "feats": jnp.asarray(feats),
        "src_code": jnp.asarray(np.tile([1., 0.], (B, T, 1)).astype(np.float32)),
        "trg_code": jnp.asarray(np.tile([0., 1.], (B, T, 1)).astype(np.float32)),
        "cv_excit": jnp.asarray(feats[..., :4]),
        "flens": jnp.asarray([T, T - 15], dtype=np.int32),
    }


def _run(cfg, n_steps=6, seed=0):
    params = init_cyclevae(jax.random.PRNGKey(seed), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    opt = make_optimizer(cfg, lr=1e-3)
    ts = TrainState(params, opt.init(params), jax.random.PRNGKey(1),
                    jnp.zeros((), jnp.int32))
    B, seg, n_segs = 2, 20, 2
    batch = _batch(B, seg * n_segs)
    step = make_train_step(cfg, opt, seg, n_segs)
    hist = []
    for _ in range(n_steps):
        ts, m = step(ts, batch)
        hist.append(float(jnp.sum(m["loss"])))
    return np.array(hist)


def test_fused_vjp_route_matches_scan_route():
    """use_pallas on CPU resolves to the XLA fused-VJP impl whose forward math
    equals the scan exactly; the whole training trajectory must agree."""
    base = _run(CycleVAEConfig(hidden_units=16, n_cyc=2, lat_dim=4))
    fused = _run(CycleVAEConfig(hidden_units=16, n_cyc=2, lat_dim=4,
                                use_pallas=True))
    np.testing.assert_allclose(fused, base, rtol=2e-4)


def test_bf16_compute_tracks_f32():
    """bf16 matmuls with f32 master weights: same qualitative trajectory,
    losses within a few percent of f32."""
    base = _run(CycleVAEConfig(hidden_units=16, n_cyc=2, lat_dim=4))
    bf16 = _run(CycleVAEConfig(hidden_units=16, n_cyc=2, lat_dim=4,
                               compute_dtype="bfloat16"))
    assert np.isfinite(bf16).all()
    np.testing.assert_allclose(bf16, base, rtol=0.05)
    # both decrease
    assert bf16[-1] < bf16[0]


def test_bf16_params_stay_f32():
    cfg = CycleVAEConfig(hidden_units=16, n_cyc=1, lat_dim=4,
                         compute_dtype="bfloat16")
    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    opt = make_optimizer(cfg, lr=1e-3)
    ts = TrainState(params, opt.init(params), jax.random.PRNGKey(1),
                    jnp.zeros((), jnp.int32))
    step = make_train_step(cfg, opt, 20, 2)
    ts, _ = step(ts, _batch(2, 40))
    for leaf in jax.tree_util.tree_leaves(ts.params):
        assert leaf.dtype == jnp.float32
