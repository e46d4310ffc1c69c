"""Sharded-training correctness on the virtual 8-device CPU mesh:
DP-sharded step must match the single-device step bitwise-closely."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cyclevae_tpu.parallel import make_mesh, make_sharded_train_step, replicate, shard_batch
from cyclevae_tpu.vi.train import (
    CycleVAEConfig,
    TrainState,
    init_cyclevae,
    make_optimizer,
    make_train_step,
)


def _make_batch(B, T, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(T)[None, :, None]
    feats = (np.sin(t * 0.05 + np.arange(54)[None, None, :])
             + 0.1 * rng.normal(size=(B, T, 54))).astype(np.float32)
    return {
        "feats": jnp.asarray(feats),
        "src_code": jnp.asarray(np.tile([1., 0.], (B, T, 1)).astype(np.float32)),
        "trg_code": jnp.asarray(np.tile([0., 1.], (B, T, 1)).astype(np.float32)),
        "cv_excit": jnp.asarray(feats[..., :4]),
        "flens": jnp.asarray([T] * B, dtype=np.int32),
    }


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device():
    cfg = CycleVAEConfig(hidden_units=32, n_cyc=1, do_prob=0.0)
    B, seg, n_segs = 8, 20, 2
    T = seg * n_segs
    batch = _make_batch(B, T)
    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    opt = make_optimizer(cfg, lr=1e-4)

    # single device
    ts1 = TrainState(params, opt.init(params), jax.random.PRNGKey(7),
                     jnp.zeros((), jnp.int32))
    step1 = make_train_step(cfg, opt, seg, n_segs)
    ts1b, m1 = step1(ts1, batch)

    # 8-device dp mesh
    mesh = make_mesh(8)
    params2 = init_cyclevae(jax.random.PRNGKey(0), cfg,
                            np.zeros(54, np.float32), np.ones(54, np.float32))
    ts2 = TrainState(replicate(mesh, params2),
                     replicate(mesh, opt.init(params2)),
                     replicate(mesh, jax.random.PRNGKey(7)),
                     replicate(mesh, jnp.zeros((), jnp.int32)))
    step8 = make_sharded_train_step(cfg, opt, seg, n_segs, mesh)
    with mesh:
        ts2b, m2 = step8(ts2, shard_batch(mesh, batch))

    np.testing.assert_allclose(np.asarray(m2["loss"]), np.asarray(m1["loss"]),
                               rtol=2e-4)
    # updated parameters agree across the two paths
    w1 = np.asarray(ts1b.params.encoder["gru"][0]["w_hh"])
    w2 = np.asarray(ts2b.params.encoder["gru"][0]["w_hh"])
    np.testing.assert_allclose(w2, w1, atol=2e-5)


def test_sharded_step_with_fused_vjp_path():
    """The custom-VJP fused path (cfg.use_pallas; XLA fallback off-TPU) must
    compose with the DP-sharded pjit step — pins pjit compatibility of
    jax.custom_vjp inside the scanned train step."""
    cfg = CycleVAEConfig(hidden_units=32, n_cyc=1, do_prob=0.0,
                         use_pallas=True)
    B, seg, n_segs = 8, 20, 2
    batch = _make_batch(B, seg * n_segs)
    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    opt = make_optimizer(cfg, lr=1e-4)

    ts1 = TrainState(params, opt.init(params), jax.random.PRNGKey(7),
                     jnp.zeros((), jnp.int32))
    ts1b, m1 = make_train_step(cfg, opt, seg, n_segs)(ts1, batch)

    mesh = make_mesh(8)
    params2 = init_cyclevae(jax.random.PRNGKey(0), cfg,
                            np.zeros(54, np.float32), np.ones(54, np.float32))
    ts2 = TrainState(replicate(mesh, params2),
                     replicate(mesh, opt.init(params2)),
                     replicate(mesh, jax.random.PRNGKey(7)),
                     replicate(mesh, jnp.zeros((), jnp.int32)))
    step8 = make_sharded_train_step(cfg, opt, seg, n_segs, mesh)
    with mesh:
        ts2b, m2 = step8(ts2, shard_batch(mesh, batch))
    np.testing.assert_allclose(np.asarray(m2["loss"]), np.asarray(m1["loss"]),
                               rtol=2e-4)


def test_sharded_batch_placement():
    mesh = make_mesh(8)
    batch = _make_batch(8, 16)
    sb = shard_batch(mesh, batch)
    shard_shapes = [s.data.shape for s in sb["feats"].addressable_shards]
    assert all(s[0] == 1 for s in shard_shapes)
    assert len(shard_shapes) == 8


def test_sharded_step_enforces_dp_on_uncommitted_batch():
    """make_sharded_train_step constrains shardings in-graph: a caller that
    passes a host numpy batch (no shard_batch) must still end up dp-sharded,
    not silently replicated."""
    cfg = CycleVAEConfig(hidden_units=32, n_cyc=1, do_prob=0.0)
    B, seg, n_segs = 8, 20, 2
    batch = _make_batch(B, seg * n_segs)  # host numpy, uncommitted
    opt = make_optimizer(cfg, lr=1e-4)

    # single-device reference first (the sharded step donates its TrainState,
    # and replicate() on the CPU mesh aliases the device-0 buffers)
    params1 = init_cyclevae(jax.random.PRNGKey(0), cfg,
                            np.zeros(54, np.float32), np.ones(54, np.float32))
    ts1 = TrainState(params1, opt.init(params1), jax.random.PRNGKey(7),
                     jnp.zeros((), jnp.int32))
    _, m1 = make_train_step(cfg, opt, seg, n_segs)(ts1, batch)

    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    mesh = make_mesh(8)
    ts = TrainState(replicate(mesh, params), replicate(mesh, opt.init(params)),
                    replicate(mesh, jax.random.PRNGKey(7)),
                    replicate(mesh, jnp.zeros((), jnp.int32)))
    step = make_sharded_train_step(cfg, opt, seg, n_segs, mesh)
    with mesh:
        # compiled step reduces gradients across devices (i.e. the batch is
        # really dp-sharded, not replicated) — check before executing: the
        # step donates ts
        txt = step.lower(ts, batch).compile().as_text()
        assert "all-reduce" in txt
        _, m = step(ts, batch)

    np.testing.assert_allclose(np.asarray(m["loss"]), np.asarray(m1["loss"]),
                               rtol=2e-4)
