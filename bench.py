"""Benchmark: cyclic-CycleVAE training throughput on TPU.

Measures steady-state frames/s of the FULL flagship training step
(hl1_hu1024_ld32_ks3_ds2_cyc2: 2-cycle flow = 5 AR-GRU net applications per
segment, gradients, per-segment Adam) and compares against the reference-style
torch implementation measured on this machine (BASELINE_LOCAL.json; the
reference repo publishes no numbers — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cyclevae_tpu import enable_compilation_cache
    enable_compilation_cache()

    from cyclevae_tpu.vi.train import (
        CycleVAEConfig, TrainState, init_cyclevae, make_optimizer,
        make_train_step)

    cfg = CycleVAEConfig()  # flagship: hu=1024, lat=32, cyc=2
    B, seg, n_segs = 16, 80, 2
    T = seg * n_segs

    rng = np.random.default_rng(0)
    t = np.arange(T)[None, :, None]
    feats = (np.sin(t * 0.05 + np.arange(54)[None, None, :])
             + 0.1 * rng.normal(size=(B, T, 54))).astype(np.float32)
    batch = {
        "feats": jnp.asarray(feats),
        "src_code": jnp.asarray(np.tile([1., 0.], (B, T, 1)).astype(np.float32)),
        "trg_code": jnp.asarray(np.tile([0., 1.], (B, T, 1)).astype(np.float32)),
        "cv_excit": jnp.asarray(feats[..., :4]),
        "flens": jnp.asarray([T] * B, dtype=np.int32),
    }

    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    opt = make_optimizer(cfg, lr=1e-4)
    ts = TrainState(params, opt.init(params), jax.random.PRNGKey(1),
                    jnp.zeros((), jnp.int32))
    step = make_train_step(cfg, opt, seg, n_segs)

    # compile + warmup
    ts, m = step(ts, batch)
    _ = float(jnp.sum(m["loss"]))

    # The axon tunnel adds a fixed ~26 ms host<->device round trip per synced
    # call; chain K steps device-side (TrainState feeds forward) and sync once
    # so the measurement reflects device time, then subtract one round trip.
    K = 10
    t0 = time.time()
    for _i in range(K):
        ts, m = step(ts, batch)
    _ = float(jnp.sum(m["loss"]))  # single sync
    dt = max((time.time() - t0 - 0.026) / K, 1e-9)
    frames_per_sec = B * T / dt

    try:
        with open("BASELINE_LOCAL.json") as f:
            base = json.load(f)["torch_cpu_frames_per_sec"]
    except Exception:
        base = None
    vs = frames_per_sec / base if base else None

    print(json.dumps({
        "metric": "cyclevae_train_frames_per_sec",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
