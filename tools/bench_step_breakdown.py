"""Train-step time decomposition: forward / +backward / optimizer.

Completes the MFU accounting in bench.py with a WHERE-does-the-time-go
split for the flagship bf16 fused-Pallas config: per-segment forward loss,
value_and_grad, the Adam update alone, and the full scanned train step.
Timing: K chained calls with a data dependency, one sync, minus the fixed
~26 ms tunnel RTT (utils/profiling.py methodology).

Usage:  python tools/bench_step_breakdown.py [B] > breakdown.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B: int = 64, K: int = 10):
    from cyclevae_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from cyclevae_tpu.vi.train import (CycleVAEConfig, TrainState,
                                       init_cycle_state, init_cyclevae,
                                       make_optimizer, make_train_step,
                                       segment_loss)

    on_tpu = jax.devices()[0].platform == "tpu"
    # measure the per-sync round trip (sessions vary 0.1-26 ms; a stale
    # constant corrupts the subtraction both ways)
    from bench import measure_rtt
    rtt = measure_rtt(jax, jnp) if on_tpu else 0.0
    cfg = CycleVAEConfig(use_pallas=True, compute_dtype="bfloat16") \
        if on_tpu else CycleVAEConfig(hidden_units=64)
    S, n_segs = 80, 2
    T = S * n_segs

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
    seg = {k: batch[k][:, :S] for k in
           ("feats", "src_code", "trg_code", "cv_excit")}
    seg["mask"] = jnp.ones((B, S), jnp.float32)

    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    state = init_cycle_state(cfg, params, B)
    opt = make_optimizer(cfg, lr=1e-4)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)

    def timed(fn):
        """fn: carry scalar -> new scalar.  Each iteration's input depends on
        the previous output — identical-argument repeat calls can be deduped
        by the remote attachment, which reads as ~0 time."""
        c = fn(jnp.zeros(()))      # compile + warmup
        c.block_until_ready()
        t0 = time.time()
        for _ in range(K):
            c = fn(c)
        c.block_until_ready()
        return max((time.time() - t0 - rtt) / K, 1e-9)

    def chain_seg(c):
        return {**seg, "feats": seg["feats"] + c * 0.0}

    # 1. forward loss only (one segment)
    fwd = jax.jit(lambda c: segment_loss(params, cfg, key, chain_seg(c),
                                         state)[0] * 0.0)
    t_fwd = timed(fwd)

    # 2. forward + backward (one segment)
    def vag_loss(c):
        val, g = jax.value_and_grad(
            lambda p: segment_loss(p, cfg, key, chain_seg(c), state)[0]
        )(params)
        return (val + jnp.sum(g.encoder["out"]["b"])) * 0.0
    vag = jax.jit(vag_loss)
    t_vag = timed(vag)

    # 3. Adam update alone (on the gradient pytree)
    _, grads = jax.value_and_grad(
        lambda p: segment_loss(p, cfg, key, seg, state)[0])(params)

    def adam_only(c):
        g = jax.tree_util.tree_map(lambda x: x + c * 0.0, grads)
        upds, _ = opt.update(g, opt_state, params)
        return jnp.sum(upds.encoder["out"]["b"]) * 0.0
    t_adam = timed(jax.jit(adam_only))

    # 4. full scanned train step (n_segs segments + per-segment Adam)
    step = make_train_step(cfg, opt, S, n_segs)
    ts = TrainState(params, opt.init(params), jax.random.PRNGKey(1),
                    jnp.zeros((), jnp.int32))
    ts, m = step(ts, batch)
    float(jnp.sum(m["loss"]))
    t0 = time.time()
    for _ in range(K):
        ts, m = step(ts, batch)
    float(jnp.sum(m["loss"]))
    t_step = max((time.time() - t0 - rtt) / K, 1e-9)

    frames_seg = B * S
    out = {
        "metric": "train_step_breakdown_us_per_frame",
        "config": f"bf16_pallas_bsu{B}" if on_tpu else f"cpu_hu64_bsu{B}",
        "fwd_us": round(t_fwd / frames_seg * 1e6, 3),
        "fwd_bwd_us": round(t_vag / frames_seg * 1e6, 3),
        "adam_us": round(t_adam / frames_seg * 1e6, 3),
        "full_step_us": round(t_step / (B * T) * 1e6, 3),
        "bwd_over_fwd": round((t_vag - t_fwd) / t_fwd, 2),
        "frames_per_sec_full_step": round(B * T / t_step, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
