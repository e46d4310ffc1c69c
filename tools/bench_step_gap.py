"""Empirical decomposition of the train-step overhead outside fwd+bwd+Adam.

VERDICT r2 #3: the full 2-segment scanned step ran 5.18 us/frame while
fwd+bwd (3.59) + Adam (0.15) account for 3.74 — ~1.4 us/frame of segment-
scan plumbing.  This times ABLATED variants of build_step_fn to attribute
the gap, all at the shipped perf config (bf16 fused-Pallas, B=64, S=80,
n_segs=2):

  full        — the library step (lax.scan, where-gated Adam on seg_valid)
  nogate      — keep() where-gating removed (params/opt not masked)
  condgate    — lax.cond(seg_valid, update, identity) instead of the
                double where over params+opt pytrees
  nometrics   — loss only, no per-cycle metric reductions
  unrolled    — python loop over segments instead of lax.scan
  unroll_nogate — both

Each variant is timed with the K-chained-call methodology (bench.py).
Prints a JSON dict of us/frame per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(B: int = 64, K: int = 10):
    from cyclevae_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from cyclevae_tpu.vi.train import (CycleVAEConfig, TrainState,
                                       init_cycle_state, init_cyclevae,
                                       make_optimizer, segment_loss)

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

    params0 = init_cyclevae(jax.random.PRNGKey(0), cfg,
                            np.zeros(54, np.float32), np.ones(54, np.float32))
    # host master copy: each variant's TrainState is donated into its step,
    # so device buffers from a previous variant are deleted
    params_host = jax.tree_util.tree_map(np.asarray, params0)
    opt = make_optimizer(cfg, lr=1e-4)

    def make_variant(gate="where", metrics=True, unroll=False):
        def loss_fn(p, k, seg, st):
            loss, (new_st, mets) = segment_loss(p, cfg, k, seg, st, True)
            if not metrics:
                mets = {"loss": loss}
            return loss, (new_st, mets)

        def seg_update(params, opt_state, cyc_state, rng, seg):
            rng, k_seg = jax.random.split(rng)
            cyc_state = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                               cyc_state)
            (loss, (new_cyc, mets)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, k_seg, seg, cyc_state)
            seg_valid = jnp.sum(seg["mask"]) > 0
            if gate == "where":
                updates, new_opt = opt.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                keep = lambda new, old: jax.tree_util.tree_map(
                    lambda a, b: jnp.where(seg_valid, a, b), new, old)
                new_params = keep(new_params, params)
                new_opt = keep(new_opt, opt_state)
            elif gate == "cond":
                def do_upd(args):
                    p, o = args
                    updates, no = opt.update(grads, o, p)
                    return optax.apply_updates(p, updates), no
                new_params, new_opt = jax.lax.cond(
                    seg_valid, do_upd, lambda a: a, (params, opt_state))
            else:  # none
                updates, new_opt = opt.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
            mets["seg_valid"] = seg_valid.astype(jnp.float32)
            return new_params, new_opt, new_cyc, rng, mets

        def step_fn(ts: TrainState, batch):
            Bl = batch["feats"].shape[0]
            frame_idx = jnp.arange(T)
            mask_full = (frame_idx[None, :] < batch["flens"][:, None]
                         ).astype(batch["feats"].dtype)

            def to_segs(x):
                x = x[:, :T]
                return x.reshape(x.shape[0], n_segs, S,
                                 *x.shape[2:]).swapaxes(0, 1)

            segs = {"feats": to_segs(batch["feats"]),
                    "src_code": to_segs(batch["src_code"]),
                    "trg_code": to_segs(batch["trg_code"]),
                    "cv_excit": to_segs(batch["cv_excit"]),
                    "mask": to_segs(mask_full)}
            state0 = init_cycle_state(cfg, ts.params, Bl)

            if unroll:
                params, opt_state, cyc, rng = (ts.params, ts.opt_state,
                                               state0, ts.rng)
                mets_list = []
                for i in range(n_segs):
                    seg = {k: v[i] for k, v in segs.items()}
                    params, opt_state, cyc, rng, mets = seg_update(
                        params, opt_state, cyc, rng, seg)
                    mets_list.append(mets)
                metrics = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *mets_list)
            else:
                def body(carry, seg):
                    p, o, c, r = carry
                    p, o, c, r, mets = seg_update(p, o, c, r, seg)
                    return (p, o, c, r), mets
                (params, opt_state, _, rng), metrics = jax.lax.scan(
                    body, (ts.params, ts.opt_state, state0, ts.rng), segs)
            return TrainState(params, opt_state, rng, ts.step + 1), metrics

        return jax.jit(step_fn, donate_argnums=(0,))

    variants = {
        "full": make_variant("where", True, False),
        "nogate": make_variant("none", True, False),
        "condgate": make_variant("cond", True, False),
        "nometrics": make_variant("where", False, False),
        "unrolled": make_variant("where", True, True),
        "unroll_nogate": make_variant("none", True, True),
    }

    frames = B * T
    out = {}
    for name, step in variants.items():
        pv = jax.tree_util.tree_map(jnp.asarray, params_host)
        ts = TrainState(pv, opt.init(pv), jax.random.PRNGKey(1),
                        jnp.zeros((), jnp.int32))
        ts, m = step(ts, batch)
        float(jnp.sum(m["loss"]))
        t0 = time.time()
        for _ in range(K):
            ts, m = step(ts, batch)
        float(jnp.sum(m["loss"]))
        dt = max((time.time() - t0 - rtt) / K, 1e-9)
        out[name] = round(dt / frames * 1e6, 3)
        print(f"{name:14s} {out[name]:7.3f} us/frame "
              f"({frames / dt:,.0f} frames/s)", flush=True)

    print(json.dumps({"metric": "train_step_gap_us_per_frame",
                      "platform": jax.devices()[0].platform,
                      "B": B, "seg_len": S, "n_segs": n_segs, **out}))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
