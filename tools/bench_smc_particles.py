"""SMC particle-count sweep on the flagship decoder state-space model.

VERDICT r3 missing #2: BASELINE.json's north star names "SMC over
frame-sequence latents ... particles shard across the mesh", but SMC had
correctness artifacts only (exact log-marginal, RTS-smoother parity) and no
on-chip throughput number.  This sweeps n_particles on the trained (or
fresh-init) hu=1024 decoder SSM (``infer.smc.make_decoder_ssm``: per
particle, one decoder GRU step + Laplace observation weight per frame;
particles ride the vmapped batch axis and fill the MXU tile) and reports
particle-steps/s/chip = n_particles * T / filter_wall_time.

Proposals swept: "prior" (bootstrap), "amortized" (raw encoder guide, w=1)
and "amortized_w0.5" (tempered guide — the quality configuration: on
in-distribution features at obs_scale=1 it beats bootstrap on BOTH
log-marginal and ESS, see DIAG_SMC_AMORTIZED*.json and RESULTS.md [r5]).
The importance correction changes the weights, not the per-step FLOPs.
ESS and resample rate come along so the throughput number is
quality-annotated.  Features default to a REAL utterance when the work dir
exists (the encoder guide is only meaningful in-distribution; the r4 run's
synthetic sinusoids put the encoder ~14 nats/frame OOD and degenerated the
guided filter — VERDICT r4 weak #2, diagnosed in tools/diag_smc_amortized.py).

Run ON the TPU (default platform).  Writes BENCH_SMC_PARTICLES.json.

Reference counterpart: none — the reference (CUDA/torch CycleVAE-VC) has no
probabilistic-inference subsystem (SURVEY.md §5).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_hmc_chains import find_ckpt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--particles", type=int, nargs="+",
                    default=[256, 512, 1024, 2048, 4096])
    ap.add_argument("--proposals", nargs="+",
                    default=["prior", "amortized", "amortized_w0.5"])
    ap.add_argument("--obs-scale", type=float, default=1.0)
    ap.add_argument("--real", default="/tmp/vcwork5/hdf5/VCC2SF1/10001.h5",
                    help="h5 with feat_org_lf0 for in-distribution features; "
                         "'none' or missing file falls back to synthetic")
    ap.add_argument("--reps", type=int, default=3,
                    help="timed filter repetitions (min taken)")
    ap.add_argument("--out", default="BENCH_SMC_PARTICLES.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cyclevae_tpu import enable_compilation_cache
    from cyclevae_tpu.infer.smc import SMCConfig, make_decoder_ssm, smc_filter
    from cyclevae_tpu.models.gru_vae import gru_rnn_apply
    from cyclevae_tpu.vi.train import CycleVAEConfig, init_cyclevae

    enable_compilation_cache()
    platform = jax.devices()[0].platform
    cfg = CycleVAEConfig(hidden_units=1024, n_cyc=2)

    ckpt = None if args.ckpt == "none" else find_ckpt(args.ckpt)
    if ckpt:
        from cyclevae_tpu.vi.checkpoint import load_checkpoint
        params = load_checkpoint(ckpt)["params"]
        params = jax.tree_util.tree_map(jnp.asarray, params)
        src = os.path.basename(os.path.dirname(ckpt)) + "/" + \
            os.path.basename(ckpt)
    else:
        params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                               np.zeros(54, np.float32),
                               np.ones(54, np.float32))
        src = "fresh-init"

    T = args.frames
    if args.real != "none" and os.path.exists(args.real):
        import h5py
        with h5py.File(args.real, "r") as h:
            raw = np.asarray(h["feat_org_lf0"], np.float32)
        assert raw.shape[0] >= T, (raw.shape, T)
        feats = jnp.asarray(raw[:T])
        code = jnp.asarray(np.tile([1.0, 0.0], (T, 1)).astype(np.float32))
        data_src = os.path.basename(args.real)
    else:
        rng = np.random.default_rng(0)
        t = np.arange(T)[:, None]
        feats = jnp.asarray(
            (np.sin(t * 0.05 + np.arange(54)[None, :])
             + 0.1 * rng.normal(size=(T, 54))).astype(np.float32))
        code = jnp.asarray(np.tile([0.0, 1.0], (T, 1)).astype(np.float32))
        data_src = "synthetic-sin"

    # amortized proposal: encoder posterior over the same utterance
    enc_lat, _, _ = gru_rnn_apply(
        params.encoder, cfg.enc_cfg, feats[None],
        jnp.zeros((1, cfg.lat_dim * 2)), lat_dim=cfg.lat_dim, clamp_vae=True)
    enc_lat = enc_lat[0]

    sweeps = {}
    for proposal in args.proposals:
        guide_w = 1.0
        kind = proposal
        if proposal.startswith("amortized_w"):
            kind, guide_w = "amortized", float(proposal[len("amortized_w"):])
        init, prop, logw = make_decoder_ssm(
            params, cfg, feats, code, obs_scale=args.obs_scale, proposal=kind,
            enc_lat=enc_lat if kind == "amortized" else None,
            guide_weight=guide_w)
        rows = []
        for N in args.particles:
            scfg = SMCConfig(n_particles=N)

            @jax.jit
            def run(key):
                _, info = smc_filter(key, T, init, prop, logw, scfg)
                return (info["log_marginal"], jnp.mean(info["ess"]),
                        jnp.mean(info["resampled"].astype(jnp.float32)))

            key = jax.random.PRNGKey(N)
            lm, ess, rr = run(key)      # compile + warmup
            jax.block_until_ready(lm)
            best = np.inf
            for _ in range(args.reps):
                t0 = time.perf_counter()
                lm, ess, rr = run(key)
                jax.block_until_ready(lm)
                best = min(best, time.perf_counter() - t0)
            psteps = N * T / best
            rows.append({
                "particles": N, "filter_ms": round(best * 1e3, 2),
                "particle_steps_per_sec_per_chip": round(psteps, 1),
                "log_marginal": round(float(lm), 2),
                "mean_ess": round(float(ess), 1),
                "resample_rate": round(float(rr), 3)})
            print(f"[{proposal}] N={N:5d}  {best*1e3:9.2f} ms/filter  "
                  f"{psteps:12.1f} particle-steps/s  ESS={float(ess):8.1f}  "
                  f"resample={float(rr):.3f}")
        sweeps[proposal] = rows

    all_rows = [r for rows in sweeps.values() for r in rows]
    best = max(all_rows, key=lambda r: r["particle_steps_per_sec_per_chip"])
    best_prop = next(p for p, rows in sweeps.items() if best in rows)
    out = {"metric": "smc_particle_steps_per_sec_per_chip",
           "platform": platform, "params": src, "frames": T,
           "data": data_src, "obs_scale": args.obs_scale,
           "value": best["particle_steps_per_sec_per_chip"],
           "best_particles": best["particles"], "best_proposal": best_prop,
           "sweep": sweeps}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "platform", "value", "best_particles")}))


if __name__ == "__main__":
    main()
