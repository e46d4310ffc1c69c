"""Chain-count sweep for batched-chain HMC on the flagship decoder log-joint.

VERDICT r2 #4: the AR decoder step is batch-insensitive up to the MXU tile,
so the samples/s/chip headline at 32 chains understates the chip.  This tool
sweeps n_chains and reports samples/s/chip at each point so BASELINE.json's
"HMC samples/s/chip" north star reflects the knee of the curve.

Workload: per-utterance latent posterior inference against the frozen
flagship (hu=1024) decoder — ``infer.logjoint.make_utterance_logjoint_batched``
with chains riding the decoder batch axis, z of shape (C, T, 32), T=256.
Each HMC iteration costs ``2*n_leapfrog`` log-joint gradient evaluations
(each differentiating through the full AR scan) plus 2 log-joint values;
every iteration (warmup or sampling) has identical cost, so
samples/s/chip = C / per_iteration_time.

Run ON the TPU (default platform).  Writes BENCH_HMC_CHAINS.json.

Reference counterpart: none — the reference (CUDA/torch CycleVAE-VC) has no
probabilistic-inference subsystem; this is framework capability beyond
parity (SURVEY.md §5).
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_CKPT_GLOBS = [
    "/tmp/vcwork3/exp/tpu-cyclevae-gauss_*bsu5/checkpoint-79.pkl",
    "/tmp/vcwork*/exp/tpu-cyclevae-gauss_*/checkpoint-latest.pkl",
]


def find_ckpt(explicit):
    if explicit:
        return explicit
    for pat in DEFAULT_CKPT_GLOBS:
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[0]
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--chains", type=int, nargs="+",
                    default=[32, 64, 128, 256, 512])
    ap.add_argument("--n-leapfrog", type=int, default=8)
    ap.add_argument("--iters", type=int, default=48,
                    help="timed HMC sampling iterations per chain count")
    ap.add_argument("--warmup", type=int, default=48,
                    help="dual-averaging warmup iterations (adapts step "
                         "size to --target-accept so acceptance is "
                         "comparable across chain counts; VERDICT r3 #5)")
    ap.add_argument("--target-accept", type=float, default=0.9)
    ap.add_argument("--mode", choices=["f32", "fast", "both"], default="both",
                    help="decoder path: f32 XLA scan, bf16 fused Pallas "
                         "(custom-VJP grads), or sweep both")
    ap.add_argument("--adapt-mass", choices=["on", "off", "both"],
                    default="both",
                    help="VERDICT r4 weak #4: A/B the windowed diagonal "
                         "mass adaptation (phase-1 DA under identity mass, "
                         "mass from pooled warmup variance, phase-2 step-"
                         "size re-adaptation under the new metric) against "
                         "identity mass; ESS/s is the honest currency")
    ap.add_argument("--out", default="BENCH_HMC_CHAINS.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cyclevae_tpu.infer.hmc import HMCConfig, hmc_sample_batch
    from cyclevae_tpu.infer.logjoint import make_utterance_logjoint_batched
    from cyclevae_tpu import enable_compilation_cache
    from cyclevae_tpu.vi.train import CycleVAEConfig, init_cyclevae

    enable_compilation_cache()
    platform = jax.devices()[0].platform
    cfg = CycleVAEConfig(hidden_units=1024, n_cyc=2)

    ckpt = None if args.ckpt == "none" else find_ckpt(args.ckpt)
    if ckpt:
        from cyclevae_tpu.vi.checkpoint import load_checkpoint
        params = load_checkpoint(ckpt)["params"]
        # Device-put: numpy leaves closed over in jit are embedded as HLO
        # literals (tens of MB), which crashes the v5e memory-space assigner;
        # device arrays are hoisted as captured parameters instead.
        params = jax.tree_util.tree_map(jnp.asarray, params)
        src = os.path.basename(os.path.dirname(ckpt)) + "/" + \
            os.path.basename(ckpt)
    else:
        params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                               np.zeros(54, np.float32),
                               np.ones(54, np.float32))
        src = "fresh-init"

    T, ld = args.frames, cfg.lat_dim
    rng = np.random.default_rng(0)
    t = np.arange(T)[:, None]
    feats = (np.sin(t * 0.05 + np.arange(54)[None, :])
             + 0.1 * rng.normal(size=(T, 54))).astype(np.float32)
    spk_code = np.tile([0.0, 1.0], (T, 1)).astype(np.float32)

    feats_d, code_d = jnp.asarray(feats), jnp.asarray(spk_code)

    mass_settings = {"on": [True], "off": [False],
                     "both": [True, False]}[args.adapt_mass]
    total_iters = args.warmup + args.iters

    from dataclasses import replace as dc_replace

    modes = {"f32": cfg,
             "fast": dc_replace(cfg, use_pallas=True,
                                compute_dtype="bfloat16")}
    if args.mode != "both":
        modes = {args.mode: modes[args.mode]}

    def make_run(cfg_m, hmc_cfg):
        # params ride as a jit ARGUMENT, not a closure: closed-over small
        # param leaves (scale_out stats) inline as HLO literals, and with
        # real (non-zero/one) values the folded program crashes the v5e
        # memory-space assigner ("Check failed: memory_space ==
        # existing_required_assignment", copy.461 — seen 2026-08-19;
        # fresh-init zeros/ones fold away and pass).
        @jax.jit
        def run(params, key, z0):
            lj = make_utterance_logjoint_batched(params, cfg_m,
                                                 feats_d, code_d)
            samples, info = hmc_sample_batch(key, lj, z0, hmc_cfg)
            # reduce to a per-iteration-per-chain scalar trace for the host
            # ESS estimate (full-axis means — samples[-1] slicing of the
            # scan-stacked output trips the v5e MSA check here)
            trace = jnp.mean(samples, axis=(2, 3))        # (S, C)
            return trace, info["accept_prob"], info["step_size"]
        return run

    def ess_fraction(trace: np.ndarray) -> float:
        """Mean ESS/S over chains via the initial-positive-sequence
        autocorrelation estimator (Geyer 1992) on a (S, C) scalar trace."""
        S, C = trace.shape
        fracs = []
        for c in range(C):
            x = trace[:, c] - trace[:, c].mean()
            v = float(np.dot(x, x)) / S
            if v <= 0:
                fracs.append(1.0)
                continue
            acf = np.correlate(x, x, mode="full")[S - 1:] / (S * v)
            s, k = 0.0, 1
            while k + 1 < S:
                pair = acf[k] + acf[k + 1]
                if pair <= 0:
                    break
                s += pair
                k += 2
            fracs.append(1.0 / max(1.0, 1.0 + 2.0 * s))
        return float(np.mean(fracs))

    sweeps = {}
    for mode, cfg_m in modes.items():
        rows = []
        for adapt_mass in mass_settings:
            hmc_cfg = HMCConfig(step_size=0.02, n_leapfrog=args.n_leapfrog,
                                n_warmup=args.warmup, n_samples=args.iters,
                                target_accept=args.target_accept,
                                adapt_mass=adapt_mass)
            run = make_run(cfg_m, hmc_cfg)
            for C in args.chains:
                if mode == "f32" and C > 256 and platform != "cpu":
                    # f32 at C=512 reproducibly faults the v5e device
                    # (UNAVAILABLE kernel fault; bf16 C=512 is fine)
                    print(f"[{mode}] C={C}: skipped (known device fault)")
                    continue
                z0 = jnp.asarray(
                    rng.normal(size=(C, T, ld)).astype(np.float32) * 0.1)
                key = jax.random.PRNGKey(C)
                tr, acc, ss = run(params, key, z0)  # compile + first run
                jax.block_until_ready(tr)
                t0 = time.perf_counter()
                tr, acc, ss = run(params, key, z0)
                jax.block_until_ready(tr)
                dt = time.perf_counter() - t0
                per_iter = dt / total_iters
                sps = C / per_iter
                ef = ess_fraction(np.asarray(tr))
                grad_evals = C * 2 * args.n_leapfrog / per_iter
                rows.append({"chains": C, "adapt_mass": adapt_mass,
                             "iter_ms": per_iter * 1e3,
                             "samples_per_sec_per_chip": round(sps, 1),
                             "accept": round(float(acc), 3),
                             "da_step_size": round(float(ss), 5),
                             "ess_fraction": round(ef, 3),
                             "ess_per_sec_per_chip": round(sps * ef, 1),
                             "grad_evals_per_sec": round(grad_evals, 1)})
                print(f"[{mode}] mass={'Y' if adapt_mass else 'n'} "
                      f"C={C:4d}  {per_iter*1e3:8.2f} ms/iter  "
                      f"{sps:10.1f} samples/s/chip  accept={float(acc):.3f}  "
                      f"eps={float(ss):.4f}  ESS/s={sps*ef:.1f}")
        sweeps[mode] = rows

    all_rows = [r for rows in sweeps.values() for r in rows]
    best = max(all_rows, key=lambda r: r["samples_per_sec_per_chip"])
    best_mode = next(m for m, rows in sweeps.items() if best in rows)
    best_ess = max(all_rows, key=lambda r: r["ess_per_sec_per_chip"])
    out = {"metric": "hmc_samples_per_sec_per_chip",
           "platform": platform, "params": src,
           "frames": T, "lat_dim": ld, "n_leapfrog": args.n_leapfrog,
           "n_warmup_da": args.warmup, "target_accept": args.target_accept,
           "value": best["samples_per_sec_per_chip"],
           "best_chains": best["chains"], "best_mode": best_mode,
           "best_ess_per_sec_per_chip": best_ess["ess_per_sec_per_chip"],
           "best_ess_row": {k: best_ess[k] for k in
                            ("chains", "adapt_mass", "accept")},
           "sweep": sweeps}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "platform", "value", "best_chains")}))


if __name__ == "__main__":
    main()
