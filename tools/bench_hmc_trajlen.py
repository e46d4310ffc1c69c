"""Trajectory-length sweep for batched-chain HMC on the flagship decoder.

Completes the r5 sampler-tuning story: the NUTS depth sweep (BENCH_NUTS.json)
showed the flagship decoder latent posterior saturates every tree depth this
chip can run (needs >255 leapfrogs per trajectory), and the mass-adaptation
A/B (BENCH_HMC_CHAINS.json) showed the 8-leapfrog operating point leaves the
metric gain unrealized — the TRAJECTORY LENGTH, not the metric, binds ESS.
This tool sweeps n_leapfrog at fixed chains and reports ESS/s per chip at
each point by invoking tools/bench_hmc_chains.py per L (same dual-averaged
warmup, same windowed mass adaptation) and merging one artifact.

ESS-estimator cap: with --iters S samples the per-chain initial-positive-
sequence estimate cannot exceed ess_fraction 1.0, so rows whose
ess_fraction ~= 1.0 are lower bounds on the true ESS/s.

Run ON the TPU (quiet host).  Writes BENCH_HMC_TRAJLEN.json.

Reference counterpart: none — the reference (CUDA/torch CycleVAE-VC) has no
probabilistic-inference subsystem; capability beyond parity (SURVEY.md §5).
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--leapfrogs", type=int, nargs="+",
                    default=[8, 32, 64, 128, 256])
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--warmup", type=int, default=48)
    ap.add_argument("--mode", default="fast",
                    help="fast = bf16-compute fused-Pallas decoder")
    ap.add_argument("--out", default="BENCH_HMC_TRAJLEN.json")
    args = ap.parse_args()

    rows = []
    for L in args.leapfrogs:
        part = os.path.join("/tmp", f"hmc_trajlen_L{L}.json")
        cmd = [sys.executable, os.path.join(HERE, "bench_hmc_chains.py"),
               "--chains", str(args.chains), "--n-leapfrog", str(L),
               "--iters", str(args.iters), "--warmup", str(args.warmup),
               "--mode", args.mode, "--adapt-mass", "on", "--out", part]
        if args.ckpt:
            cmd += ["--ckpt", args.ckpt]
        print("+", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, cwd=REPO)
        with open(part) as f:
            d = json.load(f)
        row = dict(d["sweep"][args.mode][0])
        row["n_leapfrog"] = L
        row["ckpt"] = d.get("params", "?")
        rows.append(row)
        print(f"L={L}: ESS/s={row.get('ess_per_sec_per_chip')} "
              f"ess_fraction={row.get('ess_fraction')} "
              f"samples/s={row.get('samples_per_sec_per_chip')}", flush=True)

    best = max(rows, key=lambda r: r.get("ess_per_sec_per_chip", 0.0))
    out = {
        "metric": "hmc_ess_per_sec_per_chip_vs_trajectory_length",
        "value": best.get("ess_per_sec_per_chip"),
        "unit": "ESS/s/chip",
        "best_n_leapfrog": best["n_leapfrog"],
        "chains": args.chains,
        "iters": args.iters,
        "mode": args.mode,
        "adapt_mass": True,
        "ess_estimator_note": ("initial-positive-sequence on a "
                               f"{args.iters}-sample global-mean trace; "
                               "ess_fraction ~= 1.0 rows are lower bounds"),
        "rows": rows,
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "value", "unit", "best_n_leapfrog")}))


if __name__ == "__main__":
    main()
