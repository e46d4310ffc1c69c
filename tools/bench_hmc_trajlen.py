"""Trajectory-length sweep for batched-chain HMC on the flagship decoder.

Completes the r5 sampler-tuning story: the NUTS depth sweep (BENCH_NUTS.json)
showed the flagship decoder latent posterior saturates every tree depth this
chip can run (needs >255 leapfrogs per trajectory), and the mass-adaptation
A/B (BENCH_HMC_CHAINS.json) showed the 8-leapfrog operating point leaves the
metric gain unrealized.  This sweeps (n_leapfrog, target_accept, adapt_mass)
operating points by invoking tools/bench_hmc_chains.py per point and merging
one artifact.

Fault tolerance: some long-trajectory points reproducibly fault this v5e
chip (UNAVAILABLE kernel fault — same class as NUTS max_depth=10 and f32
C=512; see TODO.md gotchas).  A faulting point is recorded as
{"fault": true} and the sweep continues: the fault envelope is itself a
documented finding, not an abort.

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

# L,target_accept,adapt_mass — the default grid brackets the r4/r5 operating
# point (L=8, ta=0.9, mass on) with longer trajectories and the looser
# acceptance targets long trajectories need (DA collapses eps at ta=0.9
# once per-trajectory integration error accumulates).
DEFAULT_POINTS = [
    "8,0.9,on", "16,0.8,on", "32,0.9,on", "32,0.7,on", "32,0.7,off",
    "64,0.7,on",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--points", nargs="+", default=DEFAULT_POINTS,
                    help="comma triples n_leapfrog,target_accept,adapt_mass")
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--warmup", type=int, default=48)
    ap.add_argument("--mode", default="fast",
                    help="fast = bf16-compute fused-Pallas decoder")
    ap.add_argument("--out", default="BENCH_HMC_TRAJLEN.json")
    args = ap.parse_args()

    rows = []
    for spec in args.points:
        l_s, ta_s, mass = spec.split(",")
        L, ta = int(l_s), float(ta_s)
        part = os.path.join("/tmp", f"hmc_trajlen_{spec.replace(',', '_')}.json")
        cmd = [sys.executable, os.path.join(HERE, "bench_hmc_chains.py"),
               "--chains", str(args.chains), "--n-leapfrog", str(L),
               "--iters", str(args.iters), "--warmup", str(args.warmup),
               "--target-accept", str(ta),
               "--mode", args.mode, "--adapt-mass", mass, "--out", part]
        if args.ckpt:
            cmd += ["--ckpt", args.ckpt]
        print("+", " ".join(cmd), flush=True)
        r = subprocess.run(cmd, cwd=REPO)
        if r.returncode != 0:
            rows.append({"n_leapfrog": L, "target_accept": ta,
                         "adapt_mass": mass == "on", "fault": True})
            print(f"point {spec}: DEVICE FAULT (recorded, continuing)",
                  flush=True)
            continue
        with open(part) as f:
            d = json.load(f)
        row = dict(d["sweep"][args.mode][0])
        row["n_leapfrog"] = L
        row["target_accept"] = ta
        row["ckpt"] = d.get("params", "?")
        rows.append(row)
        print(f"point {spec}: ESS/s={row.get('ess_per_sec_per_chip')} "
              f"ess_fraction={row.get('ess_fraction')} "
              f"eps={row.get('da_step_size')} "
              f"samples/s={row.get('samples_per_sec_per_chip')}", flush=True)

    ok = [r for r in rows if not r.get("fault")]
    best = max(ok, key=lambda r: r.get("ess_per_sec_per_chip", 0.0))
    out = {
        "metric": "hmc_ess_per_sec_per_chip_vs_trajectory_length",
        "value": best.get("ess_per_sec_per_chip"),
        "unit": "ESS/s/chip",
        "best_point": {k: best.get(k) for k in
                       ("n_leapfrog", "target_accept", "adapt_mass",
                        "ess_per_sec_per_chip", "ess_fraction",
                        "da_step_size", "accept")},
        "chains": args.chains,
        "iters": args.iters,
        "mode": args.mode,
        "n_faulting_points": sum(1 for r in rows if r.get("fault")),
        "ess_estimator_note": ("initial-positive-sequence on a "
                               f"{args.iters}-sample global-mean trace; "
                               "ess_fraction ~= 1.0 rows are lower bounds"),
        "rows": rows,
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "value", "unit", "best_point")}))


if __name__ == "__main__":
    main()
