"""Quiet-host stage-6 end-to-end wall time (VERDICT r4 weak #5 / next #5).

The r4 flagship stage-6 (fused bf16 Pallas decode path) was only timed under
heavy CPU contention from the concurrent reference trainer (184 s), so the
fusion's END-TO-END effect vs the r3 pre-fusion 150 s quiet-host figure was
unknown.  This runs the FULL 35-pair stage-6 decode through the recipe CLI
on a quiet host, prefetch overlap on vs off (CYCLEVAE_PREFETCH A/B), and
writes one JSON artifact.

Must run with no concurrent CPU load (the battery's 'quiet' phase pauses the
ref trainer around it).

Usage: python tools/bench_stage6_wall.py [--work /tmp/vcwork5]
           [--decode-epoch 79] [--out BENCH_STAGE6_WALL_r05.json]
Last stdout line is the JSON artifact (battery contract).

Reference counterpart beaten: decode_gru-cyclevae_gauss.py:309-323 (5
sequential forwards per pair, no overlap).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stage6(work, config, decode_epoch, prefetch: bool) -> float:
    env = dict(os.environ)
    env["CYCLEVAE_PREFETCH"] = "1" if prefetch else "0"
    cmd = [sys.executable, "-m", "cyclevae_tpu", "--stage", "6",
           "--work", work, "--config", config,
           "--decode-epoch", str(decode_epoch)]
    print("+", " ".join(cmd), f"(PREFETCH={env['CYCLEVAE_PREFETCH']})",
          flush=True)
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, env=env, cwd=REPO,
                   stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/vcwork5")
    ap.add_argument("--config", default=None,
                    help="defaults to <work>/flagship_config.json")
    ap.add_argument("--decode-epoch", type=int, default=79)
    ap.add_argument("--skip-baseline", action="store_true",
                    help="skip the slow CYCLEVAE_PREFETCH=0 sequential run")
    ap.add_argument("--out", default="BENCH_STAGE6_WALL_r05.json")
    args = ap.parse_args()
    config = args.config or os.path.join(args.work, "flagship_config.json")

    t_overlap = run_stage6(args.work, config, args.decode_epoch, True)
    print(f"overlap pipeline: {t_overlap:.1f} s", flush=True)
    t_seq = None
    if not args.skip_baseline:
        t_seq = run_stage6(args.work, config, args.decode_epoch, False)
        print(f"sequential baseline: {t_seq:.1f} s", flush=True)

    out = {"metric": "stage6_wall_seconds_35_pairs_quiet_host",
           "value": round(t_overlap, 1),
           "sequential_baseline_s": round(t_seq, 1) if t_seq else None,
           "overlap_speedup": round(t_seq / t_overlap, 2) if t_seq else None,
           "decode_epoch": args.decode_epoch,
           "r3_prefusion_quiet_host_s": 150.0,
           "r4_contended_s": 184.0}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
