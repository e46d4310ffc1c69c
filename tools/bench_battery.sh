#!/bin/bash
# Round-5 TPU bench battery.  Waits for the chip to answer, then runs benches
# sequentially (one TPU process at a time) and drops artifacts in the repo
# root.  Exit codes ARE checked and every artifact line must parse as JSON
# before it is written (ADVICE r4 #4 — the r4 battery silently wrote partial
# tails on timeout).
#
# Phases:
#   infer  — device-bound inference benches (HMC mass A/B, NUTS depth sweep,
#            SMC proposals); a CPU ref trainer may keep running.
#   quiet  — µs-sensitive host-side benches (bench.py, step gap, decode
#            fusion); pauses the ref trainer PID (exact PID only) around them.
#
# Usage: nohup bash tools/bench_battery.sh <phase> [ref_trainer_pid] \
#            > /tmp/battery_r5_<phase>.log 2>&1 &
set -u
cd /root/repo
PHASE="${1:?phase required: infer|quiet}"
REF_PID="${2:-}"

probe() {
    timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(8).sum()))" >/dev/null 2>&1
}

echo "$(date -u +%H:%M:%S) waiting for TPU..."
until probe; do
    sleep 300
done
echo "$(date -u +%H:%M:%S) TPU ANSWERED — phase=$PHASE"

pause_ref() {
    if [ -n "$REF_PID" ] && kill -0 "$REF_PID" 2>/dev/null; then
        kill -STOP "$REF_PID" && echo "paused ref trainer $REF_PID"
    fi
}
resume_ref() {
    if [ -n "$REF_PID" ] && kill -0 "$REF_PID" 2>/dev/null; then
        kill -CONT "$REF_PID" && echo "resumed ref trainer $REF_PID"
    fi
}

# run_bench <timeout_s> <artifact or "-"> <logfile> <cmd...>
# Checks the exit code; when artifact != "-", takes the log's LAST line,
# validates it parses as JSON, and only then writes the artifact.
run_bench() {
    local t="$1" artifact="$2" logf="$3"; shift 3
    echo "=== $* (timeout ${t}s)"
    timeout "$t" "$@" > "$logf" 2>&1
    local rc=$?
    if [ $rc -ne 0 ]; then
        echo "!!! FAILED rc=$rc: $* (see $logf; artifact NOT written)"
        tail -3 "$logf"
        return $rc
    fi
    if [ "$artifact" != "-" ]; then
        if tail -1 "$logf" | python -c "import json,sys; json.load(sys.stdin)" 2>/dev/null; then
            tail -1 "$logf" > "$artifact"
            echo "wrote $artifact: $(cat "$artifact")"
        else
            echo "!!! last line of $logf is not JSON; artifact NOT written"
            tail -3 "$logf"
            return 1
        fi
    else
        tail -2 "$logf"
    fi
}

if [ "$PHASE" = "infer" ]; then
    # device-bound; writes its own --out artifact, last stdout line is JSON
    run_bench 5400 - /tmp/hmc_chains_r5.out \
        python tools/bench_hmc_chains.py --adapt-mass both --mode both \
        --out BENCH_HMC_CHAINS.json
    run_bench 5400 - /tmp/nuts_r5.out \
        python tools/bench_nuts.py --chains 64 128 --max-depths 6 8 10 \
        --out BENCH_NUTS.json
    run_bench 3600 - /tmp/smc_particles_r5.out \
        python tools/bench_smc_particles.py --out BENCH_SMC_PARTICLES.json
    # trajectory-length operating-point grid (r5: ESS/s is maximized at
    # long trajectories once target-accept is loosened to ~0.7)
    run_bench 3600 - /tmp/hmc_trajlen_r5.out \
        python tools/bench_hmc_trajlen.py --out BENCH_HMC_TRAJLEN.json
elif [ "$PHASE" = "quiet" ]; then
    pause_ref
    trap resume_ref EXIT
    run_bench 2400 BENCH_TPU_r05.json /tmp/bench_r05.out python bench.py
    run_bench 1800 BENCH_STEP_GAP_r05.json /tmp/step_gap_r5.out \
        python tools/bench_step_gap.py 64 10
    CKPT=/tmp/vcwork5/exp/tpu-cyclevae-gauss_hl1_hu1024_ld32_ks3_ds2_cyc2_lr0.0001_bs80_bsu5
    run_bench 1200 BENCH_DECODE_FUSION_r05.json /tmp/decode_fusion_r5.out \
        python tools/bench_decode_fusion.py "$CKPT/checkpoint-79.pkl" \
        "$CKPT/model.json"
    # full 35-pair stage-6 wall time, prefetch A/B (VERDICT r4 #5)
    run_bench 2400 BENCH_STAGE6_WALL_r05.json /tmp/stage6_wall_r5.out \
        python tools/bench_stage6_wall.py
    resume_ref
    trap - EXIT
else
    echo "unknown phase $PHASE"; exit 2
fi

echo "$(date -u +%H:%M:%S) battery phase=$PHASE done"
