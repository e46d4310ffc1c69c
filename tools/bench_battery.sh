#!/bin/bash
# Round-4 TPU bench battery: waits for the chip to answer, then runs every
# bench sequentially (one TPU process at a time) and drops artifacts in the
# repo root.  Pauses the head-to-head reference CPU trainer (by exact PID)
# during the µs-sensitive headline bench for a quiet host.
#
# Usage: nohup bash tools/bench_battery.sh [ref_trainer_pid] > /tmp/battery.log 2>&1 &
set -u
cd /root/repo
REF_PID="${1:-}"

probe() {
    timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(8).sum()))" >/dev/null 2>&1
}

echo "$(date -u +%H:%M:%S) waiting for TPU..."
until probe; do
    sleep 300
done
echo "$(date -u +%H:%M:%S) TPU ANSWERED — starting battery"

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

# 1. headline train-throughput sweep (quiet host)
pause_ref
echo "=== bench.py"
timeout 2400 python bench.py > /tmp/bench_r04.out 2>/tmp/bench_r04.err
tail -1 /tmp/bench_r04.out > BENCH_TPU_r04.json && cat BENCH_TPU_r04.json

# 2. step-gap ablations (quiet host)
echo "=== bench_step_gap"
timeout 1800 python tools/bench_step_gap.py 64 10 > /tmp/step_gap.out 2>&1
tail -1 /tmp/step_gap.out > BENCH_STEP_GAP_r04.json && cat BENCH_STEP_GAP_r04.json

# 3. stage-6 decode fusion A/B on the fresh flagship (quiet host)
CKPT=/tmp/vcwork5/exp/tpu-cyclevae-gauss_hl1_hu1024_ld32_ks3_ds2_cyc2_lr0.0001_bs80_bsu5
echo "=== bench_decode_fusion"
timeout 1200 python tools/bench_decode_fusion.py "$CKPT/checkpoint-79.pkl" \
    "$CKPT/model.json" > /tmp/decode_fusion.out 2>&1
tail -1 /tmp/decode_fusion.out > BENCH_DECODE_FUSION_r04.json && cat BENCH_DECODE_FUSION_r04.json
resume_ref

# 4-6. inference benches (device-bound; ref may run)
echo "=== bench_hmc_chains"
timeout 3600 python tools/bench_hmc_chains.py --out BENCH_HMC_CHAINS.json \
    > /tmp/hmc_chains.out 2>&1 && tail -3 /tmp/hmc_chains.out
echo "=== bench_smc_particles"
timeout 3600 python tools/bench_smc_particles.py --out BENCH_SMC_PARTICLES.json \
    > /tmp/smc_particles.out 2>&1 && tail -3 /tmp/smc_particles.out
echo "=== bench_nuts"
timeout 3600 python tools/bench_nuts.py --out BENCH_NUTS.json \
    > /tmp/nuts.out 2>&1 && tail -3 /tmp/nuts.out

echo "$(date -u +%H:%M:%S) battery done"
