#!/bin/bash
# Round-2 TPU measurement queue — run AFTER the reproduction finishes
# (only ONE process may talk to the TPU relay at a time).
#
# 1. production-config training-step proof (VERDICT r1 item 6)
# 2. compaction-schedule sweep via UIVR_SCHED (stage shapes)
# 3. fresh default + reference-parity bench records
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue_r2
mkdir -p "$LOG"

run() {  # run NAME CMD...
    local name=$1; shift
    echo "== $name: $*"
    ( "$@" > "$LOG/$name.log" 2>&1; echo "EXIT=$?" >> "$LOG/$name.log" )
    grep -v WARNING "$LOG/$name.log" | tail -3
}

run prod_step timeout 3000 python -u scripts/dev_production_step.py

# 2-megatexel (1024x2048) envmap: coarse-proxy NEE vs flat full-res NEE on
# hardware (VERDICT r1 weak #5 — proxy variance at production HDR sizes)
run bigenv_2m timeout 3000 env BIGENV_H=1024 python -u scripts/tpu_check_bigenv.py

# schedule sweep: fewer full-width dispatches before the first compaction,
# with an extra /4 stage (the p50 lane finishes ~15 events; stage-0 48 was
# tuned for batch 16384 — probe earlier cuts)
run bench_s24   timeout 2400 env BENCH_ITERS=6 UIVR_SCHED="24,/4:64,/8:256,/32" python bench.py
run bench_s32   timeout 2400 env BENCH_ITERS=6 UIVR_SCHED="32,/8:256,/32" python bench.py
run bench_ctrl  timeout 2400 env BENCH_ITERS=6 python bench.py

# final records at the default methodology (iters=10)
run bench_final  timeout 3600 python bench.py
run bench_parity timeout 3600 env BENCH_PARITY=1 python bench.py
echo "queue done"
