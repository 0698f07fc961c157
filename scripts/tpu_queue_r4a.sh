#!/bin/bash
# Round-4 TPU queue A: K-candidate x persistent sweep (PLAN round-4).
# Sequential single-process runs; BENCH_GATE=0 matches the round-3 sweep
# methodology (the gate ran green separately with the new schedulers).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_queue_r4a}
mkdir -p "$LOG"
B="timeout 2400 env BENCH_PARITY=0 BENCH_ITERS=4 BENCH_GATE=0"
run() {
    local name=$1; shift
    echo "== $name ($(date +%H:%M:%S))"
    ( $B "$@" python bench.py > "$LOG/$name.log" 2>&1; echo "EXIT=$?" >> "$LOG/$name.log" )
    grep -v -i warning "$LOG/$name.log" | tail -1
}
run control_k1
run k2 UIVR_KCAND=2
run k4 UIVR_KCAND=4
run k4_w128 UIVR_KCAND=4 UIVR_PERSIST_W=131072
run k2_w128 UIVR_KCAND=2 UIVR_PERSIST_W=131072
echo "queue A done ($(date +%H:%M:%S))"
