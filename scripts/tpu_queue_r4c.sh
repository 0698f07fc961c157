#!/bin/bash
# Round-4 TPU queue C: final perf A/Bs on the persistent scheduler
# (run when the reproduction queue frees the chip; ~25 min total).
#   1. control           — tuned default (persistent W=65536, R=4)
#   2. defer_tc          — UIVR_DEFER_TC=1: adjoint transmittance-gradient
#                          scatters accumulate in pending lane slots and
#                          flush wide at eviction (same wide-row argument
#                          as the reservoir-collection win)
#   3. r2                — refill interval 4 -> 2 (r4 measured 8->4 +5.3%;
#                          is there more?)
#   4. defer_tc + best R — composition if 2 or 3 won
# Methodology matches the r3/r4 sweeps: BENCH_ITERS=4, gate off (the gate
# runs green separately / in the driver's final bench).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_queue_r4c}
mkdir -p "$LOG"
B="timeout 2400 env BENCH_PARITY=0 BENCH_ITERS=4 BENCH_GATE=0"
run() {
    local name=$1; shift
    echo "== $name ($(date +%H:%M:%S))"
    ( $B "$@" python bench.py > "$LOG/$name.log" 2>&1; echo "EXIT=$?" >> "$LOG/$name.log" )
    grep -v -i warning "$LOG/$name.log" | tail -1
}
run control
run defer_tc UIVR_DEFER_TC=1
run r2 UIVR_PERSIST_R=2
# finer in-VMEM classification: budget 32768 -> fs=2 at 64^3 (subcell hi
# over 2^3 voxels ~= local sigma, so most *null* candidates resolve
# without the sigma row gather; lookup cost ~1 ns/lane at 256 shuffle
# rounds vs the 10.2 ns/lane gather it avoids)
run class32k UIVR_CLASS_CELLS=32768
run cross8 UIVR_CROSS_STEPS=8
run best_combo UIVR_DEFER_TC=1 UIVR_CLASS_CELLS=32768   # edit per results
# The adjoint-side levers matter MOST at the reference-parity estimator
# config (bwd = 73.3% of step time there, BENCH_SPLIT r4): measure parity
# for the control and the best tuned combo so BENCH_r04's parity record
# reflects the sweep's winner.
P="timeout 2400 env BENCH_PARITY=1 BENCH_ITERS=4 BENCH_GATE=0"
prun() {
    local name=$1; shift
    echo "== $name ($(date +%H:%M:%S))"
    ( $P "$@" python bench.py > "$LOG/$name.log" 2>&1; echo "EXIT=$?" >> "$LOG/$name.log" )
    grep -v -i warning "$LOG/$name.log" | tail -1
}
prun parity_control
prun parity_defer_tc UIVR_DEFER_TC=1
echo "queue C done ($(date +%H:%M:%S))"
