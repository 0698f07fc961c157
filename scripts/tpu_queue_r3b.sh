#!/bin/bash
# Round-3 TPU queue B (run AFTER tpu_queue_r3.sh): compaction-schedule
# re-tuning with classification active (fewer dispatches/lane => the
# stage-0 full-width budget tuned in r2 now overshoots), the hardened
# z-test gate on hardware (with a classification-off bisect), the
# 2-megatexel envmap proxy validation (VERDICT r2 item 8), and the 256^3
# production-step probe with classification.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_queue_r3b}
mkdir -p "$LOG"

run() {
    local name=$1; shift
    echo "== $name: $*"
    ( "$@" > "$LOG/$name.log" 2>&1; echo "EXIT=$?" >> "$LOG/$name.log" )
    grep -v -i warning "$LOG/$name.log" | tail -4
}

B="timeout 2400 env BENCH_PARITY=0 BENCH_ITERS=4 BENCH_GATE=0"

# hardened gate on hardware: default kernel vs classification-off bisect
run gate_cls timeout 3000 python -u -c "import bench; print(bench.preflight_gate('GATE_LAST.json'))"
run gate_nocls timeout 3000 env UIVR_CLASS_CELLS=0 UIVR_ESC=0 python -u -c "import bench; print(bench.preflight_gate('/tmp/gate_nocls.json'))"

# schedule sweep with classification (dispatch demand dropped ~30%)
run sched_a $B UIVR_SCHED="32,/4:64,/8:192,/32" python bench.py
run sched_b $B UIVR_SCHED="24,/4:48,/8:160,/32" python bench.py
run sched_c $B UIVR_SCHED="32,/8:192,/32" python bench.py

# 2-megatexel envmap proxy agreement + variance (VERDICT r2 item 8)
run bigenv_2m timeout 3600 env BIGENV_H=1024 python -u scripts/tpu_check_bigenv.py

# 256^3 production step with classification
run prod_step timeout 3000 python -u scripts/dev_production_step.py
echo "queue B done"
