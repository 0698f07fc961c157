#!/bin/bash
# Round-3 TPU queue C: persistent-wavefront scheduler benchmarks
# (UIVR_PERSIST=1) — width x refill-interval sweep, then the headline
# dual-record bench at the winning configuration.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_queue_r3c}
mkdir -p "$LOG"

run() {
    local name=$1; shift
    echo "== $name: $*"
    ( "$@" > "$LOG/$name.log" 2>&1; echo "EXIT=$?" >> "$LOG/$name.log" )
    grep -v -i warning "$LOG/$name.log" | tail -3
}

B="timeout 2400 env BENCH_PARITY=0 BENCH_ITERS=4 BENCH_GATE=0 UIVR_PERSIST=1"

# classification at the default CS=4 (the cs6/cs8 sweep lacked this control)
run cls_cs4 timeout 2400 env BENCH_PARITY=0 BENCH_ITERS=4 BENCH_GATE=0 python bench.py

run pers_w256_r8  $B UIVR_PERSIST_W=262144 UIVR_PERSIST_R=8 python bench.py
run pers_w256_r16 $B UIVR_PERSIST_W=262144 UIVR_PERSIST_R=16 python bench.py
run pers_w512_r8  $B UIVR_PERSIST_W=524288 UIVR_PERSIST_R=8 python bench.py
run pers_w256_r8_cs6 $B UIVR_PERSIST_W=262144 UIVR_PERSIST_R=8 UIVR_CROSS_STEPS=6 python bench.py

# 2-megatexel envmap proxy agreement + variance (import path fixed)
run bigenv_2m timeout 3600 env BIGENV_H=1024 python -u scripts/tpu_check_bigenv.py
echo "queue C done"
