#!/bin/bash
# Round-3 TPU measurement queue (only ONE process may talk to the relay at
# a time).  Sweeps the two new levers on the bench scene at fixed iters:
#   - in-kernel classification (subcell sigma bounds) + primal escape
#   - tighter walking majorants (factor 8/4) now that crossings/classified
#     nulls are dispatch-free (UIVR_KERNEL_TM raises the chunk gate)
#   - cross_steps unroll budget (gaps between fetch events grow)
# First invocation keeps the preflight gate ON to validate the new kernel
# lowering (incl. the classification shuffle) on hardware.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_queue_r3}
mkdir -p "$LOG"

run() {  # run NAME CMD...
    local name=$1; shift
    echo "== $name: $*"
    ( "$@" > "$LOG/$name.log" 2>&1; echo "EXIT=$?" >> "$LOG/$name.log" )
    grep -v -i warning "$LOG/$name.log" | tail -3
}

B="timeout 2400 env BENCH_PARITY=0 BENCH_ITERS=4"

# gate ON once: validates classification lowering (multi-seed grads)
run cls_gate    timeout 3000 env BENCH_PARITY=0 BENCH_ITERS=4 python bench.py
# controls at fixed iters
run ctrl_r2     $B BENCH_GATE=0 UIVR_CLASS_CELLS=0 UIVR_ESC=0 python bench.py
run esc_only    $B BENCH_GATE=0 UIVR_CLASS_CELLS=0 python bench.py
# unroll budget with classification
run cls_cs6     $B BENCH_GATE=0 UIVR_CROSS_STEPS=6 python bench.py
run cls_cs8     $B BENCH_GATE=0 UIVR_CROSS_STEPS=8 python bench.py
# tighter walking majorants (supergrid 8^3=512 / 16^3=4096 cells)
run maj8_cs6    $B BENCH_GATE=0 BENCH_MAJ=8 UIVR_CROSS_STEPS=6 python bench.py
run maj4_cs6    $B BENCH_GATE=0 BENCH_MAJ=4 UIVR_KERNEL_TM=4096 UIVR_CROSS_STEPS=6 python bench.py
run maj4_cs8    $B BENCH_GATE=0 BENCH_MAJ=4 UIVR_KERNEL_TM=4096 UIVR_CROSS_STEPS=8 python bench.py
echo "queue done"
