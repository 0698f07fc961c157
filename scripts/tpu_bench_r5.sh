#!/bin/bash
# Round-5 bench window (VERDICT r4 next #2/#6): reconciliation A/B, knob
# sweeps, gather count-x-width matrix.  Run while NO other TPU process is
# active.  Gate off for sweeps (it ran green in r3/r4 and BENCH_r05 runs
# it again); each line is a fresh process.
set -u
export JAX_CACHE_DIR=/tmp/jax_cache
export BENCH_GATE=0
log=${1:-/tmp/bench_r5.log}
: > "$log"

r() {  # r <tag> [ENV=V ...]
    tag=$1; shift
    echo "== $tag  $(date +%H:%M:%S)" | tee -a "$log"
    env "$@" timeout 1500 python bench.py 2>>"$log" | tee -a "$log"
}

# --- reconciliation: parity at driver defaults vs the iters=4 the round-4
#     narrative used (densification makes later scan iters slower)
r parity-iters10 BENCH_PARITY=1
r parity-iters4  BENCH_PARITY=1 BENCH_PARITY_ITERS=4

# --- adjoint knobs at parity (driver-default iters)
r parity-defertc BENCH_PARITY=1 UIVR_DEFER_TC=1
r parity-W131k   BENCH_PARITY=1 UIVR_PERSIST_W=131072
r parity-W32k    BENCH_PARITY=1 UIVR_PERSIST_W=32768

# --- tuned knobs
r tuned-R2 BENCH_PARITY=0 UIVR_PERSIST_R=2
r tuned-R3 BENCH_PARITY=0 UIVR_PERSIST_R=3

# --- gather count-x-width matrix (ceiling bound data)
echo "== gather-matrix $(date +%H:%M:%S)" | tee -a "$log"
timeout 2400 python scripts/probe_gather_matrix.py 2>&1 | tee -a "$log"
