#!/bin/bash
# Waits for the axon relay to come back (probe every 7 min), then runs the
# remaining round-3 TPU work in priority order given the long outage:
# one persistent-scheduler bench (decides the default flip), then the
# janga-smoke DRT completion, then secondary items if time remains.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue_r3c
mkdir -p "$LOG" /tmp/tpu_queue_r3d

probe() {
    timeout 240 python -c "import jax; jax.devices(); import jax.numpy as jnp; print(float(jnp.arange(4.).sum()))" > /dev/null 2>&1
}

until probe; do echo "relay down $(date)"; sleep 380; done
echo "relay healthy $(date)"

run() {
    local name=$1; shift
    echo "== $name: $* ($(date))"
    ( "$@" > "$LOG/$name.log" 2>&1; echo "EXIT=$?" >> "$LOG/$name.log" )
    grep -v -i warning "$LOG/$name.log" | tail -3
}

B="timeout 2400 env BENCH_PARITY=0 BENCH_ITERS=4 BENCH_GATE=0"

run pers_w256_r8 $B UIVR_PERSIST=1 UIVR_PERSIST_W=262144 UIVR_PERSIST_R=8 python bench.py

bash scripts/tpu_queue_r3d.sh

run cls_cs4 $B python bench.py
run pers_w512_r8 $B UIVR_PERSIST=1 UIVR_PERSIST_W=524288 UIVR_PERSIST_R=8 python bench.py
run bigenv_2m timeout 3600 env BIGENV_H=1024 python -u scripts/tpu_check_bigenv.py
echo "supervisor done $(date)"
