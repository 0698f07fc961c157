#!/bin/bash
# Round-5 unattended tail chain: wait for the flagship DRT supervisor
# (PID $1) to exit, then eval -> bench reconciliation -> breadth queue.
set -u
PID=$1
OUT=outputs_r5/xml
export JAX_CACHE_DIR=/tmp/jax_cache

while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "=== flagship done $(date +%H:%M:%S)" >&2

# 1. per-sensor PSNR vs the 1024-spp refs + grid error (VERDICT #1 'done')
UIVR_RENDER_CHUNK=1048576 timeout 1800 python scripts/eval_final.py \
    "$OUT/janga-smoke/volpathsimple-drt" --config janga-smoke \
    --refs "$OUT/janga-smoke/references" --spp 64 --chunk 1048576 \
    --out "$OUT/janga-smoke/eval_drt.json" > /tmp/eval_drt.log 2>&1
echo "=== eval done rc=$? $(date +%H:%M:%S)" >&2

# 2. bench reconciliation + ceiling matrix (VERDICT #2), trimmed
export BENCH_GATE=0
log=/tmp/bench_r5.log
: > "$log"
r() { tag=$1; shift; echo "== $tag $(date +%H:%M:%S)" >> "$log"; \
     env "$@" timeout 1500 python bench.py >> "$log" 2>&1; }
r parity-iters10 BENCH_PARITY=1
r parity-iters4  BENCH_PARITY=1 BENCH_PARITY_ITERS=4
r parity-defertc BENCH_PARITY=1 UIVR_DEFER_TC=1
echo "== gather-matrix $(date +%H:%M:%S)" >> "$log"
timeout 2400 python scripts/probe_gather_matrix.py >> "$log" 2>&1
echo "=== bench window done $(date +%H:%M:%S)" >&2

# 3. breadth queue (astronaut -> from-nerf -> dust-devil), runs until the
#    round window closes; every stage resumable
bash scripts/tpu_queue_r5.sh "$OUT" > /tmp/queue_r5.log 2>&1
