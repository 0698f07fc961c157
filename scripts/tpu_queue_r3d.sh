#!/bin/bash
# Round-3 TPU queue D: finish the janga-smoke volpathsimple-drt stage
# (VERDICT r2 item 2) — resumes outputs_r2 state from iter 350 and runs
# through the 384-iter upsample + Last25 LR drops to 600/600, rendering
# 64-spp final previews.  The nerf stage skips via its final checkpoint;
# references load from the cached EXRs.  --retries supervises fresh-process
# resume over relay flakes.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_queue_r3d}
mkdir -p "$LOG"
echo "== janga resume $(date)"
timeout 21000 python -m uivr_tpu.cli.reproduce \
    --config janga-smoke --integrator nerf volpathsimple-drt \
    --scale 0.1 --ref-spp 128 --outputs outputs_r2 \
    --retries 40 --scan-stride 1 > "$LOG/janga.log" 2>&1
echo "EXIT=$?"
tail -5 "$LOG/janga.log"
echo "queue D done $(date)"
