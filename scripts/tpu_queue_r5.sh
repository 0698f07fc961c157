#!/bin/bash
# Round-5 breadth queue (VERDICT r4 next #4/#5): runs AFTER the flagship
# janga-smoke completion.  One TPU process at a time; every stage is
# resumable (per-frame ref sidecars + 50-iter full-state checkpoints).
#
#   bash scripts/tpu_queue_r5.sh [outputs_root]
set -u
OUT=${1:-outputs_r5/xml}
export JAX_CACHE_DIR=/tmp/jax_cache
export UIVR_RENDER_CHUNK=${UIVR_RENDER_CHUNK:-1048576}

run() {
    echo "=== $(date +%H:%M:%S) $*" >&2
    timeout 5400 python -m uivr_tpu.cli.reproduce "$@"
    echo "=== rc=$? $(date +%H:%M:%S)" >&2
}

# 1. janga-smoke-from-nerf: warm-start the DRT stage from the flagship's
#    nerf checkpoints; reuse the flagship's 1024-spp reference cache (same
#    ref scene + film) via a symlink instead of re-rendering 62 frames.
mkdir -p "$OUT/janga-smoke-from-nerf"
if [ ! -e "$OUT/janga-smoke-from-nerf/references" ]; then
    ln -s ../janga-smoke/references "$OUT/janga-smoke-from-nerf/references"
fi
run --config janga-smoke-from-nerf --integrator volpathsimple-drt \
    --scale 0.05 --film-scale 0.25 --ref-spp 1024 --shadow-rr 0.05 \
    --outputs "$OUT" --retries 20 --scan-stride 1

# 2. dust-devil through the real XML assets (256^3 GT grid, 4k envmap,
#    factor-32 auto-coarsen).  Smaller smoke scale: the deliverable is a
#    completed run dir with decreasing losses + final checkpoints.
run --config dust-devil --integrator nerf volpathsimple-drt \
    --scale 0.05 --film-scale 0.125 --ref-spp 256 --shadow-rr 0.05 \
    --outputs "$OUT" --retries 20 --scan-stride 1

# 3. astronaut-rotated via the EXTERNAL references protocol: flat-engine
#    stand-in refs (make_external_refs.py), then nerf -> drt driven from
#    --references — the last untouched reference experiment family.
python scripts/make_external_refs.py --config astronaut-rotated \
    --out "$OUT/ext-refs/astronaut-rotated" --spp 256
run --config astronaut-rotated --integrator nerf volpathsimple-drt \
    --scale 0.05 --shadow-rr 0.05 \
    --references "$OUT/ext-refs/astronaut-rotated" \
    --outputs "$OUT" --retries 10 --scan-stride 1
