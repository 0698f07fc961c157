#!/bin/bash
# Round-5 breadth queue (VERDICT r4 next #4/#5): runs AFTER the flagship
# janga-smoke completion + bench window.  One TPU process at a time;
# every stage is resumable (per-frame ref sidecars + 50-iter full-state
# checkpoints).  Ordered by marginal value per TPU-minute: astronaut
# closes the never-exercised surface-scene family, from-nerf closes the
# warm-start family, dust-devil (the longest: 63 refs on the dense 256^3
# GT) runs last and is resumable if the round window closes on it.
#
#   bash scripts/tpu_queue_r5.sh [outputs_root]
set -u
OUT=${1:-outputs_r5/xml}
export JAX_CACHE_DIR=/tmp/jax_cache
export UIVR_RENDER_CHUNK=${UIVR_RENDER_CHUNK:-1048576}

run() {
    echo "=== $(date +%H:%M:%S) $*" >&2
    timeout "$T" python -m uivr_tpu.cli.reproduce "$@"
    echo "=== rc=$? $(date +%H:%M:%S)" >&2
}

# 1. astronaut-rotated via the EXTERNAL references protocol: flat-engine
#    stand-in refs (make_external_refs.py), then nerf -> drt driven from
#    --references — the last untouched reference experiment family.
timeout 1800 python scripts/make_external_refs.py --config astronaut-rotated \
    --out "$OUT/ext-refs/astronaut-rotated" --spp 128 --film-scale 0.5
T=3600
run --config astronaut-rotated --integrator nerf volpathsimple-drt \
    --scale 0.05 --film-scale 0.5 --shadow-rr 0.05 \
    --references "$OUT/ext-refs/astronaut-rotated" \
    --outputs "$OUT" --retries 10 --scan-stride 1

# 2. janga-smoke-from-nerf: warm-start the DRT stage from the flagship's
#    COMPLETED 600-iter nerf checkpoints; reuse the flagship's 1024-spp
#    reference cache (same ref scene + film) via a symlink instead of
#    re-rendering 62 frames.  No upsampling (reference override): full-res
#    256-class iterations throughout.
mkdir -p "$OUT/janga-smoke-from-nerf"
if [ ! -e "$OUT/janga-smoke-from-nerf/references" ]; then
    ln -s ../janga-smoke/references "$OUT/janga-smoke-from-nerf/references"
fi
T=6000
run --config janga-smoke-from-nerf --integrator volpathsimple-drt \
    --scale 0.05 --film-scale 0.25 --ref-spp 1024 --shadow-rr 0.05 \
    --outputs "$OUT" --retries 20 --scan-stride 1

# 3. dust-devil through the real XML assets (256^3 GT grid, 4k envmap,
#    factor-32 auto-coarsen).  128-spp refs at 1/8 film keep the 63-frame
#    reference pass inside the window; stages resume if the round ends.
T=7200
run --config dust-devil --integrator nerf volpathsimple-drt \
    --scale 0.05 --film-scale 0.125 --ref-spp 128 --shadow-rr 0.05 \
    --outputs "$OUT" --retries 20 --scan-stride 1
