#!/bin/bash
# Round-4 TPU queue B: production reproductions (VERDICT r3 next 3/4/6).
#   1. janga-smoke (procedural stand-in, resumes outputs_r2): references
#      re-rendered at 1024 spp (the stale 128-spp cache now triggers a
#      refresh), then the volpathsimple-drt stage runs to its 600/600
#      (--scale 0.1) completion.  UIVR_SCENE_DIR points away from ./scenes
#      so the round-2 checkpoint state keeps its procedural scene.
#   2. janga-smoke XML-ingestion run on hardware: real 264x136x136 .vol +
#      2k .hdr + 64-sensor rig XML (scripts/make_scene_assets.py) at
#      --film-scale 0.25, fresh outputs_r4/janga-xml.
#   3. dust-devil XML run (256^3, 4k-class envmap): breadth.
#   4. janga-smoke-from-nerf variant (warm start from the completed nerf
#      stage in outputs_r2): breadth.
# All runs use --retries (fresh-process resume over relay flakes) and are
# sequential: ONE process on the relay at a time.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_queue_r4b}
mkdir -p "$LOG"

run() {
    local name=$1; shift
    echo "== $name ($(date +%H:%M:%S))"
    ( "$@" > "$LOG/$name.log" 2>&1; echo "EXIT=$?" >> "$LOG/$name.log" )
    grep -v -i warning "$LOG/$name.log" | tail -2
}

run janga_complete timeout 14000 env UIVR_SCENE_DIR=/nonexistent UIVR_RENDER_CHUNK=262144 \
    python -m uivr_tpu.cli.reproduce \
    --config janga-smoke --integrator nerf volpathsimple-drt \
    --scale 0.1 --ref-spp 1024 --outputs outputs_r2 \
    --retries 40 --scan-stride 1

run janga_xml timeout 10000 env UIVR_RENDER_CHUNK=262144 python -m uivr_tpu.cli.reproduce \
    --config janga-smoke --integrator nerf volpathsimple-drt \
    --scale 0.05 --film-scale 0.25 --ref-spp 256 --outputs outputs_r4/xml \
    --retries 20 --scan-stride 1

run dust_devil_xml timeout 10000 env UIVR_RENDER_CHUNK=262144 python -m uivr_tpu.cli.reproduce \
    --config dust-devil --integrator nerf volpathsimple-drt \
    --scale 0.05 --film-scale 0.25 --ref-spp 256 --outputs outputs_r4/xml \
    --retries 20 --scan-stride 1

# -from-nerf shares the base scene's reference images (same scene family;
# avoids a second 1024-spp reference render)
mkdir -p outputs_r2/janga-smoke-from-nerf
ln -sfn ../janga-smoke/references outputs_r2/janga-smoke-from-nerf/references

run janga_from_nerf timeout 8000 env UIVR_SCENE_DIR=/nonexistent UIVR_RENDER_CHUNK=262144 \
    python -m uivr_tpu.cli.reproduce \
    --config janga-smoke-from-nerf --integrator volpathsimple-drt \
    --scale 0.05 --ref-spp 1024 --outputs outputs_r2 \
    --retries 20 --scan-stride 1

echo "queue B done ($(date +%H:%M:%S))"
