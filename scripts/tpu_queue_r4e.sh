#!/bin/bash
# Round-4 TPU queue E: XML-ingestion + breadth runs (VERDICT r3 next 4/6),
# sized to the end-of-round TPU window.  Run AFTER janga_complete frees
# the chip.  Film scale 0.125 keeps the reference renders ~9 min while
# still exercising the full production-resolution grids (264^3-class
# volumes, 2k HDR deferred NEE, majorant auto-coarsening) through the
# real XML branch on hardware; --scale 0.02 = 120 iterations per stage.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_queue_r4e}
mkdir -p "$LOG"

run() {
    local name=$1; shift
    echo "== $name ($(date +%H:%M:%S))"
    ( "$@" > "$LOG/$name.log" 2>&1; echo "EXIT=$?" >> "$LOG/$name.log" )
    grep -v -i warning "$LOG/$name.log" | tail -2
}

run janga_xml timeout 4000 env UIVR_RENDER_CHUNK=262144 \
    python -u -m uivr_tpu.cli.reproduce \
    --config janga-smoke --integrator nerf volpathsimple-drt \
    --scale 0.02 --film-scale 0.125 --ref-spp 256 --outputs outputs_r4/xml \
    --retries 10 --scan-stride 1

# The round-2 nerf finals lost their albedo/emission .vol files (bulk
# binaries were untracked; the machine reset kept only the tracked
# sigma_t).  The reference's -from-nerf warm start loads ALL THREE grids
# (scene_config.py:130-132), so re-run the 600-iter nerf stage (~17 min)
# against the fresh 1024-spp references to regenerate complete finals.
rm -f outputs_r2/janga-smoke/nerf/params/final-medium1_sigma_t.vol
run janga_nerf_refresh timeout 2500 env UIVR_SCENE_DIR=/nonexistent UIVR_RENDER_CHUNK=262144 \
    python -u -m uivr_tpu.cli.reproduce \
    --config janga-smoke --integrator nerf \
    --scale 0.1 --ref-spp 1024 --outputs outputs_r2 \
    --retries 10 --scan-stride 1

# -from-nerf warm-starts from the regenerated nerf stage and shares the
# base scene's 1024-spp references (same scene family)
mkdir -p outputs_r2/janga-smoke-from-nerf
ln -sfn ../janga-smoke/references outputs_r2/janga-smoke-from-nerf/references

run janga_from_nerf timeout 3000 env UIVR_SCENE_DIR=/nonexistent UIVR_RENDER_CHUNK=262144 \
    python -u -m uivr_tpu.cli.reproduce \
    --config janga-smoke-from-nerf --integrator volpathsimple-drt \
    --scale 0.02 --ref-spp 1024 --outputs outputs_r2 \
    --retries 10 --scan-stride 1

run dust_devil_xml timeout 4000 env UIVR_RENDER_CHUNK=262144 \
    python -u -m uivr_tpu.cli.reproduce \
    --config dust-devil --integrator nerf volpathsimple-drt \
    --scale 0.02 --film-scale 0.125 --ref-spp 256 --outputs outputs_r4/xml \
    --retries 10 --scan-stride 1

echo "queue E done ($(date +%H:%M:%S))"
