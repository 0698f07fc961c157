"""Produce an EXTERNAL reference set for a surface-scene experiment
(VERDICT r4 next #5).

The reference repo's astronaut/rover/tree-2 reference images come from an
independent renderer (Mitsuba's `path` integrator over the surface ref
scene, scene_config.py:199-221 + optimize.py:56-71); the real surface
assets are not in this environment, so the DOCUMENTED STAND-IN is the
procedural volume ref scene rendered by the FLAT XLA engine — a different
engine/code path from the pallas engine the optimization trains with, so
the --references ingestion is driven by images the training engine never
produced (the property the external-reference protocol actually needs).

    python scripts/make_external_refs.py --config astronaut-rotated \
        --out outputs_r5/ext-refs/astronaut-rotated --spp 256
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from dataclasses import replace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="astronaut-rotated")
    ap.add_argument("--out", required=True)
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--film-scale", type=float, default=1.0)
    ap.add_argument("--shadow-rr", type=float, default=0.05)
    args = ap.parse_args()

    from uivr_tpu.config.registry import get_int_config, get_scene_config
    from uivr_tpu.core import exr_io
    from uivr_tpu.render import RenderSettings
    from uivr_tpu.render.batched import render_image

    preset = get_scene_config(args.config)
    b = preset.build_ref()
    if args.film_scale != 1.0:
        W, H = b.film_size
        b.film_size = (max(16, int(W * args.film_scale)),
                       max(16, int(H * args.film_scale)))
    W, H = b.film_size

    ref_int = get_int_config("volpathsimple-basic").create(
        max_depth=preset.max_depth)
    # independent-renderer stand-in: FLAT engine, stock rr_depth=5
    ref_int = replace(ref_int, rr_depth=5, engine="flat",
                      shadow_rr=args.shadow_rr)
    settings = RenderSettings(integrator=ref_int, medium=b.medium_cfg,
                              film_size=b.film_size, spp=args.spp,
                              spp_grad=args.spp)

    sensors = list(b.sensors) if b.sensors else list(
        range(b.cameras.n_sensors))
    os.makedirs(args.out, exist_ok=True)
    for s in sensors:
        fname = os.path.join(args.out, f"ref_{s:06d}.exr")
        if os.path.isfile(fname):
            continue
        t0 = time.time()
        img = render_image(settings, b.params, b.emitter, b.cameras, s,
                           seed=4321, spp=args.spp,
                           medium_to_world=b.to_world)
        exr_io.write_exr(fname, img)
        print(f"[ext-ref] sensor {s}: {W}x{H}x{args.spp}spp "
              f"{time.time()-t0:.1f} s mean={np.mean(img):.4f}", flush=True)
    print(f"[ext-ref] {len(sensors)} frames in {args.out}")


if __name__ == "__main__":
    main()
