"""Final-reconstruction evaluation (VERDICT r3 next item 3's reporting
half): render a completed run's final checkpoint at every calibrated
sensor and report per-sensor PSNR against the run's cached reference
images, plus the recovered-vs-GT grid error — the honest end-of-run
numbers for RESULTS.md (the reference repo's observable is preview images
only; this is the quantitative equivalent).

Run ON the TPU after a stage completes:

    python scripts/eval_final.py outputs_r2/janga-smoke/volpathsimple-drt \
        --config janga-smoke --refs outputs_r2/janga-smoke/references \
        [--scene-dir /nonexistent] [--spp 64]

Prints one JSON line: {"per_sensor_psnr": {...}, "psnr_mean": ..,
"psnr_min": .., "grid_rel_l1_vs_gt": .., ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--config", required=True)
    ap.add_argument("--refs", required=True,
                    help="directory of ref_%%06d.exr the run trained against")
    ap.add_argument("--scene-dir", default=None)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--integrator", default="volpathsimple-basic",
                    help="primal estimator for the evaluation renders")
    ap.add_argument("--chunk", type=int,
                    default=int(os.environ.get("UIVR_RENDER_CHUNK", 262144)))
    ap.add_argument("--out", default=None,
                    help="also write the JSON record to this file")
    args = ap.parse_args()
    if args.scene_dir is not None:
        os.environ["UIVR_SCENE_DIR"] = args.scene_dir

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from uivr_tpu.config.registry import get_int_config, get_scene_config
    from uivr_tpu.core.exr_io import read_exr
    from uivr_tpu.core.grids import resize_trilinear
    from uivr_tpu.core.vol_io import read_vol
    from uivr_tpu.opt import load_checkpoint
    from uivr_tpu.opt.losses import psnr as psnr_fn
    from uivr_tpu.render import RenderSettings
    from uivr_tpu.render.batched import render_image

    preset = get_scene_config(args.config)
    bundle = preset.build()
    params = load_checkpoint(os.path.join(args.run_dir, "params"), "final")

    sensors = list(bundle.sensors) if bundle.sensors else \
        list(range(bundle.cameras.n_sensors))
    # film must match the stored references (runs may use --film-scale)
    ref0 = read_exr(os.path.join(args.refs, f"ref_{sensors[0]:06d}.exr"))
    H, W = ref0.shape[:2]
    bundle.film_size = (W, H)

    cfg = get_int_config(args.integrator).create(max_depth=preset.max_depth)
    st = RenderSettings(integrator=cfg, medium=bundle.medium_cfg,
                        film_size=bundle.film_size, spp=args.spp,
                        spp_grad=args.spp)

    per_sensor = {}
    for s in sensors:
        ref = read_exr(os.path.join(args.refs, f"ref_{s:06d}.exr"))
        img = render_image(st, params, bundle.emitter, bundle.cameras, s,
                           seed=97531, spp=args.spp, chunk=args.chunk,
                           medium_to_world=bundle.to_world)
        per_sensor[s] = round(float(psnr_fn(jnp.asarray(img),
                                            jnp.asarray(ref))), 3)
        print(f"[eval] sensor {s:3d}: psnr {per_sensor[s]:.2f} dB",
              flush=True)

    vals = np.array(list(per_sensor.values()))
    rec = {"run": args.run_dir, "config": args.config, "eval_spp": args.spp,
           "n_sensors": len(sensors),
           "psnr_mean": round(float(vals.mean()), 3),
           "psnr_min": round(float(vals.min()), 3),
           "psnr_max": round(float(vals.max()), 3),
           "per_sensor_psnr": per_sensor}

    # recovered-vs-GT grid error (GT resampled to the optimized resolution)
    fin = os.path.join(args.run_dir, "params", "final-medium1_sigma_t.vol")
    if os.path.isfile(fin):
        gt = np.asarray(preset.build_ref().params.sigma_t)
        data, _ = read_vol(fin)
        gt_r = np.asarray(resize_trilinear(jnp.asarray(gt), data.shape[:3]))
        rec["grid_rel_l1_vs_gt"] = round(
            float(np.abs(data - gt_r).sum() / max(gt_r.sum(), 1e-9)), 4)
        rec["final_grid_shape"] = list(data.shape)

    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
