"""Standalone render CLI: render any registered scene/sensor to EXR.

    python -m uivr_tpu.cli.render --scene janga-smoke --sensor 0 \
        --integrator volpathsimple-drt --spp 64 --out render.exr

Renders either the ground-truth grids (default) or a checkpoint
(``--checkpoint DIR --prefix final``).  The reference exposes this only
implicitly through its preview machinery (optimize.py:110-131).
"""
from __future__ import annotations

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", default="tiny-cube")
    ap.add_argument("--integrator", default="volpathsimple-drt")
    ap.add_argument("--sensor", type=int, default=0)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--out", default="render.exr")
    ap.add_argument("--checkpoint", default=None,
                    help="load grids from this params/ dir instead of GT")
    ap.add_argument("--prefix", default="final")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="film resolution scale")
    args = ap.parse_args(argv)

    from ..config.registry import get_int_config, get_scene_config
    from ..core import exr_io
    from ..opt import load_checkpoint
    from ..render import RenderSettings, render_image

    preset = get_scene_config(args.scene)
    bundle = preset.build()
    if args.scale != 1.0:
        bundle.film_size = (max(8, int(bundle.film_size[0] * args.scale)),
                            max(8, int(bundle.film_size[1] * args.scale)))
    int_cfg = get_int_config(args.integrator).create(max_depth=preset.max_depth)
    params = bundle.params
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint, args.prefix)
        print(f"[render] loaded {args.prefix} checkpoint from {args.checkpoint}")
    st = RenderSettings(integrator=int_cfg, medium=bundle.medium_cfg,
                        film_size=bundle.film_size, spp=args.spp,
                        spp_grad=args.spp)
    t0 = time.time()
    img = render_image(st, params, bundle.emitter, bundle.cameras,
                       args.sensor, seed=args.seed, spp=args.spp,
                       medium_to_world=bundle.to_world)
    dt = time.time() - t0
    exr_io.write_exr(args.out, img)
    W, H = bundle.film_size
    rays = W * H * args.spp
    print(f"[render] {args.out}: {W}x{H} @ {args.spp} spp in {dt:.1f}s "
          f"({rays / dt / 1e6:.3f} Mrays/s), mean={img.mean():.4f}")


if __name__ == "__main__":
    main()
