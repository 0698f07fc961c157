"""Finite-difference gradient validation CLI (reference: python/fd.py usage
through tests; here exposed as a standalone driver).

    python -m uivr_tpu.cli.fd --scene tiny-cube --integrator volpathsimple-drt \
        --spp 512 --eps 5e-3 --out outputs/fd

Writes per-grid FD and adjoint gradients as .npy plus a JSON agreement
summary.
"""
from __future__ import annotations

import argparse
import json
import os
from os.path import join

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", default="tiny-cube")
    ap.add_argument("--integrator", default="volpathsimple-drt")
    ap.add_argument("--spp", type=int, default=128)
    ap.add_argument("--eps", type=float, default=5e-3)
    ap.add_argument("--res", type=int, default=16, help="image res")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--out", default="outputs/fd")
    ap.add_argument("--keys", nargs="+",
                    default=["sigma_t", "albedo", "emission"])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..config.registry import get_int_config, get_scene_config
    from ..render import RenderSettings, make_render
    from ..validation import fd_gradients

    preset = get_scene_config(args.scene)
    bundle = preset.build()
    int_cfg = get_int_config(args.integrator).create(
        max_depth=preset.max_depth)
    st = RenderSettings(integrator=int_cfg, medium=bundle.medium_cfg,
                        film_size=bundle.film_size, spp=args.spp,
                        spp_grad=args.spp)
    render = make_render(st, bundle.to_world)

    r = args.res
    W, H = bundle.film_size
    xs, ys = np.meshgrid(np.linspace(0, W - 1, r).astype(np.int32),
                         np.linspace(0, H - 1, r).astype(np.int32))
    pixels = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1))
    sidx = jnp.zeros((pixels.shape[0],), jnp.int32)
    seed = jnp.uint32(args.seed)
    seed_grad = jnp.uint32(args.seed + 1)

    @jax.jit
    def loss(params):
        img = render(params, bundle.emitter, bundle.cameras, sidx, pixels,
                     seed, seed_grad)
        return jnp.mean(jnp.square(img - 0.5))

    print(f"[fd] adjoint gradients ({args.integrator})...")
    g = jax.jit(jax.grad(loss))(bundle.params)
    print(f"[fd] finite differences over "
          f"{sum(np.asarray(getattr(bundle.params, k)).size for k in args.keys)}"
          f" entries (eps={args.eps})...")
    fd = fd_gradients(lambda p: loss(p), bundle.params, eps=args.eps,
                      keys=tuple(args.keys))

    os.makedirs(args.out, exist_ok=True)
    summary = {}
    for k in args.keys:
        ga = np.asarray(getattr(g, k))
        gf = fd[k]
        np.save(join(args.out, f"adjoint_{k}.npy"), ga)
        np.save(join(args.out, f"fd_{k}.npy"), gf)
        scale = max(np.abs(gf).max(), 1e-12)
        # corrcoef is 0/0 when either side is identically zero (e.g. the
        # emission grid under a non-emissive estimator); both-zero means
        # exact agreement, not undefined
        if ga.std() == 0.0 or gf.std() == 0.0:
            corr = 1.0 if np.array_equal(ga, gf) else 0.0
        else:
            corr = float(np.corrcoef(ga.ravel(), gf.ravel())[0, 1])
        summary[k] = {
            "corr": corr,
            "median_rel_err": float(np.median(np.abs(ga - gf)) / scale),
            "max_rel_err": float(np.abs(ga - gf).max() / scale),
        }
        print(f"  {k}: {summary[k]}")
    with open(join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"[fd] wrote {args.out}")


if __name__ == "__main__":
    main()
