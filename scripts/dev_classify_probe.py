"""Measure the in-kernel collision-classification rate of a per-subcell
sigma upper-bound table (VERDICT r2 item 1 / PLAN round-3 lever).

At a MAIN-walk collision candidate, delta tracking decides real-vs-null by
u < sigma(x)/sigma_maj.  With a conservative per-subcell bound
hi >= sigma(x) resident in VMEM, the event is NULL whenever
u*sigma_maj >= hi — WITHOUT the XLA sigma row gather (realization-identical
to the flat engine because hi >= sigma implies the same decision).  SHADOW
ratio-tracking collisions need sigma's VALUE, except hi == 0 cells where the
ratio factor is exactly 1.  This probe replays the flat engine on CPU and
reports the expected classified fraction per event class and the resulting
fetch-events/lane, for several subcell grid sizes.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/dev_classify_probe.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from uivr_tpu.config import smoke_scene
from uivr_tpu.core.grids import build_bound_grid, majorant_dims
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.integrators import volpath_flat as vf
from uivr_tpu.core.rng import make_lane_sampler
from uivr_tpu.scene import Scene, finalize_medium


def main(factor=16, shadow_rr=0.05, n=8192, seed=1, max_depth=32, rr_depth=8,
         scene="bench"):
    if scene == "bench":
        b = smoke_scene(res=64, resx=128, resy=128, n_sensors=4,
                        majorant_factor=factor)
    else:
        # REAL production media (VERDICT r4 next #3): the XML ground-truth
        # bundle, at the walking factor finalize_medium actually gives the
        # kernel (requested factor auto-coarsened to the VMEM budget)
        from uivr_tpu.config.registry import get_scene_config
        b = get_scene_config(scene).build_ref()
        nsens = b.cameras.n_sensors
    m = finalize_medium(b.params, b.medium_cfg, b.to_world)
    sc = Scene(medium=m, emitter=b.emitter, cameras=b.cameras)
    cfg = VolpathConfig(max_depth=max_depth, rr_depth=rr_depth,
                        shadow_rr=shadow_rr)

    shp = m.params.sigma_t.shape
    tables = {}
    for fs in (2, 4, 8):
        dims = majorant_dims(shp, fs)
        hi = build_bound_grid(jnp.abs(m.params.sigma_t), dims) * m.scale
        tables[fs] = (dims, jnp.asarray(hi))
        print(f"subcell fs={fs}: dims={dims} cells={int(np.prod(dims))} "
              f"chunks={-(-int(np.prod(dims)) // 128)}")

    def hi_at(fs, p):
        dims, hi = tables[fs]
        res = jnp.array([dims[2], dims[1], dims[0]], jnp.float32)
        idx = jnp.clip((jnp.clip(p, 0.0, 1.0 - 1e-7) * res).astype(jnp.int32),
                       0, jnp.array([d - 1 for d in (dims[2], dims[1],
                                                     dims[0])], jnp.int32))
        return hi[idx[..., 2], idx[..., 1], idx[..., 0]]

    from uivr_tpu.render import sample_batch_pixels
    from uivr_tpu.scene.camera import sample_rays
    n_sens = b.cameras.n_sensors if scene != "bench" else 4
    W_, H_ = b.film_size if scene != "bench" else (128, 128)
    sensor_idx, pixels = sample_batch_pixels(jnp.uint32(seed), n_sens,
                                             (W_, H_), n)
    uv = ((pixels.astype(jnp.float32) + 0.5)
          / jnp.array([W_, H_], jnp.float32))
    o_w, d_w = sample_rays(b.cameras, sensor_idx, uv)
    smp = make_lane_sampler(jnp.uint32(seed), n_lanes=n)
    carry = vf._init_carry(sc, o_w, d_w, smp, None)

    step = jax.jit(lambda c: vf._flat_step(cfg, sc, c))
    his = {fs: jax.jit(lambda p, _fs=fs: hi_at(_fs, p)) for fs in tables}

    # accumulators (expected counts over the u-draw, which is uniform):
    acc = {k: 0.0 for k in
           ["main_coll", "main_null", "main_cls", "sh_coll", "sh_cls",
            "real", "fin", "cross"]}
    cls_fs = {fs: dict(main=0.0, sh=0.0) for fs in tables}
    it = 0
    while True:
        mode = np.asarray(carry.mode)
        if (mode == vf.DONE).all() or it > 5000:
            break
        carry2, ev = step(carry)
        is_main = mode == vf.MAIN
        is_sh = mode == vf.SHADOW
        coll = np.asarray(ev.collided)
        fin = np.asarray(ev.fin_seg)
        smaj = np.asarray(ev.sigma_maj)
        sig = np.asarray(ev.sig)
        p = np.asarray(ev.p)
        mc = is_main & coll
        shc = is_sh & coll
        acc["main_coll"] += mc.sum()
        acc["sh_coll"] += shc.sum()
        acc["real"] += np.asarray(ev.real).sum()
        acc["fin"] += ((is_main | is_sh) & fin).sum()
        acc["cross"] += ((is_main | is_sh) & ~coll & ~fin).sum()
        # expected null fraction (true)
        with np.errstate(divide="ignore", invalid="ignore"):
            pn = np.clip(1.0 - sig / np.maximum(smaj, 1e-20), 0.0, 1.0)
        acc["main_null"] += (pn * mc).sum()
        for fs in tables:
            hi = np.asarray(his[fs](ev.p))
            pcls = np.clip(1.0 - hi / np.maximum(smaj, 1e-20), 0.0, 1.0)
            cls_fs[fs]["main"] += (pcls * mc).sum()
            cls_fs[fs]["sh"] += ((hi == 0.0) & shc).sum()
        carry = carry2
        it += 1

    per = {k: v / n for k, v in acc.items()}
    print(f"\niters={it}  per-lane: main_coll={per['main_coll']:.2f} "
          f"(true-null {per['main_null']:.2f}, real {per['real']:.2f}) "
          f"sh_coll={per['sh_coll']:.2f} fin={per['fin']:.2f} "
          f"cross={per['cross']:.2f}")
    base_fetch = per["main_coll"] + per["sh_coll"]
    for fs in tables:
        mc = cls_fs[fs]["main"] / n
        shc = cls_fs[fs]["sh"] / n
        fetch = base_fetch - mc - shc
        print(f"fs={fs}: classified main {mc:.2f}/{per['main_coll']:.2f} "
              f"({100*mc/max(per['main_coll'],1e-9):.0f}% of colls, "
              f"{100*mc/max(per['main_null'],1e-9):.0f}% of nulls), "
              f"shadow {shc:.2f}/{per['sh_coll']:.2f} "
              f"({100*shc/max(per['sh_coll'],1e-9):.0f}%); "
              f"fetch-events/lane {base_fetch:.2f} -> {fetch:.2f}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=16)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--shadow-rr", type=float, default=0.05)
    ap.add_argument("--scene", default="bench",
                    help="bench | janga-smoke | dust-devil (XML GT media)")
    a = ap.parse_args()
    main(factor=a.factor, n=a.n, shadow_rr=a.shadow_rr, scene=a.scene)
