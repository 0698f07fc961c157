"""Measure the per-mode event composition of the flat engine on the bench
scene: how many MAIN-walk collisions / crossings vs SHADOW-walk collisions /
crossings / real scatters make up the per-lane event budget.  This decides
which event-reduction lever (residual tracking on shadow walks vs main-walk
decomposition vs NEE changes) is worth building.

Run on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/dev_event_split.py
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from uivr_tpu.config import smoke_scene
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.integrators import volpath_flat as vf
from uivr_tpu.core.rng import make_lane_sampler
from uivr_tpu.scene import Scene, finalize_medium


def main(factor=16, shadow_rr=0.05, n=8192, seed=1):
    b = smoke_scene(res=64, resx=128, resy=128, n_sensors=4,
                    majorant_factor=factor)
    m = finalize_medium(b.params, b.medium_cfg, b.to_world)
    sc = Scene(medium=m, emitter=b.emitter, cameras=b.cameras)
    cfg = VolpathConfig(max_depth=32, rr_depth=8, shadow_rr=shadow_rr)

    from uivr_tpu.render import sample_batch_pixels
    from uivr_tpu.scene.camera import sample_rays
    sensor_idx, pixels = sample_batch_pixels(jnp.uint32(seed), 4,
                                             (128, 128), n)
    uv = (pixels.astype(jnp.float32) + 0.5) / 128.0
    o_w, d_w = sample_rays(b.cameras, sensor_idx, uv)
    smp = make_lane_sampler(jnp.uint32(seed), n_lanes=n)
    carry = vf._init_carry(sc, o_w, d_w, smp, None)

    step = jax.jit(lambda c: vf._flat_step(cfg, sc, c))

    keys = ("main_coll", "main_cross", "main_fin", "sh_coll", "sh_cross",
            "sh_fin", "real", "scat")
    acc = {k: np.zeros(n, np.int64) for k in keys}
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
        cross = ~coll & ~fin & (is_main | is_sh)
        acc["main_coll"] += (is_main & coll)
        acc["main_cross"] += (is_main & cross)
        acc["main_fin"] += (is_main & fin)
        acc["sh_coll"] += (is_sh & coll)
        acc["sh_cross"] += (is_sh & cross)
        acc["sh_fin"] += (is_sh & fin)
        acc["real"] += np.asarray(ev.real)
        acc["scat"] += np.asarray(ev.scat)
        carry = carry2
        it += 1

    tot = sum(acc[k].mean() for k in
              ("main_coll", "main_cross", "main_fin", "sh_coll", "sh_cross",
               "sh_fin"))
    print(f"factor={factor} shadow_rr={shadow_rr} n={n} while-iters={it}")
    for k in keys:
        print(f"  {k:10s} mean {acc[k].mean():7.2f}  p99 "
              f"{np.percentile(acc[k], 99):6.0f}  max {acc[k].max():5d}")
    print(f"  TOTAL walking events/lane: {tot:.2f}")


if __name__ == "__main__":
    for f in (16, 8):
        main(factor=f)
