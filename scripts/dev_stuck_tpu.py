"""Diagnose pallas stuck lanes on the real TPU: which walk mode never
reaches DONE, and what state those lanes are in at the trip bound.

Run ON THE TPU (one process):  python -u scripts/dev_stuck_tpu.py [n]
Env: UIVR_CROSS_STEPS, UIVR_STUCK_MODE=primal|adjoint|both
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from uivr_tpu.config import smoke_scene
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.integrators.volpath_flat import DONE, MAIN, REPLAY, SHADOW
from uivr_tpu.ops import volpath_step as vk
from uivr_tpu.scene import Scene, finalize_medium
from uivr_tpu.scene.camera import sample_rays

PLANE_KEYS = ("mode", "depth", "t", "maxt", "tcand", "texit", "smaj",
              "px", "py", "pz", "dim")


def report(tag, planes_dict, n):
    mode = np.asarray(planes_dict["mode"]).reshape(n)
    names = {int(MAIN): "MAIN", int(SHADOW): "SHADOW",
             int(REPLAY): "REPLAY", int(DONE): "DONE"}
    vals, cnts = np.unique(mode, return_counts=True)
    print(f"[{tag}] mode histogram:",
          {names.get(int(v), int(v)): int(c) for v, c in zip(vals, cnts)},
          flush=True)
    stuck = np.nonzero(mode != int(DONE))[0]
    if len(stuck):
        for i in stuck[:8]:
            row = {k: float(np.asarray(planes_dict[k]).reshape(n)[i])
                   for k in PLANE_KEYS if k in planes_dict}
            print(f"  lane {i}: {row}", flush=True)
    return len(stuck)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    which = os.environ.get("UIVR_STUCK_MODE", "both")
    b = smoke_scene(res=64, resx=128, resy=128, n_sensors=16)
    sc = Scene(medium=finalize_medium(b.start_from, b.medium_cfg,
                                      b.to_world),
               emitter=b.emitter, cameras=b.cameras)
    cfg = VolpathConfig(max_depth=32, rr_depth=8, engine="pallas",
                        max_steps=2048, trans_grad_samples=2)
    print(f"n={n} cross={os.environ.get('UIVR_CROSS_STEPS')} which={which}",
          flush=True)

    if os.environ.get("UIVR_STUCK_RAYS") == "bench":
        # the bench bwd's exact ray structure: TEA-sampled pixels duplicated
        # spp_grad times with subpixel jitter (render/batched.py:render_bwd)
        from uivr_tpu.core.rng import sample_tea_32
        from uivr_tpu.render.batched import _expand_rays, sample_batch_pixels
        spp_g = 4
        batch = n // spp_g
        sensor_idx, pixels = sample_batch_pixels(jnp.uint32(1), 16,
                                                 b.film_size, batch)
        sub_seed, _ = sample_tea_32(jnp.uint32(1), 39)
        o, d = _expand_rays(b.cameras, sensor_idx, pixels, b.film_size,
                            spp_g, sub_seed)
    else:
        rng = np.random.RandomState(0)
        uv = jnp.asarray(rng.rand(n, 2), jnp.float32)
        si = jnp.asarray(rng.randint(0, 16, n), jnp.int32)
        o, d = sample_rays(b.cameras, si, uv)
    seed = jnp.uint32(1)

    sched = (None if os.environ.get("UIVR_STUCK_SCHED", "none") == "none"
             else (96, None, None))
    n_adj = int(os.environ.get("UIVR_STUCK_NADJ", n))
    t0 = time.time()
    fp = jax.jit(lambda s: vk.sample_primal_pallas(
        cfg, sc, o, d, s, schedule=sched, return_state=True))
    L, esc, pc = fp(seed)
    d_p = dict(zip(vk.ALL_PLANES, pc.planes))
    print(f"primal done it={int(pc.it)} sum={float(L.sum()):.2f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    ns = report("primal", d_p, n)
    if which == "primal":
        return
    t0 = time.time()
    oa, da_, La = o[:n_adj], d[:n_adj], L[:n_adj]
    dL = jnp.full((n_adj, 3), 1.0 / (n_adj * 3), jnp.float32)
    fa = jax.jit(lambda s, L: vk.sample_adjoint_pallas(
        cfg, sc, oa, da_, s, dL, L, schedule=sched, return_state=True))
    g, ac = fa(seed, La)
    d_a = dict(zip(vk.ALL_PLANES + vk.ADJ_PLANES, ac.planes))
    print(f"adjoint done it={int(ac.it)} "
          f"gsum={float(jnp.abs(g[0]).sum()):.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    na = report("adjoint", d_a, n_adj)
    for k in ("rpt", "rptr", "rpdim", "sha0", "rvact"):
        if k in d_a and na:
            mode = np.asarray(d_a["mode"]).reshape(n_adj)
            i = np.nonzero(mode != int(DONE))[0][0]
            print(f"  adj[{k}] lane{i} =",
                  float(np.asarray(d_a[k]).reshape(n_adj)[i]), flush=True)

    # run-only timings (compile amortized; data-dependent fetch per run)
    for tag, fn in (("primal", lambda i: fp(jnp.uint32(i))[0]),
                    ("adjoint", lambda i: fa(jnp.uint32(i), La)[0])):
        t0 = time.time()
        for i in range(3):
            s = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(fn(2 + i)))
        print(f"  {tag} run-only: {(time.time()-t0)/3*1e3:.0f} ms "
              f"(sum {s:.3f})", flush=True)


if __name__ == "__main__":
    main()
