"""Split the bench step to find where the pallas engine's time goes on TPU:
(a) primal-only render   (b) full value_and_grad (primal + replay + adjoint).
Exact same settings/pixels/seeds as bench.py.

Run ON THE TPU:  python -u scripts/dev_bench_split.py
Env: BENCH_ENGINE (default pallas), BENCH_BATCH, UIVR_CROSS_STEPS
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from uivr_tpu.config import smoke_scene
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.opt import losses
from uivr_tpu.render import RenderSettings, make_render, sample_batch_pixels


def timed(tag, f, *args):
    t0 = time.time()
    out = f(*args)
    s = float(jax.tree_util.tree_leaves(out)[0].sum())
    print(f"{tag}: {time.time()-t0:.1f}s (sum {s:.3f})", flush=True)
    return out


def main():
    spp_grad, spp = 4, 64
    batch = int(os.environ.get("BENCH_BATCH", 4096))
    bundle = smoke_scene(res=64, resx=128, resy=128, n_sensors=16,
                         majorant_factor=int(os.environ.get("BENCH_MAJ", 8)))
    cfg = VolpathConfig(max_depth=32, max_steps=2048,
                        engine=os.environ.get("BENCH_ENGINE", "pallas"),
                        rr_depth=8, trans_grad_samples=2,
                        shadow_rr=float(os.environ.get("BENCH_SHADOW_RR",
                                                       0.05)),
                        use_drt=os.environ.get("UIVR_DRT", "1") == "1",
                        use_drt_subsampling=os.environ.get("UIVR_DRT_SUB",
                                                           "1") == "1")
    settings = RenderSettings(integrator=cfg, medium=bundle.medium_cfg,
                              film_size=bundle.film_size, spp=spp,
                              spp_grad=spp_grad)
    render = make_render(settings, bundle.to_world)
    params = bundle.start_from
    sensor_idx, pixels = sample_batch_pixels(jnp.uint32(1), 16,
                                             bundle.film_size, batch)
    ref = jnp.full((batch, 3), 0.3, jnp.float32)

    @jax.jit
    def primal(params, seed, seed_grad):
        return render(params, bundle.emitter, bundle.cameras, sensor_idx,
                      pixels, seed, seed_grad)

    @jax.jit
    def vag(params, seed, seed_grad):
        def f(p):
            img = render(p, bundle.emitter, bundle.cameras, sensor_idx,
                         pixels, seed, seed_grad)
            return losses.l1(img, ref)
        return jax.value_and_grad(f)(params)

    # bwd-only program: decorrelated replay + adjoint at batch*spp_grad,
    # exactly the custom-vjp bwd body (render/batched.py:render_bwd)
    from uivr_tpu.render.batched import (_dispatch_adjoint, _dispatch_primal,
                                         _expand_rays)
    from uivr_tpu.core.rng import sample_tea_32
    from uivr_tpu.scene import Scene, finalize_medium

    from uivr_tpu.ops import volpath_step as vk

    @jax.jit
    def bwd_only(params, seed_grad, g_img):
        scene = Scene(medium=finalize_medium(params, bundle.medium_cfg,
                                             bundle.to_world),
                      emitter=bundle.emitter, cameras=bundle.cameras)
        sub_seed, _ = sample_tea_32(seed_grad, 39)
        o, d = _expand_rays(bundle.cameras, sensor_idx, pixels,
                            bundle.film_size, spp_grad, sub_seed)
        rep = jax.lax.broadcasted_iota(
            jnp.int32, (batch * spp_grad, 1), 0)[:, 0] // spp_grad
        dL = g_img[rep] / spp_grad
        L, _ = vk.sample_primal_pallas(cfg, scene, o, d, seed_grad)
        g, ac = vk.sample_adjoint_pallas(cfg, scene, o, d, seed_grad, dL, L,
                                         return_state=True)
        return g, ac, L

    @jax.jit
    def replay_only(params, seed_grad):
        scene = Scene(medium=finalize_medium(params, bundle.medium_cfg,
                                             bundle.to_world),
                      emitter=bundle.emitter, cameras=bundle.cameras)
        sub_seed, _ = sample_tea_32(seed_grad, 39)
        o, d = _expand_rays(bundle.cameras, sensor_idx, pixels,
                            bundle.film_size, spp_grad, sub_seed)
        L, _ = _dispatch_primal(cfg, scene, o, d, seed_grad)
        return L

    which = os.environ.get("UIVR_SPLIT_WHICH", "all")
    print(f"engine={cfg.engine} batch={batch} which={which} "
          f"drt={cfg.use_drt} sub={cfg.use_drt_subsampling} "
          f"cross={os.environ.get('UIVR_CROSS_STEPS')}", flush=True)
    if which in ("all", "primal"):
        timed("primal compile+run (seed 0/1)", primal, params,
              jnp.uint32(0), jnp.uint32(1))
        for i in range(3):
            timed(f"primal run (seed {2*i+2}/{2*i+3})", primal, params,
                  jnp.uint32(2 * i + 2), jnp.uint32(2 * i + 3))
    if which == "replay":
        import numpy as np
        t0 = time.time()
        L = replay_only(params, jnp.uint32(1))
        Ln = np.asarray(L)
        print(f"replay compile+run: {time.time()-t0:.1f}s "
              f"nan={np.isnan(Ln).any(axis=1).sum()} "
              f"inf={np.isinf(Ln).any(axis=1).sum()} "
              f"sum={np.nansum(Ln):.2f}", flush=True)
        for i in range(3):
            t0 = time.time()
            L = replay_only(params, jnp.uint32(2 * i + 3))
            Ln = np.asarray(L)
            print(f"replay run (seed {2*i+3}): {time.time()-t0:.1f}s "
                  f"nan={np.isnan(Ln).any(axis=1).sum()} "
                  f"sum={np.nansum(Ln):.2f}", flush=True)
    if which in ("all", "bwd"):
        import numpy as np
        from uivr_tpu.integrators.volpath_flat import (DONE, MAIN, REPLAY,
                                                       SHADOW)
        g_img = jnp.full((batch, 3), 1.0 / (batch * 3), jnp.float32)
        n_adj = batch * spp_grad
        t0 = time.time()
        g, ac, L = bwd_only(params, jnp.uint32(1), g_img)
        gs = sum(float(jnp.abs(x).sum())
                 for x in jax.tree_util.tree_leaves(g))
        Ln = np.asarray(L)
        print(f"bwd-only compile+run: {time.time()-t0:.1f}s it={int(ac.it)} "
              f"gsum={gs:.4f} Lnan={np.isnan(Ln).any(axis=1).sum()}",
              flush=True)
        d_a = dict(zip(vk.ALL_PLANES + vk.ADJ_PLANES, ac.planes))
        mode = np.asarray(d_a["mode"]).reshape(n_adj)
        names = {int(MAIN): "MAIN", int(SHADOW): "SHADOW",
                 int(REPLAY): "REPLAY", int(DONE): "DONE"}
        vals, cnts = np.unique(mode, return_counts=True)
        print("mode histogram:",
              {names.get(int(v), int(v)): int(c)
               for v, c in zip(vals, cnts)}, flush=True)
        stuck = np.nonzero(mode != int(DONE))[0]
        keys = ("mode", "depth", "t", "maxt", "tcand", "texit", "smaj",
                "px", "py", "pz", "dim", "rpt", "rptr", "rpdim", "sht",
                "shtmax", "shtr", "ox", "oy", "oz", "dlx", "dly", "dlz")
        for i in stuck[:6]:
            row = {k: round(float(np.asarray(d_a[k]).reshape(n_adj)[i]), 6)
                   for k in keys if k in d_a}
            print(f"  lane {i}: {row}", flush=True)
        for i in range(2):
            timed(f"bwd-only run (seed {2*i+3})",
                  lambda p, s, gi: bwd_only(p, s, gi)[0], params,
                  jnp.uint32(2 * i + 3), g_img)
    if which in ("all", "vag"):
        timed("vag compile+run (seed 0/1)", vag, params,
              jnp.uint32(0), jnp.uint32(1))
        for i in range(3):
            timed(f"vag run (seed {2*i+2}/{2*i+3})", vag, params,
                  jnp.uint32(2 * i + 2), jnp.uint32(2 * i + 3))


if __name__ == "__main__":
    main()
