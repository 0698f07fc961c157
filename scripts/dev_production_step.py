"""Production-configuration training-step proof (VERDICT r1 item 6).

Runs ONE full fwd+bwd optimization step at the reference's production
scale — batch 32768 pixels, primal spp 1024 (spp_grad 16 x
primal_spp_factor 64, the most demanding reading of reproduce.py:45-59),
adjoint spp 16, max_depth 64, RR disabled — on a single chip.  The
batched render op's in-step SPP splitting (RenderSettings.max_rays_per_pass)
scans the 33.5M-lane primal wavefront in chunks, so this fits 16 GB HBM.

Run ON THE TPU:  python -u scripts/dev_production_step.py
Prints one JSON line with step time + gradient finiteness.
"""
import json
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
from uivr_tpu.opt import losses
from uivr_tpu.render import RenderSettings, make_render, sample_batch_pixels


def main():
    batch = int(os.environ.get("PROD_BATCH", 32768))
    spp = int(os.environ.get("PROD_SPP", 1024))
    spp_grad = int(os.environ.get("PROD_SPP_GRAD", 16))
    max_depth = 64
    bundle = smoke_scene(res=64, resx=180, resy=155, n_sensors=62,
                         majorant_factor=16)
    cfg = VolpathConfig(max_depth=max_depth, max_steps=4096,
                        rr_depth=max_depth + 1000,      # RR disabled
                        trans_grad_samples=4,
                        engine=os.environ.get("BENCH_ENGINE", "pallas"))
    st = RenderSettings(integrator=cfg, medium=bundle.medium_cfg,
                        film_size=bundle.film_size, spp=spp,
                        spp_grad=spp_grad,
                        max_rays_per_pass=int(os.environ.get(
                            "PROD_RAYS_PER_PASS", 4 * 1024 * 1024)))
    render = make_render(st, bundle.to_world)
    sensor_idx, pixels = sample_batch_pixels(jnp.uint32(1), 62,
                                             bundle.film_size, batch)
    ref = jnp.full((batch, 3), 0.3, jnp.float32)
    params = bundle.start_from

    @jax.jit
    def step(params, seed):
        def f(p):
            img = render(p, bundle.emitter, bundle.cameras, sensor_idx,
                         pixels, 2 * seed, 2 * seed + 1)
            return losses.l1(img, ref)
        return jax.value_and_grad(f)(params)

    t0 = time.time()
    loss, grads = step(params, jnp.uint32(1))
    gsum = float(sum(jnp.abs(g).sum() for g in
                     jax.tree_util.tree_leaves(grads)))
    t_compile = time.time() - t0

    t0 = time.time()
    loss, grads = step(params, jnp.uint32(2))
    gsum = float(sum(jnp.abs(g).sum() for g in
                     jax.tree_util.tree_leaves(grads)))
    dt = time.time() - t0
    finite = all(bool(jnp.isfinite(g).all()) for g in
                 jax.tree_util.tree_leaves(grads))
    rays = batch * (spp + 2 * spp_grad)
    print(json.dumps({
        "config": {"batch": batch, "spp": spp, "spp_grad": spp_grad,
                   "max_depth": max_depth, "rr": "off",
                   "rays_per_pass": st.max_rays_per_pass},
        "rays_per_step": rays,
        "compile_plus_first_step_s": round(t_compile, 1),
        "step_s": round(dt, 2),
        "mrays_per_s": round(rays / dt / 1e6, 3),
        "loss": round(float(loss), 6),
        "grads_finite": finite,
        "grad_abs_sum": round(gsum, 4),
    }))


if __name__ == "__main__":
    main()
