"""Bisect the TPU fused-step kernel fault: run ONE config per process.

Usage (on the real TPU, one process at a time):
    python -u scripts/dev_bisect_tpu.py primal   [n_rays]
    python -u scripts/dev_bisect_tpu.py adjoint  [n_rays]
with UIVR_CROSS_STEPS=1|4 selecting the crossing-unroll depth.

Each run compiles + executes the pallas path and prints a sum (forces
device execution); a TPU kernel fault surfaces as JaxRuntimeError.
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
from uivr_tpu.ops import volpath_step as vk
from uivr_tpu.scene import Scene, finalize_medium
from uivr_tpu.scene.camera import sample_rays


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "primal"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    res = int(os.environ.get("BENCH_GRID", 64))
    b = smoke_scene(res=res, resx=128, resy=128, n_sensors=4)
    sc = Scene(medium=finalize_medium(b.params, b.medium_cfg, b.to_world),
               emitter=b.emitter, cameras=b.cameras)
    cfg = VolpathConfig(max_depth=32, rr_depth=8, engine="pallas",
                        max_steps=2048, trans_grad_samples=2)
    print(f"mode={mode} n={n} cross_steps={os.environ.get('UIVR_CROSS_STEPS')}"
          f" supported={vk.pallas_supported(sc, n)}", flush=True)

    rng = np.random.RandomState(0)
    uv = jnp.asarray(rng.rand(n, 2), jnp.float32)
    si = jnp.asarray(rng.randint(0, 4, n), jnp.int32)
    o, d = sample_rays(b.cameras, si, uv)
    seed = jnp.uint32(1)

    # schedule: "none" = single unbounded while_loop (one kernel spec per
    # direction, cheapest compile); "default" = the production compaction
    # schedule (more specs, more compiles, closer to bench.py)
    sched_env = os.environ.get("UIVR_BISECT_SCHED", "none")
    sched = None if sched_env == "none" else (96, None, None)

    t0 = time.time()
    if mode == "primal":
        f = jax.jit(
            lambda s: vk.sample_primal_pallas(cfg, sc, o, d, s,
                                              schedule=sched))
        L, _ = f(seed)
        s = float(L.sum())
    else:
        dL = jnp.full((n, 3), 1.0 / (n * 3), jnp.float32)
        fp = jax.jit(
            lambda s: vk.sample_primal_pallas(cfg, sc, o, d, s,
                                              schedule=sched))
        L, _ = fp(seed)
        print(f"  primal ok sum={float(L.sum()):.1f} "
              f"({time.time()-t0:.1f}s)", flush=True)
        t0 = time.time()
        fa = jax.jit(
            lambda s, L: vk.sample_adjoint_pallas(cfg, sc, o, d, s, dL, L,
                                                  schedule=sched))
        g = fa(seed, L)
        s = sum(float(jnp.abs(x).sum()) for x in g)
    print(f"  {mode} OK sum={s:.4f} compile+run={time.time()-t0:.1f}s",
          flush=True)

    # timed re-runs (data-dependent fetch per axon timing rules)
    t0 = time.time()
    for i in range(3):
        if mode == "primal":
            L, _ = f(jnp.uint32(2 + i))
            s = float(L.sum())
        else:
            g = fa(jnp.uint32(2 + i), L)
            s = float(jnp.abs(g[0]).sum())
    dt = (time.time() - t0) / 3
    print(f"  {mode} {dt*1e3:.1f} ms/call = {dt/n*1e9:.2f} ns/ray "
          f"(last sum {s:.4f})", flush=True)


if __name__ == "__main__":
    main()
