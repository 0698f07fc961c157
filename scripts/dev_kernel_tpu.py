"""Compile + validate + time the real fused-step engine on the TPU.
Run ON THE TPU: python -u scripts/dev_kernel_tpu.py [n_rays_pow2]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from uivr_tpu.config import smoke_scene
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.integrators import volpath_flat as vf
from uivr_tpu.ops.volpath_step import pallas_supported, sample_primal_pallas
from uivr_tpu.scene import Scene, finalize_medium
from uivr_tpu.scene.camera import sample_rays


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    b = smoke_scene(res=res, resx=128, resy=128, n_sensors=4)
    sc = Scene(medium=finalize_medium(b.start_from, b.medium_cfg, b.to_world),
               emitter=b.emitter, cameras=b.cameras)
    # production-ish: the real medium for a denser walk
    sc_dense = Scene(medium=finalize_medium(b.params, b.medium_cfg,
                                            b.to_world),
                     emitter=b.emitter, cameras=b.cameras)
    cfg = VolpathConfig(max_depth=32, rr_depth=8, engine="pallas")
    print("supported:", pallas_supported(sc, n), flush=True)

    rng = np.random.RandomState(0)
    uv = jnp.asarray(rng.rand(n, 2), jnp.float32)
    si = jnp.asarray(rng.randint(0, 4, n), jnp.int32)
    o, d = sample_rays(b.cameras, si, uv)

    fp = jax.jit(lambda s: sample_primal_pallas(cfg, sc_dense, o, d, s))
    ff = jax.jit(lambda s: vf.sample_primal_compact(cfg, sc_dense, o, d, s))

    t0 = time.time()
    Lp, ep = fp(jnp.uint32(1))
    sp = float(Lp.sum())
    print(f"pallas compile+run: {time.time()-t0:.1f}s sum={sp:.1f}",
          flush=True)
    t0 = time.time()
    Lf, ef = ff(jnp.uint32(1))
    sf = float(Lf.sum())
    print(f"flat   compile+run: {time.time()-t0:.1f}s sum={sf:.1f}",
          flush=True)

    Lp, Lf = jax.device_get((Lp, Lf))
    agree = np.mean(np.all(np.abs(Lp - Lf) < 1e-5, axis=-1))
    print(f"lane agreement: {agree*100:.2f}%  means "
          f"{Lp.mean(0)} vs {Lf.mean(0)}", flush=True)

    for name, f in (("pallas", fp), ("flat", ff)):
        t0 = time.time()
        reps = 3
        for i in range(reps):
            L, _ = f(jnp.uint32(2 + i))
            s = float(L.sum())      # data-dependent fetch (axon-safe timing)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:.1f} ms/render = {dt/n*1e9:.2f} ns/ray "
              f"(primal, {n} rays)", flush=True)


if __name__ == "__main__":
    main()
