"""TPU probe: K-candidate event batching speedup on the bench scene.
Run ON THE TPU: python -u scripts/dev_kcand_tpu.py [n_rays]
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
from uivr_tpu.ops.volpath_step import pallas_supported, sample_primal_pallas
from uivr_tpu.scene import Scene, finalize_medium
from uivr_tpu.scene.camera import sample_rays


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    ks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                           else (1, 2, 4))]
    b = smoke_scene(res=64, resx=128, resy=128, n_sensors=16,
                    majorant_factor=16)
    sc = Scene(medium=finalize_medium(b.params, b.medium_cfg, b.to_world),
               emitter=b.emitter, cameras=b.cameras)
    cfg = VolpathConfig(max_depth=32, max_steps=2048, rr_depth=8,
                        shadow_rr=0.05, engine="pallas")
    print("supported:", pallas_supported(sc, n), flush=True)

    rng = np.random.RandomState(0)
    uv = jnp.asarray(rng.rand(n, 2), jnp.float32)
    si = jnp.asarray(rng.randint(0, 16, n), jnp.int32)
    o, d = sample_rays(b.cameras, si, uv)

    means = {}
    for kc in ks:
        f = jax.jit(lambda s, _kc=kc: sample_primal_pallas(
            cfg, sc, o, d, s, k_cand=_kc))
        t0 = time.time()
        L, _ = f(jnp.uint32(1))
        m = np.asarray(jax.device_get(L)).mean(0)
        print(f"k={kc}: compile+run {time.time()-t0:.1f}s mean={m}",
              flush=True)
        t0 = time.time()
        reps = 3
        acc = np.zeros(3)
        for i in range(reps):
            L, _ = f(jnp.uint32(2 + i))
            acc += np.asarray(jax.device_get(L)).mean(0)  # data-dep fetch
        dt = (time.time() - t0) / reps
        means[kc] = acc / reps
        print(f"k={kc}: {dt*1e3:.1f} ms/render = {dt/n*1e9:.2f} ns/ray "
              f"mean={means[kc]}", flush=True)
    for kc in ks[1:]:
        rd = np.abs(means[kc] - means[ks[0]]) / np.maximum(means[ks[0]],
                                                           1e-6)
        print(f"k={kc} vs k={ks[0]} rel mean diff {rd}", flush=True)


if __name__ == "__main__":
    main()
