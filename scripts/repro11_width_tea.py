"""Probe 11: (i) XLA row-gather cost vs wavefront width (sublinear —
how far does widening amortize?); (ii) fused-step cost split by emitter
table size: the bench sky is 8192 texels => em_chunks=64 => the kernel's
NEE alias sampling is 7x64=448 chunk-shuffle rounds per step — suspected
kernel cost driver.  Variants: full-res 8192, constant emitter, coarse
512-texel deferred proxy (4ch x 4 chunks + one XLA radiance gather).
Run ON THE TPU.
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from uivr_tpu.config import smoke_scene
from uivr_tpu.config.scenes import procedural_sky
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.ops import volpath_step as vk
from uivr_tpu.scene import Scene, finalize_medium
from uivr_tpu.scene.emitters import ConstantEmitter, make_envmap


def timeit(f, *args, reps=10):
    out = f(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.time() - t0) / reps


def step_time(sc, n):
    R = n // 128
    cfg = VolpathConfig(max_depth=32, rr_depth=8, engine="pallas")
    step = vk._make_step(cfg, sc, R, interpret=False)
    smp0 = vk.make_lane_sampler(jnp.uint32(1), n_lanes=n)
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.concatenate([jnp.ones((n, 1)), jnp.full((n, 1), 0.3),
                         jnp.full((n, 1), 0.2)], axis=-1)
    pc = vk.pack_carry(vk._init_carry(sc, o, d, smp0, None), R)

    @jax.jit
    def full(pc):
        return step(pc, do_post=True)

    return timeit(full, pc)


def main():
    b = smoke_scene(res=64, resx=128, resy=128, n_sensors=4)
    m = finalize_medium(b.params, b.medium_cfg, b.to_world)
    rng = np.random.RandomState(0)
    tab = m.combined_ct

    for n in (32768, 262144, 1048576):
        R = n // 128
        px = jnp.asarray(rng.rand(R, 128), jnp.float32)

        @jax.jit
        def graw(px):
            idx = jnp.clip((px * tab.shape[0]).astype(jnp.int32), 0,
                           tab.shape[0] - 1)
            return tab[idx].sum(-1)

        dt = timeit(graw, px)
        print(f"raw row gather n={n:8d}: {dt*1e3:7.3f} ms "
              f"({dt/n*1e9:6.2f} ns/lane)", flush=True)

    sky = procedural_sky(64, 128)                      # 8192 texels
    variants = [
        ("sky 8192 full-res (64 chunks)", make_envmap(sky)),
        ("constant emitter   (1 chunk) ",
         ConstantEmitter(radiance=jnp.array([1.0, 0.8, 0.2]))),
    ]
    os.environ["UIVR_NEE_COARSE_TEX"] = "512"
    variants.append(("sky coarse-512 deferred (4ch x4)",
                     make_envmap(sky, nee_max_texels=4096)))
    for name, em in variants:
        sc = Scene(medium=m, emitter=em, cameras=b.cameras)
        dt = step_time(sc, 262144)
        print(f"full step 262144 [{name}]: {dt*1e3:7.3f} ms "
              f"({dt/262144*1e9:6.2f} ns/lane)", flush=True)

    # width scaling of the whole step (current emitter config)
    sc = Scene(medium=m, emitter=variants[0][1], cameras=b.cameras)
    dt = step_time(sc, 1048576)
    print(f"full step 1048576 [sky 8192]: {dt*1e3:7.3f} ms "
          f"({dt/1048576*1e9:6.2f} ns/lane)", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    main()
