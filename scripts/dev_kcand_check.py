"""Quick statistical check of K-candidate event batching (UIVR_KCAND).

k_cand > 1 uses a different (deterministic) TEA draw schedule, so lanes
cannot match the k_cand=1 realization bit-exactly; the estimator must be
unchanged, so per-seed MEANS must agree within MC noise.  Run on CPU
(interpret mode).
"""
import os

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from uivr_tpu.config import smoke_scene
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.ops import volpath_step as vk
from uivr_tpu.scene import Scene, finalize_medium
from uivr_tpu.scene.camera import sample_rays


def main():
    b = smoke_scene(res=16, resx=32, resy=32, n_sensors=2)
    sc = Scene(medium=finalize_medium(b.params, b.medium_cfg, b.to_world),
               emitter=b.emitter, cameras=b.cameras)
    n = 8192
    rng = np.random.RandomState(3)
    uv = jnp.asarray(rng.rand(n, 2) * 0.6 + 0.2, jnp.float32)
    o, d = sample_rays(b.cameras, jnp.zeros((n,), jnp.int32), uv)
    cfg = VolpathConfig(max_depth=8, rr_depth=5, shadow_rr=0.05)

    means = {}
    for kc in (1, 2, 4):
        acc = []
        for seed in range(6):
            L, _ = vk.sample_primal_pallas(cfg, sc, o, d, jnp.uint32(seed),
                                           schedule=None, interpret=True,
                                           k_cand=kc)
            acc.append(np.asarray(L))
        stack = np.stack(acc)
        means[kc] = stack.mean(axis=(0, 1))
        sem = stack.mean(axis=1).std(axis=0) / np.sqrt(len(acc))
        print(f"k_cand={kc}: mean={means[kc]} sem={sem}")
    for kc in (2, 4):
        diff = np.abs(means[kc] - means[1]) / np.maximum(means[1], 1e-6)
        print(f"k_cand={kc} vs 1: rel diff {diff}")
        assert np.all(diff < 0.02), diff
    print("OK")


if __name__ == "__main__":
    main()
