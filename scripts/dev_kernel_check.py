"""Dev check: pallas fused-step engine (interpret mode) vs XLA flat engine.
Run on CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u scripts/dev_kernel_check.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from uivr_tpu.config import cube_test_scene, smoke_scene
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.integrators import volpath_flat
from uivr_tpu.ops.volpath_step import pallas_supported, sample_primal_pallas
from uivr_tpu.scene import Scene, finalize_medium
from uivr_tpu.scene.camera import sample_rays


def check(name, bundle, n=2048, **cfg_kw):
    sc = Scene(medium=finalize_medium(bundle.start_from
                                      if hasattr(bundle, "start_from")
                                      and cfg_kw.pop("use_start", False)
                                      else bundle.params,
                                      bundle.medium_cfg, bundle.to_world),
               emitter=bundle.emitter, cameras=bundle.cameras)
    cfg = VolpathConfig(engine="flat", **cfg_kw)
    rng = np.random.RandomState(3)
    uv = jnp.asarray(rng.rand(n, 2) * 0.6 + 0.2, jnp.float32)
    si = jnp.zeros((n,), jnp.int32)
    o, d = sample_rays(bundle.cameras, si, uv)
    seed = jnp.uint32(42)

    print(f"--- {name}: supported={pallas_supported(sc, n)}")
    Lf, ef = volpath_flat.sample_primal(cfg, sc, o, d, seed)
    Lp, ep = sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                  interpret=True)
    Lf, ef, Lp, ep = jax.device_get((Lf, ef, Lp, ep))
    diff = np.abs(Lf - Lp)
    exact = np.mean(np.all(diff < 1e-5, axis=-1))
    print(f"lane agreement <1e-5: {exact*100:.2f}%  "
          f"escaped match {(ef == ep).mean()*100:.2f}%")
    print(f"mean flat {Lf.mean(0)} pallas {Lp.mean(0)}")
    bad = np.where(~np.all(diff < 1e-4, axis=-1))[0]
    print(f"lanes differing >1e-4: {bad.size}/{n}")
    assert exact > 0.99, "kernel diverges from flat engine"
    Lp2, _ = sample_primal_pallas(cfg, sc, o, d, seed, schedule=(16, None),
                                  interpret=True)
    print("compaction max diff:",
          float(np.max(np.abs(jax.device_get(Lp2) - Lp))))


if __name__ == "__main__":
    b1 = cube_test_scene()
    check("cube/constant", b1, max_depth=8, rr_depth=5)
    b2 = smoke_scene(res=16, resx=32, resy=32, n_sensors=2)
    check("smoke/envmap", b2, max_depth=8, rr_depth=1000)
    check("smoke/no-nee", b2, max_depth=6, use_nee=False)
    print("ALL OK")
