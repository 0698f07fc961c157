"""Dev check: pallas adjoint (interpret) vs XLA flat adjoint.
Run on CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u scripts/dev_adjoint_check.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from uivr_tpu.config import cube_test_scene, smoke_scene
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.integrators import volpath_flat as vf
from uivr_tpu.ops import volpath_step as vk
from uivr_tpu.scene import Scene, finalize_medium
from uivr_tpu.scene.camera import sample_rays


def check(name, bundle, n=1024, **cfg_kw):
    sc = Scene(medium=finalize_medium(bundle.params, bundle.medium_cfg,
                                      bundle.to_world),
               emitter=bundle.emitter, cameras=bundle.cameras)
    cfg = VolpathConfig(engine="flat", **cfg_kw)
    rng = np.random.RandomState(5)
    uv = jnp.asarray(rng.rand(n, 2) * 0.6 + 0.2, jnp.float32)
    o, d = sample_rays(bundle.cameras, jnp.zeros((n,), jnp.int32), uv)
    seed = jnp.uint32(17)
    dL = jnp.asarray(rng.rand(n, 3), jnp.float32) / n

    Lf, _ = vf.sample_primal(cfg, sc, o, d, seed)
    gf = vf.sample_adjoint(cfg, sc, o, d, seed, dL, Lf, schedule=None)
    Lp, _ = vk.sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                    interpret=True)
    gp = vk.sample_adjoint_pallas(cfg, sc, o, d, seed, dL, Lp,
                                  schedule=None, interpret=True)
    print(f"--- {name}")
    ok = True
    for fname, a, b in zip(("sigma_t", "albedo", "emission"), gf, gp):
        a, b = np.asarray(a), np.asarray(b)
        na, nb = np.abs(a).sum(), np.abs(b).sum()
        rel = np.abs(a - b).sum() / max(na, 1e-12)
        print(f"  {fname:9s} |g_flat|={na:.5g} |g_pallas|={nb:.5g} "
              f"relL1diff={rel:.4g}")
        if fname != "emission":
            ok &= rel < 0.05
    # compaction path exactness (same engine realization)
    gp2 = vk.sample_adjoint_pallas(cfg, sc, o, d, seed, dL, Lp,
                                   schedule=(8, (512, 16), (256, None)),
                                   interpret=True)
    md = max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
             for x, y in zip(gp, gp2))
    print(f"  compaction max-abs diff: {md:.3g}")
    assert ok, "adjoint gradients diverge"
    assert md < 1e-5


if __name__ == "__main__":
    b1 = cube_test_scene()
    check("cube/constant drt", b1, max_depth=8)
    check("cube/constant prb", b1, max_depth=8, use_drt=False)
    b2 = smoke_scene(res=16, resx=32, resy=32, n_sensors=2)
    check("smoke/envmap drt", b2, max_depth=8, trans_grad_samples=2)
    print("ALL OK")
