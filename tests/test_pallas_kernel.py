"""Pallas fused-step engine vs the XLA flat engine: PRIMAL parity.

Interpret mode on CPU (see tests/pallas_common.py for why the kernel
suite is split across files)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uivr_tpu.config import cube_test_scene, smoke_scene
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.integrators import volpath_flat as vf
from uivr_tpu.ops import volpath_step as vk

from pallas_common import _compare, _setup, cube, smoke, sparse, \
    smoke_bigenv  # noqa: F401


def test_kernel_matches_flat_constant(cube):
    sc, o, d = cube
    assert vk.pallas_supported(sc, o.shape[0])
    _compare(sc, o, d, VolpathConfig(max_depth=8, rr_depth=5))


def test_kernel_matches_flat_envmap(smoke):
    sc, o, d = smoke
    assert vk.pallas_supported(sc, o.shape[0])
    _compare(sc, o, d, VolpathConfig(max_depth=8))


def test_kernel_matches_flat_no_nee(smoke):
    """Without NEE the only cross-engine differences are 1-ulp float
    boundary path flips; almost all lanes must agree exactly."""
    sc, o, d = smoke
    _compare(sc, o, d, VolpathConfig(max_depth=6, use_nee=False),
             tol_frac=0.005)


def test_kernel_compaction_exact(smoke):
    """Compaction rounds must not change the realization (lane-independent
    RNG), exactly as for the flat engine.  The explicit stage sizes force
    REAL shrink stages (the default schedule's 8192 floor would skip them
    at this n)."""
    sc, o, d = smoke
    cfg = VolpathConfig(max_depth=8)
    seed = jnp.uint32(11)
    La, _ = vk.sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                    interpret=True)
    Lb, _ = vk.sample_primal_pallas(cfg, sc, o, d, seed,
                                    schedule=(8, (512, 16), (256, None)),
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(La), np.asarray(Lb))


def test_persistent_kcand_matches_aligned(smoke):
    """K-candidate batching composed with the persistent scheduler (round
    4): a lane participates in every dispatch from install to DONE in both
    schedulers, so the per-lane K-candidate draw schedule — and hence the
    realization — matches the aligned k_cand engine ray-for-ray (modulo
    FMA path flips between differently-shaped programs)."""
    sc, o, d = smoke
    cfg = VolpathConfig(max_depth=8, rr_depth=5, shadow_rr=0.05)
    seed = jnp.uint32(42)
    La, ea = vk.sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                     interpret=True, k_cand=4)
    Lp, ep = vk.sample_primal_persistent(cfg, sc, o, d, seed, width=512,
                                         refill_every=4, interpret=True,
                                         k_cand=4)
    La, Lp = np.asarray(La), np.asarray(Lp)
    agree = np.mean(np.all(np.abs(La - Lp) < 1e-5, axis=-1))
    assert agree > 0.97, agree
    np.testing.assert_allclose(La.mean(0), Lp.mean(0), rtol=0.05, atol=5e-3)
    assert np.mean(np.asarray(ea) == np.asarray(ep)) > 0.97


def test_persistent_gate_respects_explicit_schedule(smoke, monkeypatch):
    """sample_primal_pallas must NOT silently reroute an explicit staged
    schedule through the persistent scheduler (advisor r3 medium): with a
    tiny UIVR_PERSIST_W every default-schedule call would take the
    persistent path, so an explicit schedule taking it too would be
    indistinguishable — assert the two entry points produce the SAME result
    but that the explicit-schedule call runs the staged code path (they
    differ in dispatch accounting, observable via monkeypatched counters)."""
    sc, o, d = smoke
    cfg = VolpathConfig(max_depth=4, rr_depth=3)
    seed = jnp.uint32(7)
    monkeypatch.setenv("UIVR_PERSIST_W", "512")
    calls = {"persist": 0}
    orig = vk.sample_primal_persistent

    def spy(*a, **k):
        calls["persist"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(vk, "sample_primal_persistent", spy)
    vk.sample_primal_pallas(cfg, sc, o, d, seed,
                            schedule=(4, (512, 8), (256, None)),
                            interpret=True)
    assert calls["persist"] == 0
    vk.sample_primal_pallas(cfg, sc, o, d, seed, interpret=True)
    assert calls["persist"] == 1


def test_render_dispatch_pallas(smoke):
    """engine='pallas' must flow through the render op (primal) and produce
    an image statistically matching engine='flat'."""
    from uivr_tpu.render import RenderSettings, make_render, \
        sample_batch_pixels
    b = smoke_scene(res=16, resx=32, resy=32, n_sensors=2)
    for engine in ("flat", "pallas"):
        cfg = VolpathConfig(max_depth=6, engine=engine)
        st = RenderSettings(integrator=cfg, medium=b.medium_cfg,
                            film_size=b.film_size, spp=8, spp_grad=2)
        render = make_render(st, b.to_world)
        si, px = sample_batch_pixels(jnp.uint32(1), 2, b.film_size, 64)
        img = render(b.params, b.emitter, b.cameras, si, px, jnp.uint32(3),
                     jnp.uint32(4))
        if engine == "flat":
            ref = np.asarray(img)
        else:
            got = np.asarray(img)
            np.testing.assert_allclose(got.mean(), ref.mean(), rtol=0.05)


def test_tea_i32_bit_exact():
    from uivr_tpu.core.rng import tea, _to_unit_float
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(0, 2**31, (64, 128)), jnp.int32)
    b = jnp.asarray(rng.randint(0, 2**31, (64, 128)), jnp.int32)
    b0i, b1i = vk.tea_i32(a, b)
    b0u, b1u = tea(a.view(jnp.uint32), b.view(jnp.uint32), rounds=8)
    assert (b0i.view(jnp.uint32) == b0u).all()
    assert (b1i.view(jnp.uint32) == b1u).all()
    assert (vk._unit_float(b0i) == _to_unit_float(b0u)).all()


# ---------------------------------------------------------------------------
# Large-envmap deferred-radiance NEE (coarse in-VMEM alias proxy + full-res
# radiance fix-up, see StepSpec.em_fh / EnvmapEmitter.nee)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def smoke_bigenv():
    from uivr_tpu.config.scenes import procedural_sky
    b = smoke_scene(res=16, resx=32, resy=32, n_sensors=2,
                    envmap=procedural_sky(128, 128))   # 16384 > 8192 texels
    return b, _setup(b, n=8192)


def test_persistent_scheduler_matches_aligned(smoke):
    """Persistent-wavefront scheduler vs the aligned engine: per-ray
    realization is identical modulo the usual FMA-fusion path flips between
    differently-shaped programs (~2%), because lane RNG streams derive from
    the RAY id and refills consume exactly the priming draws."""
    sc, o, d = smoke
    cfg = VolpathConfig(max_depth=8, rr_depth=5, shadow_rr=0.05)
    seed = jnp.uint32(42)
    La, ea = vk.sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                     interpret=True)
    # width < n forces multiple refill cycles + the straggler stage
    Lp, ep = vk.sample_primal_persistent(cfg, sc, o, d, seed, width=512,
                                         refill_every=4, interpret=True)
    La, Lp = np.asarray(La), np.asarray(Lp)
    agree = np.mean(np.all(np.abs(La - Lp) < 1e-5, axis=-1))
    assert agree > 0.97, agree
    np.testing.assert_allclose(La.mean(0), Lp.mean(0), rtol=0.05, atol=5e-3)
    assert np.mean(np.asarray(ea) == np.asarray(ep)) > 0.97
