"""Pallas fused-step engine (ops/volpath_step) vs the XLA flat engine.

Runs in interpret mode on the CPU backend (conftest): the kernel's jnp body
executes with identical semantics to the TPU lowering modulo Mosaic bugs, so
these tests pin the ESTIMATOR equivalence; TPU-only lowering issues are
caught by bench/integration runs on hardware.
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


@pytest.fixture(scope="module")
def cube():
    return _setup(cube_test_scene())


@pytest.fixture(scope="module")
def smoke():
    return _setup(smoke_scene(res=16, resx=32, resy=32, n_sensors=2))


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


def test_kernel_adjoint_matches_flat(smoke):
    """Pallas adjoint vs XLA flat adjoint: same estimator + streams, so the
    gradient realizations agree up to float-boundary path flips."""
    sc, o, d = smoke
    n = o.shape[0]
    cfg = VolpathConfig(max_depth=8, trans_grad_samples=2)
    seed = jnp.uint32(17)
    rng = np.random.RandomState(2)
    dL = jnp.asarray(rng.rand(n, 3), jnp.float32) / n
    Lf, _ = vf.sample_primal(cfg, sc, o, d, seed)
    gf = vf.sample_adjoint(cfg, sc, o, d, seed, dL, Lf, schedule=None)
    Lp, _ = vk.sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                    interpret=True)
    gp = vk.sample_adjoint_pallas(cfg, sc, o, d, seed, dL, Lp,
                                  schedule=None, interpret=True)
    for a, b in zip((gf.sigma_t, gf.albedo), (gp.sigma_t, gp.albedo)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).sum() / max(np.abs(a).sum(), 1e-12)
        assert rel < 0.05, rel


def test_kernel_adjoint_compaction_exact(smoke):
    sc, o, d = smoke
    n = o.shape[0]
    cfg = VolpathConfig(max_depth=8, trans_grad_samples=2)
    seed = jnp.uint32(13)
    dL = jnp.full((n, 3), 1.0 / (3 * n), jnp.float32)
    Lp, _ = vk.sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                    interpret=True)
    g1 = vk.sample_adjoint_pallas(cfg, sc, o, d, seed, dL, Lp,
                                  schedule=None, interpret=True)
    g2 = vk.sample_adjoint_pallas(cfg, sc, o, d, seed, dL, Lp,
                                  schedule=(8, (512, 16), (256, None)),
                                  interpret=True)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


def test_render_grad_dispatch_pallas():
    """engine='pallas' full value_and_grad through the render op."""
    from uivr_tpu.render import RenderSettings, make_render, \
        sample_batch_pixels
    from uivr_tpu.opt import losses
    b = smoke_scene(res=16, resx=32, resy=32, n_sensors=2)
    grads = {}
    for engine in ("flat", "pallas"):
        cfg = VolpathConfig(max_depth=6, engine=engine)
        st = RenderSettings(integrator=cfg, medium=b.medium_cfg,
                            film_size=b.film_size, spp=4, spp_grad=2)
        render = make_render(st, b.to_world)
        si, px = sample_batch_pixels(jnp.uint32(1), 2, b.film_size, 128)
        ref = jnp.full((128, 3), 0.3, jnp.float32)

        def f(p):
            img = render(p, b.emitter, b.cameras, si, px, jnp.uint32(3),
                         jnp.uint32(4))
            return losses.l1(img, ref)
        loss, g = jax.value_and_grad(f)(b.params)
        assert np.isfinite(float(loss))
        grads[engine] = g
    a = np.asarray(grads["flat"].sigma_t)
    c = np.asarray(grads["pallas"].sigma_t)
    rel = np.abs(a - c).sum() / max(np.abs(a).sum(), 1e-12)
    assert rel < 0.05, rel


def test_kernel_padding_odd_width(smoke):
    """Wavefronts that are not multiples of 1024 (scaled batch sizes, e.g.
    1638*64 rays in the reproduce CLI at --scale 0.05) are padded with
    repeat-ray-0 lanes: real-lane radiance must equal the aligned engine's
    and padded adjoint lanes (dL=0) must not pollute the gradients."""
    sc, o, d = smoke
    cfg = VolpathConfig(max_depth=8, trans_grad_samples=2)
    seed = jnp.uint32(23)
    n_odd = 832                       # R=6.5 -> pads to 1024
    oo, dd = o[:n_odd], d[:n_odd]
    Lf, _ = vf.sample_primal(cfg, sc, oo, dd, seed)
    Lp, ep = vk.sample_primal_pallas(cfg, sc, oo, dd, seed, schedule=None,
                                     interpret=True)
    assert Lp.shape == (n_odd, 3) and ep.shape == (n_odd,)
    agree = np.mean(np.all(np.abs(np.asarray(Lf) - np.asarray(Lp)) < 1e-5,
                           axis=-1))
    assert agree > 0.98, agree
    dL = jnp.full((n_odd, 3), 1.0 / (3 * n_odd), jnp.float32)
    gf = vf.sample_adjoint(cfg, sc, oo, dd, seed, dL, Lf, schedule=None)
    gp = vk.sample_adjoint_pallas(cfg, sc, oo, dd, seed, dL, Lp,
                                  schedule=None, interpret=True)
    for a, b in zip((gf.sigma_t, gf.albedo), (gp.sigma_t, gp.albedo)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        rel = np.abs(a - b).sum() / max(np.abs(a).sum(), 1e-12)
        assert rel < 0.05, rel


def test_render_grad_pallas_jit_traced_scene():
    """Under jit the scene is finalized from TRACED params, so phase_g is a
    tracer and the kernel takes the non-static HG path.  Regression: the HG
    cos_theta division by 2g at traced g=0 NaN-poisoned every scattered
    lane's direction, stalling those lanes at the trip bound and blowing up
    the gradients.  The guarded path must be bit-identical to eager iso."""
    from uivr_tpu.render import RenderSettings, make_render, \
        sample_batch_pixels
    from uivr_tpu.opt import losses
    b = smoke_scene(res=16, resx=32, resy=32, n_sensors=2)
    cfg = VolpathConfig(max_depth=6, engine="pallas")
    st = RenderSettings(integrator=cfg, medium=b.medium_cfg,
                        film_size=b.film_size, spp=4, spp_grad=2)
    render = make_render(st, b.to_world)
    si, px = sample_batch_pixels(jnp.uint32(1), 2, b.film_size, 128)
    ref = jnp.full((128, 3), 0.3, jnp.float32)

    def f(p):
        img = render(p, b.emitter, b.cameras, si, px, jnp.uint32(3),
                     jnp.uint32(4))
        return losses.l1(img, ref)

    loss_e, g_e = jax.value_and_grad(f)(b.params)
    loss_j, g_j = jax.jit(jax.value_and_grad(f))(b.params)
    assert np.isfinite(float(loss_j))
    # jit fusion rounding can flip a float-boundary event on O(1) of the
    # 512 lanes, shifting the loss by ~0.1-0.2%; 1e-2 still catches the
    # NaN-stall regression this test pins (loss blew up by >10x there)
    np.testing.assert_allclose(float(loss_j), float(loss_e), rtol=1e-2)
    # jit-vs-eager fusion rounding flips a few float-boundary paths, so the
    # realizations differ on a small fraction of entries (same metric as
    # test_kernel_adjoint_matches_flat); finiteness is the hard assertion
    for a, c in zip(jax.tree_util.tree_leaves(g_e),
                    jax.tree_util.tree_leaves(g_j)):
        a, c = np.asarray(a), np.asarray(c)
        assert np.isfinite(c).all()
        rel = np.abs(a - c).sum() / max(np.abs(a).sum(), 1e-12)
        assert rel < 0.05, rel


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


def test_nee_proxy_construction():
    """make_envmap builds the coarse proxy only above the texel cap; the
    proxy pdf integrates to ~1 over the sphere and is strictly positive."""
    from uivr_tpu.config.scenes import procedural_sky
    from uivr_tpu.scene import make_envmap
    small = make_envmap(procedural_sky(64, 128))
    assert small.nee is None
    big = make_envmap(procedural_sky(128, 128))
    assert big.nee is not None and big.nee.nee is None
    Hc, Wc, _ = big.nee.data.shape
    assert Hc * Wc <= 2048
    # proxy pdf: positive everywhere, consistent with its own sampler
    rng = np.random.RandomState(0)
    u2 = jnp.asarray(rng.rand(4096, 2), jnp.float32)
    d, pdf, _ = big.nee.sample_direction(u2)
    assert (np.asarray(pdf) > 0).all()
    pdf2 = big.nee.pdf_direction(d)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2),
                               rtol=1e-3, atol=1e-6)


def test_area_downsample_block_means():
    from uivr_tpu.scene.emitters import _area_downsample
    rng = np.random.RandomState(1)
    x = rng.rand(8, 12, 3).astype(np.float32)
    y = _area_downsample(x, 6)     # k=4 -> (2, 3)
    assert y.shape == (2, 3, 3)
    np.testing.assert_allclose(
        y, x.reshape(2, 4, 3, 4, 3).mean(axis=(1, 3)), rtol=1e-5)


def test_kernel_large_envmap_deferred_primal(smoke_bigenv):
    """Deferred-radiance NEE vs the flat engine's full-res NEE: different
    (both unbiased) estimators, so only the means must agree."""
    b, (sc, o, d) = smoke_bigenv
    assert vk.pallas_supported(sc, o.shape[0])
    assert vk._em_dims(sc)[3] == 128          # deferred mode engaged
    cfg = VolpathConfig(max_depth=6)
    seed = jnp.uint32(42)
    Lf, _ = vf.sample_primal(cfg, sc, o, d, seed)
    Lp, _ = vk.sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                    interpret=True)
    Lf, Lp = np.asarray(Lf), np.asarray(Lp)
    assert np.isfinite(Lp).all()
    np.testing.assert_allclose(Lf.mean(0), Lp.mean(0), rtol=0.08, atol=5e-3)


def test_kernel_large_envmap_compaction_exact(smoke_bigenv):
    """The deferred fix-up must commute with compaction rounds."""
    b, (sc, o, d) = smoke_bigenv
    cfg = VolpathConfig(max_depth=8)
    seed = jnp.uint32(11)
    oo, dd = o[:1024], d[:1024]
    La, _ = vk.sample_primal_pallas(cfg, sc, oo, dd, seed, schedule=None,
                                    interpret=True)
    Lb, _ = vk.sample_primal_pallas(cfg, sc, oo, dd, seed,
                                    schedule=(8, (512, 16), (256, None)),
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(La), np.asarray(Lb))


def test_render_grad_large_envmap_deferred(smoke_bigenv):
    """Full value_and_grad dispatch on a large-envmap scene: deferred-NEE
    gradients are finite and as aligned with the flat engine's as two
    INDEPENDENT flat realizations are with each other (the noise floor is
    measured in-test from flat runs with different seeds — the deferred
    estimator differs by construction, so only statistical agreement up to
    that floor is meaningful)."""
    from uivr_tpu.render import RenderSettings, make_render, \
        sample_batch_pixels
    from uivr_tpu.opt import losses
    b, _ = smoke_bigenv

    def grad_of(engine, seed):
        cfg = VolpathConfig(max_depth=6, engine=engine)
        st = RenderSettings(integrator=cfg, medium=b.medium_cfg,
                            film_size=b.film_size, spp=8, spp_grad=4)
        render = make_render(st, b.to_world)
        si, px = sample_batch_pixels(jnp.uint32(1), 2, b.film_size, 256)
        ref = jnp.full((256, 3), 0.3, jnp.float32)

        def f(p):
            img = render(p, b.emitter, b.cameras, si, px,
                         jnp.uint32(seed), jnp.uint32(seed + 1))
            return losses.l1(img, ref)
        loss, g = jax.value_and_grad(f)(b.params)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))
        return np.asarray(g.sigma_t).ravel()

    def cos(a, c):
        return float(a @ c / max(np.linalg.norm(a) * np.linalg.norm(c),
                                 1e-12))

    f3, f5 = grad_of("flat", 3), grad_of("flat", 5)
    p3 = grad_of("pallas", 3)
    floor = cos(f3, f5)            # seed-to-seed noise of the flat engine
    got = cos(p3, f3)
    assert got > min(floor - 0.1, 0.98), (got, floor)


def test_kernel_shadow_rr_matches_flat(smoke):
    """shadow_rr must keep the pallas/flat realization equivalence (same
    u_evt reuse, same replay decisions) for primal AND adjoint."""
    sc, o, d = smoke
    n = o.shape[0]
    cfg = VolpathConfig(max_depth=8, shadow_rr=0.1, trans_grad_samples=2)
    seed = jnp.uint32(31)
    Lf, _ = vf.sample_primal(cfg, sc, o, d, seed)
    Lp, _ = vk.sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                    interpret=True)
    agree = np.mean(np.all(np.abs(np.asarray(Lf) - np.asarray(Lp)) < 1e-5,
                           axis=-1))
    assert agree > 0.985, agree
    dL = jnp.full((n, 3), 1.0 / (3 * n), jnp.float32)
    gf = vf.sample_adjoint(cfg, sc, o, d, seed, dL, Lf, schedule=None)
    gp = vk.sample_adjoint_pallas(cfg, sc, o, d, seed, dL, Lp,
                                  schedule=None, interpret=True)
    for a, b in zip((gf.sigma_t, gf.albedo), (gp.sigma_t, gp.albedo)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        rel = np.abs(a - b).sum() / max(np.abs(a).sum(), 1e-12)
        assert rel < 0.05, rel


# ---------------------------------------------------------------------------
# K-candidate event batching (StepSpec.k_cand / UIVR_KCAND): same estimator,
# different deterministic TEA draw schedule — realization-invariant under
# compaction, statistically identical to k_cand=1.
# ---------------------------------------------------------------------------

def test_kernel_kcand_compaction_exact(smoke):
    """With k_cand=4, compaction stages must not change the realization.
    max_depth shrunk 8 -> 4 (interpret-mode while_loops dominate CPU test
    time; the compaction bit-exactness property is depth-independent)."""
    sc, o, d = smoke
    o, d = o[:1024], d[:1024]
    cfg = VolpathConfig(max_depth=4, rr_depth=3, shadow_rr=0.05)
    seed = jnp.uint32(11)
    La, _ = vk.sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                    interpret=True, k_cand=4)
    Lb, _ = vk.sample_primal_pallas(cfg, sc, o, d, seed,
                                    schedule=(4, (512, 8), (256, None)),
                                    interpret=True, k_cand=4)
    np.testing.assert_array_equal(np.asarray(La), np.asarray(Lb))


def test_kernel_kcand_mean_matches(smoke):
    """k_cand=4 vs k_cand=1: independent draw schedules, so only the MEANS
    agree (within MC noise at 2x1024 lanes).  max_depth shrunk 8 -> 4 for
    interpret-mode CPU time (the schedule-equivalence property holds at any
    depth)."""
    sc, o, d = smoke
    o, d = o[:1024], d[:1024]
    cfg = VolpathConfig(max_depth=4, rr_depth=3, shadow_rr=0.05)
    acc = {1: [], 4: []}
    for seed in (3, 7):
        for kc in (1, 4):
            L, _ = vk.sample_primal_pallas(cfg, sc, o, d, jnp.uint32(seed),
                                           schedule=None, interpret=True,
                                           k_cand=kc)
            acc[kc].append(np.asarray(L))
    m1 = np.concatenate(acc[1]).mean(0)
    m4 = np.concatenate(acc[4]).mean(0)
    np.testing.assert_allclose(m4, m1, rtol=0.1, atol=2e-3)


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


def test_kernel_classification_matches_flat_sparse(sparse):
    """In-kernel subcell classification (StepSpec.Ds) + primal in-kernel
    escape must be realization-identical to the flat engine on a medium
    with empty subcells — the strongest exercise of the hi==0 shadow path
    and the u*smaj >= hi null path (round-3 perf lever)."""
    sc, o, d = sparse
    # the fixture must actually have empty AND occupied classification cells
    from uivr_tpu.core.grids import build_bound_grid
    from uivr_tpu.ops.volpath_step import _cls_dims
    dims = _cls_dims(sc.medium.params.sigma_t.shape)
    assert min(dims) > 0
    hi = np.asarray(build_bound_grid(sc.medium.params.sigma_t, dims))
    assert (hi == 0.0).mean() > 0.3 and (hi > 0.0).mean() > 0.02, (
        (hi == 0.0).mean(), (hi > 0.0).mean())
    _compare(sc, o, d, VolpathConfig(max_depth=8, rr_depth=4,
                                     shadow_rr=0.05))


def test_kernel_classification_adjoint_sparse(sparse):
    """Adjoint gradients with classification active vs the flat adjoint on
    the sparse medium (same estimator + streams)."""
    sc, o, d = sparse
    n = o.shape[0]
    cfg = VolpathConfig(max_depth=6, trans_grad_samples=2, shadow_rr=0.05)
    seed = jnp.uint32(23)
    rng = np.random.RandomState(4)
    dL = jnp.asarray(rng.rand(n, 3), jnp.float32) / n
    Lf, _ = vf.sample_primal(cfg, sc, o, d, seed)
    gf = vf.sample_adjoint(cfg, sc, o, d, seed, dL, Lf, schedule=None)
    Lp, _ = vk.sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                    interpret=True)
    gp = vk.sample_adjoint_pallas(cfg, sc, o, d, seed, dL, Lp,
                                  schedule=None, interpret=True)
    for a, b in zip((gf.sigma_t, gf.albedo), (gp.sigma_t, gp.albedo)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).sum() / max(np.abs(a).sum(), 1e-12)
        assert rel < 0.05, rel
