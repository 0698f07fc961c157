"""Pallas fused-step engine: large-envmap deferred-radiance NEE and
in-kernel subcell classification (split from test_pallas_kernel.py,
see tests/pallas_common.py)."""
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
