"""Pallas fused-step engine, part 2: deferred-tc, dispatch-path grad,
odd-width padding and K-candidate mean tests.

Split from test_pallas_adjoint.py along the round-5 bisect of the XLA:CPU
cumulative-state compile crash (docs/XLA_CPU_CRASH_REPORT.md): each half
of the original file passes in one process, the whole file does not — so
the default per-file runner stays green without the one-test-per-process
fallback."""
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


def test_adjoint_persistent_deferred_tc(smoke, monkeypatch):
    """UIVR_DEFER_TC=1: transmittance-gradient rows accumulate in per-lane
    pending slots (overflow-flushed), collect per ray at eviction, and
    scatter once at the end — the gradient must equal the eager path up to
    float summation order.  Tiny P forces the overflow-flush branch."""
    sc, o, d = smoke
    n = o.shape[0]
    cfg = VolpathConfig(max_depth=8, rr_depth=5, trans_grad_samples=2,
                        use_drt=True, use_drt_subsampling=True,
                        use_drt_mis=True, shadow_rr=0.05)
    seed = jnp.uint32(29)
    rng = np.random.RandomState(5)
    dL = jnp.asarray(rng.rand(n, 3), jnp.float32) / n
    Lp, _ = vk.sample_primal_pallas(cfg, sc, o, d, seed, schedule=None,
                                    interpret=True)
    g1 = vk.sample_adjoint_persistent(cfg, sc, o, d, seed, dL, Lp,
                                      width=512, refill_every=4,
                                      interpret=True)
    monkeypatch.setenv("UIVR_DEFER_TC", "1")
    monkeypatch.setenv("UIVR_DEFER_P", "4")   # 2 segments: exercise flush
    g2 = vk.sample_adjoint_persistent(cfg, sc, o, d, seed, dL, Lp,
                                      width=512, refill_every=4,
                                      interpret=True)
    for a, b in zip((g1.sigma_t, g1.albedo), (g2.sigma_t, g2.albedo)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).sum() / max(np.abs(a).sum(), 1e-12)
        assert rel < 1e-4, rel



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

