"""Integrator correctness: the test strategy mirrors the reference
(tests/test_integrators.py, SURVEY.md §4):

- tiny deterministic 3x3x3 cube scene (exhaustive per-voxel FD tractable)
- FD oracle with common random numbers as the gradient ground truth
- primal parity via independent estimators (NEE on/off must agree; analytic
  transmittance for a purely absorbing medium)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uivr_tpu.config import cube_test_scene
from uivr_tpu.integrators import NerfConfig, VolpathConfig
from uivr_tpu.render import RenderSettings, make_render, sample_batch_pixels
from uivr_tpu.scene.medium import MediumParams
from uivr_tpu.validation import fd_gradients


def _make(bundle, int_cfg, spp, spp_grad=None):
    st = RenderSettings(integrator=int_cfg, medium=bundle.medium_cfg,
                        film_size=bundle.film_size, spp=spp,
                        spp_grad=spp_grad or spp)
    return st, make_render(st, bundle.to_world)


def _grid_pixels(resx, resy, stride=1):
    xs, ys = np.meshgrid(np.arange(0, resx, stride), np.arange(0, resy, stride))
    pix = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.int32)
    return jnp.asarray(pix), jnp.zeros((pix.shape[0],), jnp.int32)


# ---------------------------------------------------------------- nerf

def test_nerf_primal_renders_scene():
    b = cube_test_scene(resx=32, resy=32)
    st, render = _make(b, NerfConfig(queries_per_ray=64), spp=2)
    pixels, sidx = _grid_pixels(32, 32)
    img = render(b.params, b.emitter, b.cameras, sidx, pixels,
                 jnp.uint32(3), jnp.uint32(4))
    img = np.asarray(img).reshape(32, 32, 3)
    assert np.isfinite(img).all()
    # corner pixels miss the cube -> pure background [1.0, 0.8, 0.2]
    np.testing.assert_allclose(img[0, 0], [1.0, 0.8, 0.2], rtol=1e-4)
    # central pixels hit the emissive medium and differ from background
    assert abs(img[16, 16] - np.array([1.0, 0.8, 0.2])).max() > 0.05
    # medium emission is capped -> radiance stays bounded
    assert img.max() < 10.0


def test_nerf_adjoint_exact_same_rays():
    """The manual PRB adjoint must equal the pathwise derivative when primal
    and adjoint share rays + sampler (exact check, tol limited only by FD
    epsilon-curvature): validates the two-term per-step gradient algebra."""
    from uivr_tpu.core import make_sampler
    from uivr_tpu.integrators import nerf as nerf_mod
    from uivr_tpu.scene import Scene, finalize_medium
    from uivr_tpu.scene.camera import sample_rays

    b = cube_test_scene(resx=16, resy=16)
    cfg = NerfConfig(queries_per_ray=32)
    xs, ys = np.meshgrid(np.arange(16), np.arange(16))
    uv = jnp.asarray((np.stack([xs.ravel(), ys.ravel()], -1) + 0.5) / 16.0,
                     jnp.float32)
    sidx = jnp.zeros((256,), jnp.int32)
    o, d = sample_rays(b.cameras, sidx, uv)
    N = 256

    def scene_of(params):
        return Scene(medium=finalize_medium(params, b.medium_cfg, b.to_world),
                     emitter=b.emitter, cameras=b.cameras)

    @jax.jit
    def loss(params):
        L, _, _ = nerf_mod.sample_primal(cfg, scene_of(params), o, d,
                                         make_sampler(7, n_lanes=N))
        return jnp.mean(jnp.square(L - 0.5))

    @jax.jit
    def adj_grads(params):
        sc = scene_of(params)
        L, _, _ = nerf_mod.sample_primal(cfg, sc, o, d,
                                         make_sampler(7, n_lanes=N))
        dL = 2.0 * (L - 0.5) / (N * 3)
        g, _ = nerf_mod.sample_adjoint(cfg, sc, o, d,
                                       make_sampler(7, n_lanes=N), dL, L)
        return g

    g = adj_grads(b.params)
    fd = fd_gradients(lambda p: loss(p), b.params, eps=2e-3,
                      keys=("sigma_t", "emission"), central=True)
    for key in ("sigma_t", "emission"):
        ga = np.asarray(getattr(g, key)).ravel()
        gf = fd[key].ravel()
        rel = np.abs(ga - gf) / np.abs(gf).max()
        assert rel.max() < 0.02, (key, rel.max())
        assert np.corrcoef(ga, gf)[0, 1] > 0.99999, key
    np.testing.assert_allclose(np.asarray(g.albedo), 0.0)


def test_nerf_gradients_match_fd():
    """nerf adjoint through the full batched render op vs per-voxel FD
    (reference test_02, tests/test_integrators.py:158-218).  The adjoint
    deliberately uses DECORRELATED rays through the same pixels
    (unbiasedness), so tolerances are statistical like the reference's
    (global rtol up to 0.75 there; we hold a much tighter bound)."""
    b = cube_test_scene(resx=16, resy=16)
    cfg = NerfConfig(queries_per_ray=32)
    st, render = _make(b, cfg, spp=2)
    pixels, sidx = _grid_pixels(16, 16)
    seed, seed_grad = jnp.uint32(11), jnp.uint32(12)

    @jax.jit
    def loss(params):
        img = render(params, b.emitter, b.cameras, sidx, pixels, seed, seed_grad)
        return jnp.mean(jnp.square(img - 0.5))

    g = jax.jit(jax.grad(loss))(b.params)
    fd = fd_gradients(lambda p: loss(p), b.params, eps=5e-3,
                      keys=("sigma_t", "emission"))

    for key in ("sigma_t", "emission"):
        ga = np.asarray(getattr(g, key)).ravel()
        gf = fd[key].ravel()
        scale = np.abs(gf).max()
        assert scale > 0
        viol = np.abs(ga - gf) > 0.2 * scale + 0.2 * np.abs(gf)
        assert viol.sum() <= 3, (key, ga[viol], gf[viol])
        corr = np.corrcoef(ga, gf)[0, 1]
        assert corr > 0.99, (key, corr)
    # albedo is unused by nerf
    np.testing.assert_allclose(np.asarray(g.albedo), 0.0)


# ---------------------------------------------------------------- volpath

@pytest.mark.parametrize("engine", ["flat", "nested"])
def test_volpath_primal_vs_analytic_absorbing(engine):
    """Pure absorption (albedo=0): L = T * envmap, with T computable by
    dense quadrature along each ray."""
    b = cube_test_scene(resx=8, resy=8)
    params = b.params._replace(albedo=jnp.zeros_like(b.params.albedo))
    cfg = VolpathConfig(max_depth=8, use_nee=False, use_drt=False,
                        engine=engine)
    st, render = _make(b, cfg, spp=1024)
    pixels, sidx = _grid_pixels(8, 8)
    img = render(params, b.emitter, b.cameras, sidx, pixels,
                 jnp.uint32(5), jnp.uint32(6))
    img = np.asarray(img)

    # dense-quadrature oracle over the IDENTICAL jittered ray set the render
    # used (pixels span large solid angles at 8x8, so per-pixel averaging
    # over the subpixel jitters is part of the estimate)
    from uivr_tpu.core import aabb, sample_tea_32
    from uivr_tpu.scene import finalize_medium, sigma_t_at
    from uivr_tpu.render.batched import _expand_rays
    m = finalize_medium(params, b.medium_cfg, b.to_world)
    sub_seed, _ = sample_tea_32(jnp.uint32(5), 22)
    spp = 1024
    o, d = _expand_rays(b.cameras, sidx, pixels, b.film_size, spp, sub_seed)
    ol = aabb.transform_points(m.world_to_local, o)
    dl = aabb.transform_dirs(m.world_to_local, d)
    tn, tf, hit = aabb.ray_unit_cube(ol, dl)
    K = 512
    seg = np.asarray(tf - tn)
    tau = np.zeros(ol.shape[0], np.float64)
    for k in range(K):
        ts = tn + (tf - tn) * (k + 0.5) / K
        pts = ol + ts[:, None] * dl
        tau += np.asarray(sigma_t_at(m, pts), np.float64)
    tau *= seg / K
    T = np.where(np.asarray(hit), np.exp(-tau), 1.0)
    oracle = (T.reshape(-1, spp).mean(1))[:, None] * np.array([1.0, 0.8, 0.2])

    np.testing.assert_allclose(img, oracle, atol=0.055)  # ~3.5 sigma @ spp 1024


@pytest.mark.parametrize("nee", [True, False])
def test_volpath_primal_nee_consistency(nee):
    """NEE-on/off and flat/nested engines are all unbiased estimators of
    the same image; their high-spp renders must agree (catches pdf/MIS and
    scheduling bookkeeping bugs)."""
    b = cube_test_scene(resx=8, resy=8)
    cfg_a = VolpathConfig(max_depth=16, use_nee=nee, use_drt=False,
                          engine="flat")
    cfg_b = VolpathConfig(max_depth=16, use_nee=not nee, use_drt=False,
                          engine="nested")
    st_a, render_a = _make(b, cfg_a, spp=1024)
    st_b, render_b = _make(b, cfg_b, spp=1024)
    pixels, sidx = _grid_pixels(8, 8)
    img_a = np.asarray(render_a(b.params, b.emitter, b.cameras, sidx, pixels,
                                jnp.uint32(7), jnp.uint32(8)))
    img_b = np.asarray(render_b(b.params, b.emitter, b.cameras, sidx, pixels,
                                jnp.uint32(17), jnp.uint32(18)))
    np.testing.assert_allclose(img_a, img_b, atol=0.055)


def _fixed_rays(b, rep):
    from uivr_tpu.scene.camera import sample_rays
    xs, ys = np.meshgrid(np.arange(4), np.arange(4))
    uv = (np.stack([xs.ravel(), ys.ravel()], -1) + 0.5) / 4.0 * 0.5 + 0.25
    uv = jnp.asarray(np.tile(uv, (rep, 1)), jnp.float32)
    sidx = jnp.zeros((uv.shape[0],), jnp.int32)
    return sample_rays(b.cameras, sidx, uv)


def _adjoint_grads(b, cfg, o, d, seed):
    from uivr_tpu.core import make_sampler
    from uivr_tpu.integrators import volpath_flat as vflat
    from uivr_tpu.integrators import volpathsimple as vps
    from uivr_tpu.scene import Scene, finalize_medium

    sc = Scene(medium=finalize_medium(b.params, b.medium_cfg, b.to_world),
               emitter=b.emitter, cameras=b.cameras)
    N = o.shape[0]

    @jax.jit
    def run(seed):
        dL = jnp.full((N, 3), 1.0 / (N * 3), jnp.float32)
        if cfg.engine == "pallas":
            from uivr_tpu.ops import volpath_step as vk
            L, _ = vk.sample_primal_pallas(cfg, sc, o, d, seed,
                                           schedule=None)
            return vk.sample_adjoint_pallas(cfg, sc, o, d, seed, dL, L,
                                            schedule=None)
        if cfg.engine == "flat":
            L, _ = vflat.sample_primal(cfg, sc, o, d, seed)
            return vflat.sample_adjoint(cfg, sc, o, d, seed, dL, L)
        L, _, _ = vps.sample_primal(cfg, sc, o, d, make_sampler(seed, n_lanes=N))
        g, _ = vps.sample_adjoint(cfg, sc, o, d,
                                  make_sampler(seed, n_lanes=N), dL, L)
        return g
    return run(jnp.uint32(seed))


@pytest.mark.slow
@pytest.mark.parametrize("engine", ["flat", "nested", "pallas"])
def test_volpath_adjoint_vs_quadrature_oracle(engine):
    """Free-flight adjoint sigma/albedo gradients vs an EXACT differentiable
    single-scatter quadrature oracle (max_depth=2, no NEE, constant
    emitter): validates the in-scattering score term, the transmittance
    gradients and the PRB bookkeeping to ~1%.  (Stronger than the
    reference's FD oracle, which has high variance under discrete
    real/null-event flips.)"""
    from uivr_tpu.core import aabb
    from uivr_tpu.scene import albedo_at, finalize_medium, sigma_t_at

    b = cube_test_scene()
    cfg = VolpathConfig(max_depth=2, use_nee=False, use_drt=False,
                        engine=engine)
    o, d = _fixed_rays(b, rep=4096)
    gs = np.stack([
        np.concatenate([np.asarray(g.sigma_t).ravel(),
                        np.asarray(g.albedo).ravel()])
        for g in (_adjoint_grads(b, cfg, o, d, 300 + s) for s in range(4))])
    g_adj = gs.mean(0)

    # ---- oracle: L = T*env + single scattering, full quadrature
    m0 = finalize_medium(b.params, b.medium_cfg, b.to_world)
    o16, d16 = o[:16], d[:16]
    ol = aabb.transform_points(m0.world_to_local, o16)
    dl = aabb.transform_dirs(m0.world_to_local, d16)
    tn, tf, _ = aabb.ray_unit_cube(ol, dl)
    K, K2, M = 192, 96, 72
    i = np.arange(M)
    golden = np.pi * (3 - np.sqrt(5))
    ymd = 1 - 2 * (i + 0.5) / M
    r = np.sqrt(1 - ymd ** 2)
    dirs_w = np.stack([np.cos(golden * i) * r, ymd,
                       np.sin(golden * i) * r], -1).astype(np.float32)
    dirs_l = jnp.asarray(dirs_w) @ m0.world_to_local[:3, :3].T
    env_mean = jnp.asarray(np.array([1.0, 0.8, 0.2], np.float32))

    def oracle(params):
        m = finalize_medium(params, b.medium_cfg, b.to_world)
        ts = tn[:, None] + (tf - tn)[:, None] * (jnp.arange(K) + 0.5) / K
        pts = ol[:, None, :] + ts[..., None] * dl[:, None, :]
        sig = sigma_t_at(m, pts.reshape(-1, 3)).reshape(16, K)
        dt = ((tf - tn) / K)[:, None]
        tau_cum = jnp.cumsum(sig, 1) * dt - sig * dt * 0.5
        T_in = jnp.exp(-tau_cum)
        alb = albedo_at(m, pts.reshape(-1, 3)).reshape(16, K, 3)
        p_flat = pts.reshape(-1, 3)

        def exitT(dirl):
            _, tf2, _ = aabb.ray_unit_cube(p_flat,
                                           jnp.broadcast_to(dirl, p_flat.shape))
            ts2 = tf2[:, None] * (jnp.arange(K2) + 0.5) / K2
            q = p_flat[:, None, :] + ts2[..., None] * dirl[None, None, :]
            s2 = sigma_t_at(m, q.reshape(-1, 3)).reshape(-1, K2)
            return jnp.exp(-jnp.sum(s2, 1) * tf2 / K2)
        Texit = jnp.stack([exitT(dirs_l[j]) for j in range(M)], 1)
        Texit = Texit.mean(1).reshape(16, K)
        T_chord = jnp.exp(-jnp.sum(sig, 1) * (tf - tn) / K)
        Lbg = T_chord[:, None] * env_mean
        Lss = jnp.sum((sig * T_in * Texit)[:, :, None] * alb * dt[..., None],
                      1) * env_mean
        return jnp.mean(Lbg + Lss)

    g_or = jax.grad(oracle)(b.params)
    g_ref = np.concatenate([np.asarray(g_or.sigma_t).ravel(),
                            np.asarray(g_or.albedo).ravel()])
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_adj / scale, g_ref / scale, atol=0.02)


@pytest.mark.slow
def test_volpath_gradient_estimators_cross_consistent():
    """basic / DRT / DRT-quadratic (all with NEE) are unbiased estimators of
    the same gradient: their multi-seed means must agree.  Validates the DRT
    sampler + reservoir subsampling + MIS against the oracle-validated
    baseline."""
    b = cube_test_scene()
    o, d = _fixed_rays(b, rep=2048)
    cfgs = {
        "basic": VolpathConfig(max_depth=16, use_nee=True, use_drt=False,
                               engine="nested"),
        "drt": VolpathConfig(max_depth=16, use_nee=True, use_drt=True,
                             use_drt_subsampling=True, use_drt_mis=True,
                             engine="nested"),
        "drtq": VolpathConfig(max_depth=16, use_nee=True, use_drt=True,
                              use_drt_subsampling=False, use_drt_mis=True,
                              engine="nested"),
        "basic-flat": VolpathConfig(max_depth=16, use_nee=True,
                                    use_drt=False, engine="flat"),
        "drt-flat": VolpathConfig(max_depth=16, use_nee=True, use_drt=True,
                                  use_drt_subsampling=True, use_drt_mis=True,
                                  engine="flat"),
    }
    means = {}
    for name, cfg in cfgs.items():
        gs = np.stack([
            np.concatenate([np.asarray(g.sigma_t).ravel(),
                            np.asarray(g.albedo).ravel()])
            for g in (_adjoint_grads(b, cfg, o, d, 400 + 17 * s)
                      for s in range(6))])
        means[name] = gs.mean(0)
    scale = np.abs(means["basic"]).max()
    for a, bb in [("basic", "drt"), ("basic", "drtq"), ("drt", "drtq"),
                  ("basic", "basic-flat"), ("drt", "drt-flat"),
                  ("basic", "drt-flat")]:
        diff = np.abs(means[a] - means[bb]) / scale
        assert np.median(diff) < 0.03, (a, bb, np.median(diff))
        assert diff.max() < 0.15, (a, bb, diff.max())
        corr = np.corrcoef(means[a], means[bb])[0, 1]
        assert corr > 0.99, (a, bb, corr)


# ---------------------------------------------------------------- batching

def test_sample_batch_pixels_deterministic_and_in_range():
    sidx, pix = sample_batch_pixels(jnp.uint32(9), 7, (33, 17), 4096)
    sidx2, pix2 = sample_batch_pixels(jnp.uint32(9), 7, (33, 17), 4096)
    np.testing.assert_array_equal(np.asarray(sidx), np.asarray(sidx2))
    np.testing.assert_array_equal(np.asarray(pix), np.asarray(pix2))
    assert np.asarray(sidx).min() >= 0 and np.asarray(sidx).max() < 7
    p = np.asarray(pix)
    assert p[:, 0].max() < 33 and p[:, 1].max() < 17
    # all sensors get sampled
    assert len(np.unique(np.asarray(sidx))) == 7


# ------------------------------------------------- in-step SPP splitting

@pytest.mark.slow
def test_spp_chunked_render_matches_unchunked():
    """RenderSettings.max_rays_per_pass splits the primal/adjoint passes
    into spp chunks with per-chunk seeds (the reference's multi-pass
    splitting, optimize.py:24-51).  Chunked and unchunked are different
    but identically-distributed estimators: their seed-averaged images and
    gradients must agree within MC noise, and a single chunked step must
    stay finite."""
    b = cube_test_scene(resx=16, resy=16)
    cfg = VolpathConfig(max_depth=4, use_nee=True, use_drt=False,
                        engine="flat")
    pixels, sidx = _grid_pixels(16, 16)
    B = pixels.shape[0]

    def build(max_rays):
        st = RenderSettings(integrator=cfg, medium=b.medium_cfg,
                            film_size=b.film_size, spp=16, spp_grad=16,
                            max_rays_per_pass=max_rays)
        return make_render(st, b.to_world)

    render_u = build(1 << 30)           # single pass
    render_c = build(B * 4)             # spp chunks of 4 (4 chunks)

    def avg(render, lo):
        imgs, grads = [], []
        for s in range(lo, lo + 4):
            def f(p):
                img = render(p, b.emitter, b.cameras, sidx, pixels,
                             jnp.uint32(2 * s), jnp.uint32(2 * s + 1))
                return jnp.mean(img), img
            (_, img), g = jax.value_and_grad(f, has_aux=True)(b.params)
            imgs.append(np.asarray(img))
            grads.append(np.asarray(g.sigma_t).ravel())
        return np.mean(imgs, 0), np.mean(grads, 0)

    img_u, g_u = avg(render_u, 100)
    img_c, g_c = avg(render_c, 200)
    assert np.isfinite(img_c).all() and np.isfinite(g_c).all()
    # seed-averaged images agree within MC noise (4 seeds x 16 spp of a
    # heavy-tailed path-traced estimator: a handful of 2-3 sigma pixels
    # is expected; bound the bulk and the mean instead of the max)
    diff = np.abs(img_c - img_u)
    assert np.quantile(diff, 0.95) < 0.13, np.quantile(diff, 0.95)
    assert abs(img_c.mean() - img_u.mean()) < 0.01
    # gradient direction agrees (per-voxel gradients are noisy at this spp;
    # the estimators are identically distributed, so correlation is high)
    corr = np.corrcoef(g_u, g_c)[0, 1]
    assert corr > 0.9, corr


# --------------------------------------- independent deep-scattering oracle

@pytest.mark.slow
def test_volpath_deep_parity_vs_dense_march_oracle():
    """Trusted-renderer parity at production character (reference test_03,
    tests/test_integrators.py:222-257, checks volpathsimple against stock
    volpath at 4096 spp).  Our independent estimator is a dense-substep
    path tracer sharing NO machinery with the tracking engines: free
    flights are sampled by accumulating optical depth over fixed substeps
    until it exceeds -log(u) (no majorants, no null events, no NEE, plain
    jax.random instead of TEA streams).  Its discretization bias is
    O(substep^2) and negligible at 512 substeps across the cube.  Deep
    multiple scattering (max_depth 16) must agree between the two."""
    from uivr_tpu.core import aabb
    from uivr_tpu.scene import albedo_at, finalize_medium, sigma_t_at

    b = cube_test_scene(resx=8, resy=8, density_scale=4.0)
    m = finalize_medium(b.params, b.medium_cfg, b.to_world)
    env = np.array([1.0, 0.8, 0.2], np.float32)
    max_depth, K, spp = 16, 512, 1024

    pixels, sidx = _grid_pixels(8, 8)
    cfg = VolpathConfig(max_depth=max_depth, use_nee=True, use_drt=False,
                        engine="flat")
    st, render = _make(b, cfg, spp=spp)
    img = np.asarray(render(b.params, b.emitter, b.cameras, sidx, pixels,
                            jnp.uint32(5), jnp.uint32(6)))

    # oracle rays: same pixels, fresh jittered subpixels via jax.random
    from uivr_tpu.scene.camera import sample_rays
    key = jax.random.PRNGKey(42)
    key, k1 = jax.random.split(key)
    rep = np.repeat(np.arange(64), spp)
    pix = np.asarray(pixels)[rep].astype(np.float32)
    uv = jnp.asarray((pix + np.asarray(jax.random.uniform(
        k1, (64 * spp, 2)))) / 8.0)
    o, d = sample_rays(b.cameras, jnp.zeros((64 * spp,), jnp.int32), uv)
    n = o.shape[0]

    ol = aabb.transform_points(m.world_to_local, o)
    dl = aabb.transform_dirs(m.world_to_local, d)

    @jax.jit
    def oracle(key):
        def body(depth, state):
            key, ol_, dl_, dw, thr, res, active = state
            tn, tf, hit = aabb.ray_unit_cube(ol_, dl_, 0.0, aabb.INF)
            seg = jnp.where(hit, tf - tn, 0.0)
            key, ku = jax.random.split(key)
            tau_target = -jnp.log1p(-jax.random.uniform(ku, (n,)))
            h = seg / K

            def march(i, acc):
                tau, t_sc, found = acc
                ts = tn + (i + 0.5) * h
                p = ol_ + ts[:, None] * dl_
                dtau = sigma_t_at(m, p) * h
                newly = (~found) & (tau + dtau >= tau_target)
                # locate within the substep by linear interpolation
                frac = jnp.clip((tau_target - tau) / jnp.maximum(dtau, 1e-20),
                                0.0, 1.0)
                t_sc = jnp.where(newly, tn + i * h + frac * h, t_sc)
                return tau + dtau, t_sc, found | newly

            tau0 = jnp.zeros(n)
            _, t_sc, found = jax.lax.fori_loop(
                0, K, march, (tau0, jnp.zeros(n), jnp.zeros(n, bool)))
            escaped = active & ~(hit & found)
            res = res + jnp.where(escaped[:, None], thr, 0.0) * env
            # scatter: multiply albedo, sample isotropic direction
            p_sc = ol_ + t_sc[:, None] * dl_
            alb = albedo_at(m, p_sc)
            scat = active & hit & found
            thr = jnp.where(scat[:, None], thr * alb, thr)
            key, kd = jax.random.split(key)
            u = jax.random.uniform(kd, (n, 2))
            z = 1.0 - 2.0 * u[:, 0]
            r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
            phi = 2.0 * np.pi * u[:, 1]
            nd = jnp.stack([r * jnp.cos(phi), z, r * jnp.sin(phi)], -1)
            dl_ = jnp.where(scat[:, None], nd, dl_)
            ol_ = jnp.where(scat[:, None], p_sc, ol_)
            return (key, ol_, dl_, dw, thr, res, scat)

        thr0 = jnp.ones((n, 3))
        res0 = jnp.zeros((n, 3))
        state = (key, ol, dl, dl, thr0, res0, jnp.ones(n, bool))
        state = jax.lax.fori_loop(0, max_depth, lambda i, s: body(i, s),
                                  state)
        # depth-capped survivors contribute nothing (matches max_depth kill)
        return state[5]

    L = oracle(jax.random.PRNGKey(7))
    img_o = np.asarray(L).reshape(64, spp, 3).mean(1).reshape(8, 8, 3)
    img = img.reshape(8, 8, 3)
    # 0.07 ~= 4 sigma of the heavier-tailed estimator at 1024 spp (the
    # reference's parity test uses atol 5e-2 at 4096 spp, test:252-257)
    np.testing.assert_allclose(img, img_o, atol=0.07)
