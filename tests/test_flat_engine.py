"""Flat-engine specifics: compaction exactness, RR unbiasedness, replay RNG."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uivr_tpu.config import cube_test_scene
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.integrators import volpath_flat as vf
from uivr_tpu.scene import Scene, finalize_medium
from uivr_tpu.scene.camera import sample_rays


@pytest.fixture(scope="module")
def setup():
    b = cube_test_scene()
    sc = Scene(medium=finalize_medium(b.params, b.medium_cfg, b.to_world),
               emitter=b.emitter, cameras=b.cameras)
    xs, ys = np.meshgrid(np.arange(4), np.arange(4))
    uv = (np.stack([xs.ravel(), ys.ravel()], -1) + 0.5) / 4.0 * 0.5 + 0.25
    uv = jnp.asarray(np.tile(uv, (1024, 1)), jnp.float32)
    o, d = sample_rays(b.cameras, jnp.zeros((uv.shape[0],), jnp.int32), uv)
    return b, sc, o, d


def test_compaction_bit_exact_primal(setup):
    """Compaction rounds must reproduce the plain loop EXACTLY (lane
    independence + per-lane RNG counters)."""
    b, sc, o, d = setup
    cfg = VolpathConfig(max_depth=16)
    Lp, _ = jax.jit(lambda s: vf.sample_primal(cfg, sc, o, d, s))(jnp.uint32(1))
    Lc, _ = jax.jit(lambda s: vf.sample_primal_compact(
        cfg, sc, o, d, s, schedule=(48, None, None)))(jnp.uint32(1))
    np.testing.assert_array_equal(np.asarray(Lp), np.asarray(Lc))


def test_compaction_bit_exact_adjoint(setup):
    b, sc, o, d = setup
    cfg = VolpathConfig(max_depth=8)
    N = o.shape[0]

    def adj(seed, sched):
        L, _ = vf.sample_primal(cfg, sc, o, d, seed)
        dL = jnp.full((N, 3), 1.0 / (N * 3))
        return vf.sample_adjoint(cfg, sc, o, d, seed, dL, L, schedule=sched)
    g1 = jax.jit(lambda s: adj(s, (48, None, None)))(jnp.uint32(5))
    g2 = jax.jit(lambda s: adj(s, None))(jnp.uint32(5))
    # identical estimator realization; only the scatter-add ORDER into the
    # shared gradient tables differs (non-associative float sums), so the
    # match is near-exact rather than bitwise
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-8)


def test_russian_roulette_unbiased(setup):
    """RR-on and RR-off estimate the same image (different variance)."""
    b, sc, o, d = setup
    La, _ = jax.jit(lambda s: vf.sample_primal_compact(
        VolpathConfig(max_depth=16, rr_depth=2), sc, o, d, s))(jnp.uint32(1))
    Lb, _ = jax.jit(lambda s: vf.sample_primal_compact(
        VolpathConfig(max_depth=16), sc, o, d, s))(jnp.uint32(2))
    ma = np.asarray(La).reshape(-1, 16, 3).mean(0)
    mb = np.asarray(Lb).reshape(-1, 16, 3).mean(0)
    # RR at depth 2 adds variance; 1024 reps -> ~5% tolerance
    np.testing.assert_allclose(ma, mb, atol=0.05)


def test_flat_primal_deterministic(setup):
    b, sc, o, d = setup
    cfg = VolpathConfig(max_depth=16)
    f = jax.jit(lambda s: vf.sample_primal_compact(cfg, sc, o, d, s)[0])
    np.testing.assert_array_equal(np.asarray(f(jnp.uint32(9))),
                                  np.asarray(f(jnp.uint32(9))))
    assert np.abs(np.asarray(f(jnp.uint32(9))) -
                  np.asarray(f(jnp.uint32(10)))).max() > 0


def test_shadow_rr_unbiased_and_fewer_steps():
    """Shadow-walk RR preserves the estimate (value unbiasedness) while
    cutting per-lane tracking work on a dense medium; the adjoint gradients
    stay consistent (detached-q pathwise estimator)."""
    from uivr_tpu.config import smoke_scene
    b = smoke_scene(res=16, resx=32, resy=32, n_sensors=2)
    sc = Scene(medium=finalize_medium(b.params, b.medium_cfg, b.to_world),
               emitter=b.emitter, cameras=b.cameras)
    rng = np.random.RandomState(3)
    n = 2048
    uv = jnp.asarray(rng.rand(n, 2) * 0.6 + 0.2, jnp.float32)
    o, d = sample_rays(b.cameras, jnp.zeros((n,), jnp.int32), uv)

    def run(rr, seed):
        cfg = VolpathConfig(max_depth=16, shadow_rr=rr)
        L, _, st = jax.jit(lambda s: vf.sample_primal(
            cfg, sc, o, d, s, return_stats=True))(jnp.uint32(seed))
        return (np.asarray(L), np.asarray(st["lane_dims"])
                .astype(np.int64).mean())

    # same seed: RR kills can only SHORTEN walks (reused u_evt draw)
    L0, w0 = run(0.0, 1)
    L1, w1 = run(0.1, 1)
    assert w1 < 0.9 * w0, (w1, w0)
    # unbiasedness: means over lanes agree (independent-seed realizations)
    L1b, _ = run(0.1, 2)
    m0, m1 = L0.mean(0), np.concatenate([L1, L1b]).mean(0)
    np.testing.assert_allclose(m0, m1, rtol=0.08, atol=5e-3)

    def grad(rr, seed):
        cfg = VolpathConfig(max_depth=8, shadow_rr=rr, trans_grad_samples=2)
        L, _ = vf.sample_primal(cfg, sc, o, d, seed)
        dL = jnp.full((n, 3), 1.0 / (n * 3))
        g = vf.sample_adjoint(cfg, sc, o, d, seed, dL, L, schedule=None)
        return np.concatenate([np.asarray(x).ravel() for x in
                               (g.sigma_t, g.albedo)])

    g0 = grad(0.0, jnp.uint32(7))
    g1 = grad(0.1, jnp.uint32(7))
    assert np.isfinite(g1).all()
    # same-seed realizations share every non-shadow stream; only NEE
    # contributions/cotangents differ.  Calibration (2026-08-18): two
    # INDEPENDENT-seed realizations of the rr=0 estimator agree at only
    # cos ~0.30 at this sample count (variance-dominated), and 8-seed
    # rr-on vs rr-off averages match that floor exactly (no bias signal);
    # the same-seed pair measured 0.90.
    cos = float(g0 @ g1 / max(np.linalg.norm(g0) * np.linalg.norm(g1),
                              1e-12))
    assert cos > 0.85, cos
