"""Pallas fused-step engine, part 1: ADJOINT parity, persistent
scheduler, traced-scene dispatch, shadow-RR and K-candidate compaction
(split again in round 5 — see test_pallas_adjoint2.py and
docs/XLA_CPU_CRASH_REPORT.md)."""
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


def test_adjoint_persistent_matches_staged(smoke):
    """Persistent-wavefront adjoint scheduler vs the staged adjoint: lane
    RNG streams derive from the RAY id and gradients are scatter-added per
    dispatch, so the gradient realization matches up to FMA path flips;
    the DRT reservoir collected at eviction must reproduce the staged
    readout (use_drt + subsampling + NEE + tgs covers every eviction
    side-channel)."""
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
    g1 = vk.sample_adjoint_pallas(cfg, sc, o, d, seed, dL, Lp,
                                  schedule=None, interpret=True)
    # width < n forces refill cycles + the straggler stage
    g2 = vk.sample_adjoint_persistent(cfg, sc, o, d, seed, dL, Lp,
                                      width=512, refill_every=4,
                                      interpret=True)
    for a, b in zip((g1.sigma_t, g1.albedo), (g2.sigma_t, g2.albedo)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).sum() / max(np.abs(a).sum(), 1e-12)
        assert rel < 0.02, rel


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
