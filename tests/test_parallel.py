"""Multi-chip sharding: the full sharded training step must compile and run
on the virtual 8-device CPU mesh, be deterministic, and agree statistically
with the single-device path (tests the reference lacks — SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uivr_tpu.config import smoke_scene
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.opt import losses
from uivr_tpu.parallel import (make_mesh, replicate, shard_batch,
                               sharded_loss_and_grad)
from uivr_tpu.render import RenderSettings, make_render, sample_batch_pixels


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    bundle = smoke_scene(res=16, resx=32, resy=32, n_sensors=4)
    cfg = VolpathConfig(max_depth=4, max_steps=256)
    settings = RenderSettings(integrator=cfg, medium=bundle.medium_cfg,
                              film_size=bundle.film_size, spp=2, spp_grad=2)
    render = make_render(settings, bundle.to_world)
    return bundle, render


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_step_deterministic(setup):
    bundle, render = setup
    mesh = make_mesh(8)
    vag = sharded_loss_and_grad(mesh, render, losses.l1)
    batch = 64
    sensor_idx, pixels = sample_batch_pixels(jnp.uint32(3), 4,
                                             bundle.film_size, batch)
    ref = jnp.full((batch, 3), 0.25)
    params = replicate(mesh, bundle.start_from)
    em = replicate(mesh, bundle.emitter)
    cams = replicate(mesh, bundle.cameras)
    sensor_idx, pixels, ref = shard_batch(mesh, (sensor_idx, pixels, ref))

    l1, g1 = jax.jit(vag)(params, em, cams, sensor_idx, pixels, ref,
                          jnp.uint32(5), jnp.uint32(6))
    l2, g2 = jax.jit(vag)(params, em, cams, sensor_idx, pixels, ref,
                          jnp.uint32(5), jnp.uint32(6))
    assert float(l1) == float(l2)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for g in g1:
        assert np.isfinite(np.asarray(g)).all()


def test_sharded_loss_matches_single_device_statistically(setup):
    """Sharded and unsharded pipelines use different RNG streams but estimate
    the same quantities; with a large batch their losses must agree."""
    bundle, render = setup
    mesh = make_mesh(8)
    vag = sharded_loss_and_grad(mesh, render, losses.l1)
    batch = 2048
    sensor_idx, pixels = sample_batch_pixels(jnp.uint32(7), 4,
                                             bundle.film_size, batch)
    ref = jnp.full((batch, 3), 0.25)

    def single(params):
        img = render(params, bundle.emitter, bundle.cameras, sensor_idx,
                     pixels, jnp.uint32(9), jnp.uint32(10))
        return losses.l1(img, ref)

    l_single = float(jax.jit(single)(bundle.start_from))

    params = replicate(mesh, bundle.start_from)
    em = replicate(mesh, bundle.emitter)
    cams = replicate(mesh, bundle.cameras)
    s_idx, pix, ref_s = shard_batch(mesh, (sensor_idx, pixels, ref))
    l_shard, g = jax.jit(vag)(params, em, cams, s_idx, pix, ref_s,
                              jnp.uint32(9), jnp.uint32(10))
    assert abs(float(l_shard) - l_single) / max(l_single, 1e-9) < 0.05


def test_sharded_pallas_engine_interpret():
    """The Pallas fused-step engine composed under shard_map (VERDICT r1
    item 8): engine='pallas' in interpret mode on the virtual mesh, so the
    pallas_call + shard_map composition is validated before hardware sees
    it.  Grads must be finite and statistically consistent with the flat
    engine under the same sharding."""
    from uivr_tpu.ops import volpath_step as vk
    from uivr_tpu.scene import Scene, finalize_medium

    bundle = smoke_scene(res=16, resx=32, resy=32, n_sensors=4)
    mesh = make_mesh(8)
    batch = 4096        # 512 pixels/shard x 2 spp = 1024 rays >= pallas gate
    scene = Scene(medium=finalize_medium(bundle.params, bundle.medium_cfg,
                                         bundle.to_world),
                  emitter=bundle.emitter, cameras=bundle.cameras)
    assert vk.pallas_supported(scene, batch // 8 * 2), \
        "per-shard wavefront must clear the pallas gate or the test is vacuous"
    sensor_idx, pixels = sample_batch_pixels(jnp.uint32(3), 4,
                                             bundle.film_size, batch)
    ref = jnp.full((batch, 3), 0.25)

    outs = {}
    for engine in ("pallas", "flat"):
        cfg = VolpathConfig(max_depth=4, max_steps=256, engine=engine)
        settings = RenderSettings(integrator=cfg, medium=bundle.medium_cfg,
                                  film_size=bundle.film_size, spp=2,
                                  spp_grad=2)
        render = make_render(settings, bundle.to_world)
        vag = sharded_loss_and_grad(mesh, render, losses.l1)
        params = replicate(mesh, bundle.params)
        em = replicate(mesh, bundle.emitter)
        cams = replicate(mesh, bundle.cameras)
        si, pix, rf = shard_batch(mesh, (sensor_idx, pixels, ref))
        l, g = jax.jit(vag)(params, em, cams, si, pix, rf,
                            jnp.uint32(5), jnp.uint32(6))
        assert np.isfinite(float(l))
        for x in g:
            assert np.isfinite(np.asarray(x)).all()
        outs[engine] = (float(l), g)

    # same TEA streams on both engines -> same realized paths modulo
    # float-boundary flips: losses track closely even at 2 spp
    lp, lf = outs["pallas"][0], outs["flat"][0]
    assert abs(lp - lf) / max(abs(lf), 1e-9) < 0.05, (lp, lf)
    gp, gf = outs["pallas"][1], outs["flat"][1]
    num = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
              for a, b in zip(gp, gf))
    den = sum(float(np.abs(np.asarray(b)).sum()) for b in gf)
    # 0.25: at 2 spp the DRT reservoir term dominates gradient variance,
    # and its recursive detached Li realizes different paths per engine
    # (the tight engine-parity gradient checks live in
    # tests/test_pallas_kernel.py at schedule=None); this test pins the
    # shard_map composition, finiteness, and same-ballpark gradients
    assert num / max(den, 1e-12) < 0.25, num / den


@pytest.mark.slow
def test_sharded_grads_match_single_device_production_shape():
    """VERDICT r2 item 9: DRT + NEE + reservoir + shadow-RR at max_depth 16
    with >= 1024 primal lanes/shard — the sharded step's gradients must be
    statistically consistent with the UNSHARDED step on the same batch
    (different seed decorrelation per shard, so means are compared)."""
    bundle = smoke_scene(res=16, resx=32, resy=32, n_sensors=4)
    cfg = VolpathConfig(max_depth=16, max_steps=1024, use_nee=True,
                        use_drt=True, use_drt_subsampling=True,
                        use_drt_mis=True, shadow_rr=0.05,
                        trans_grad_samples=2)
    settings = RenderSettings(integrator=cfg, medium=bundle.medium_cfg,
                              film_size=bundle.film_size, spp=2, spp_grad=2)
    render = make_render(settings, bundle.to_world)
    mesh = make_mesh(8)
    batch = 4096                    # 512 pixels/shard x 2 spp = 1024 lanes
    sensor_idx, pixels = sample_batch_pixels(jnp.uint32(3), 4,
                                             bundle.film_size, batch)
    ref = jnp.full((batch, 3), 0.25)

    def single(seed):
        def f(p):
            img = render(p, bundle.emitter, bundle.cameras, sensor_idx,
                         pixels, seed, seed + jnp.uint32(1))
            return losses.l1(img, ref)
        return jax.value_and_grad(f)(bundle.params)

    vag = sharded_loss_and_grad(mesh, render, losses.l1)
    params = replicate(mesh, bundle.params)
    em = replicate(mesh, bundle.emitter)
    cams = replicate(mesh, bundle.cameras)
    si, pix, rf = shard_batch(mesh, (sensor_idx, pixels, ref))

    def slabs(g):
        # per-voxel DRT gradients at this budget are noise-dominated
        # (SNR << 1: independent seed schedules correlate ~0.08 per voxel)
        # so the statistical comparison aggregates to z-slab sums, boosting
        # SNR ~sqrt(256) per slab
        return np.concatenate([
            np.asarray(x).reshape(x.shape[0], -1).sum(1) for x in g])

    l1s, g1s, l8s, g8s = [], [], [], []
    for s in (11, 31, 51, 71):
        l1, g1 = single(jnp.uint32(s))
        l8, g8 = jax.jit(vag)(params, em, cams, si, pix, rf,
                              jnp.uint32(s), jnp.uint32(s + 1))
        assert np.isfinite(float(l1)) and np.isfinite(float(l8))
        for x in g8:
            assert np.isfinite(np.asarray(x)).all()
        l1s.append(float(l1)); l8s.append(float(l8))
        g1s.append(slabs(g1))
        g8s.append(slabs(g8))
    # seed-averaged losses and slab-aggregated gradients agree within MC
    # noise (the sharded step decorrelates seeds per shard, so the
    # realizations are fully independent of the single-device ones)
    assert abs(np.mean(l8s) - np.mean(l1s)) / max(abs(np.mean(l1s)),
                                                  1e-9) < 0.05
    m1, m8 = np.mean(g1s, 0), np.mean(g8s, 0)
    corr = np.corrcoef(m1, m8)[0, 1]
    # measured 0.89-0.95 at 4 seeds (slab noise); a sharding bug (sign
    # flip, double counting, wrong psum) lands near 0
    assert corr > 0.85, corr
    rel = np.abs(m1 - m8).sum() / max(np.abs(m1).sum(), 1e-12)
    assert rel < 0.35, rel


def test_multihost_two_process_smoke():
    """Multi-host (DCN) bring-up: two local processes under
    jax.distributed.initialize form a 4-device global mesh and one sharded
    step agrees with a single-process control (SURVEY.md §5 distributed
    backend row; scripts/multihost_smoke.py prints the verdict JSON)."""
    import json
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "/root/repo/scripts/multihost_smoke.py"],
        capture_output=True, text=True, timeout=900,
        env={k: v for k, v in __import__("os").environ.items()
             if k not in ("XLA_FLAGS",)})
    assert r.returncode == 0, r.stderr[-2000:]
    verdict = json.loads(r.stdout.strip().splitlines()[-1])
    assert verdict["ok"], verdict
