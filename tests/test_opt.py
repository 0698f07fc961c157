"""Optimization layer: optimizer math, schedules, projection, and a tiny
end-to-end reconstruction that must reduce the loss."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from uivr_tpu.opt import (
    OptimizationConfig, Schedule, adam_init, adam_step, enforce_valid_params,
    initial_resolution, learning_rates, run_optimization, save_checkpoint,
    load_checkpoint, upsample_params,
)
from uivr_tpu.opt.schedule import schedule_factor, upsample_iterations
from uivr_tpu.scene.medium import MediumParams


def _params(val=1.0, res=4):
    return MediumParams(
        sigma_t=jnp.full((res, res, res, 1), val),
        albedo=jnp.full((res, res, res, 3), val),
        emission=jnp.full((res, res, res, 3), val),
    )


def test_adam_minimizes_quadratic():
    p = _params(1.0)
    target = _params(0.25)
    state = adam_init(p)
    lr = MediumParams(sigma_t=0.05, albedo=0.05, emission=0.05)
    for _ in range(200):
        grads = jax.tree_util.tree_map(lambda a, b: 2 * (a - b), p, target)
        p, state = adam_step(p, grads, state, lr)
    for a, b in zip(p, target):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_schedule_last25():
    n = 1000
    assert schedule_factor(Schedule.Last25, 0, n) == 1.0
    assert schedule_factor(Schedule.Last25, 760, n) == 0.5
    assert schedule_factor(Schedule.Last25, 860, n) == 0.25
    assert schedule_factor(Schedule.Last25, 960, n) == 0.125
    assert schedule_factor(Schedule.Constant, 990, n) == 1.0


def test_learning_rate_factors():
    lr = learning_rates(1e-2, Schedule.Constant, 0, 100, {"albedo": 2.0})
    assert lr.albedo == 2e-2 and lr.sigma_t == 1e-2


def test_upsample_and_initial_resolution():
    p = _params(0.5, res=4)
    up = upsample_params(p)
    assert up.sigma_t.shape == (8, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(up.albedo), 0.5, rtol=1e-5)
    assert initial_resolution((64, 64, 64, 3), 2) == (16, 16, 16, 3)
    assert upsample_iterations([0.04, 0.5], 100) == {4, 50}


def test_enforce_valid_params():
    p = MediumParams(sigma_t=jnp.array([[[[-1.0], [300.0]]]]),
                     albedo=jnp.array([[[[1.5, -0.2, 0.5]]]]),
                     emission=jnp.array([[[[-3.0, 0.1, 2.0]]]]))
    q = enforce_valid_params(p, 250.0)
    assert float(q.sigma_t.min()) == 0.0 and float(q.sigma_t.max()) == 250.0
    assert float(q.albedo.min()) == 0.0 and float(q.albedo.max()) == 1.0
    assert float(q.emission.min()) == 0.0


def test_checkpoint_roundtrip(tmp_path):
    p = _params(0.7)
    save_checkpoint(str(tmp_path), p, "final")
    q = load_checkpoint(str(tmp_path), "final")
    for a, b in zip(p, q):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_tiny_optimization_reduces_loss(tmp_path):
    """End-to-end: recover emission+sigma of the cube scene with the nerf
    integrator for a few dozen iterations; loss must drop substantially.
    (The minimum end-to-end slice of SURVEY.md §7.)"""
    from uivr_tpu.config import cube_test_scene
    from uivr_tpu.integrators import NerfConfig

    b = cube_test_scene(resx=24, resy=24)
    b.start_from = MediumParams(
        sigma_t=jnp.full_like(b.params.sigma_t, 0.05),
        albedo=jnp.full_like(b.params.albedo, 0.5),
        emission=jnp.full_like(b.params.emission, 0.05),
    )
    opt = OptimizationConfig(name="test", spp=2, n_iter=60, lr=2e-2,
                             primal_spp_factor=4, batch_size=288,
                             checkpoint_stride=0, preview_stride=10**9)
    out = str(tmp_path / "run")
    run_optimization(out, opt, b, NerfConfig(queries_per_ray=32),
                     ref_spp=16, verbose=False)

    metrics = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    losses = [m["loss"] for m in metrics if "loss" in m]
    assert losses[-1] < 0.5 * losses[0], losses
    assert os.path.isfile(os.path.join(out, "params",
                                       "final-medium1_sigma_t.vol"))


def test_scan_chunked_loop_matches_host_loop(tmp_path):
    """The device-resident lax.scan inner loop (scan_stride>1) must follow
    the exact host-loop trajectory: same TEA seeds, same pixel draws, same
    metric records, matching params (optimize.py:325-358 semantics)."""
    from uivr_tpu.config import cube_test_scene
    from uivr_tpu.integrators import NerfConfig

    b = cube_test_scene(resx=16, resy=16)
    b.start_from = MediumParams(
        sigma_t=jnp.full_like(b.params.sigma_t, 0.05),
        albedo=jnp.full_like(b.params.albedo, 0.5),
        emission=jnp.full_like(b.params.emission, 0.05))
    outs = {}
    for tag, stride in (("host", 0), ("scan", 7)):
        opt = OptimizationConfig(name=tag, spp=2, n_iter=23, lr=2e-2,
                                 primal_spp_factor=2, batch_size=128,
                                 checkpoint_stride=10, preview_stride=10**9,
                                 render_initial=False, render_final=False,
                                 scan_stride=stride)
        out = str(tmp_path / tag)
        params = run_optimization(out, opt, b, NerfConfig(queries_per_ray=8),
                                  ref_spp=4, verbose=False, resume=False)
        metrics = [json.loads(l)
                   for l in open(os.path.join(out, "metrics.jsonl"))]
        outs[tag] = (params, [(m["it"], m["loss"]) for m in metrics
                              if "loss" in m])
        # mid-run checkpoint written in both modes
        assert os.path.isfile(os.path.join(
            out, "params", f"{10:08d}-medium1_sigma_t.vol"))

    (p_h, m_h), (p_s, m_s) = outs["host"], outs["scan"]
    assert [it for it, _ in m_h] == [it for it, _ in m_s]
    np.testing.assert_allclose([l for _, l in m_h], [l for _, l in m_s],
                               rtol=1e-5)
    for a, c in zip(p_h, p_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4,
                                   atol=1e-6)


def test_optimization_with_upsampling(tmp_path):
    """Multires schedule: grids start downscaled, double at the milestone,
    optimizer state resets, loss stays finite (optimize.py:203-252)."""
    from uivr_tpu.config import cube_test_scene
    from uivr_tpu.integrators import NerfConfig
    from uivr_tpu.opt import run_optimization
    from uivr_tpu.core import vol_io
    import os

    b = cube_test_scene(resx=16, resy=16)
    # final grids 4^3 so one x2 upsample starts from 2^3
    b.params = MediumParams(*[jnp.asarray(np.random.RandomState(0)
                                          .rand(4, 4, 4, c).astype(np.float32))
                              for c in (1, 3, 3)])
    b.start_from = MediumParams(
        sigma_t=jnp.full((4, 4, 4, 1), 0.05),
        albedo=jnp.full((4, 4, 4, 3), 0.5),
        emission=jnp.full((4, 4, 4, 3), 0.05))
    opt = OptimizationConfig(name="up", spp=2, n_iter=12, lr=1e-2,
                             primal_spp_factor=2, batch_size=64,
                             upsample=[0.5], checkpoint_stride=0,
                             preview_stride=10**9, render_initial=False,
                             render_final=False)
    out = str(tmp_path / "run")
    params = run_optimization(out, opt, b, NerfConfig(queries_per_ray=8),
                              ref_spp=4, verbose=False)
    assert params.sigma_t.shape == (4, 4, 4, 1)
    data, _ = vol_io.read_vol(os.path.join(out, "params",
                                           "final-medium1_sigma_t.vol"))
    assert data.shape == (4, 4, 4, 1)
    assert np.isfinite(np.asarray(params.sigma_t)).all()
