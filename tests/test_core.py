"""Unit tests for the core layer: RNG streams, grids, AABB, IO codecs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uivr_tpu.core import (
    Rays, build_majorant_grid, clone, fork, global_majorant, make_sampler,
    next_1d, next_2d, ray_unit_cube, resize_trilinear, sample_tea_32,
    trilinear_sample, trilinear_scatter,
)
from uivr_tpu.core import exr_io, vol_io


# ---------------------------------------------------------------- RNG

def test_rng_uniformity_and_range():
    s = make_sampler(7, n_lanes=20000)
    u, s = next_1d(s)
    u = np.asarray(u)
    assert u.shape == (20000,)
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(np.var(u) - 1 / 12) < 0.005


def test_rng_streams_decorrelated():
    s = make_sampler(7, n_lanes=4096)
    u0, s = next_1d(s)
    u1, s = next_1d(s)
    # successive dims decorrelated
    assert abs(np.corrcoef(np.asarray(u0), np.asarray(u1))[0, 1]) < 0.05
    # forked stream decorrelated from main
    f = fork(s, 123)
    uf, _ = next_1d(f)
    assert abs(np.corrcoef(np.asarray(u0), np.asarray(uf))[0, 1]) < 0.05
    # different seeds decorrelated
    s2 = make_sampler(8, n_lanes=4096)
    v0, _ = next_1d(s2)
    assert abs(np.corrcoef(np.asarray(u0), np.asarray(v0))[0, 1]) < 0.05


def test_rng_clone_replays_identical_sequence():
    """PRB invariant: a cloned sampler replays the exact upcoming sequence."""
    s = make_sampler(42, n_lanes=128)
    _, s = next_1d(s)
    snap = clone(s)
    seq_a = []
    for _ in range(5):
        u, s = next_1d(s)
        seq_a.append(np.asarray(u))
    s2 = snap
    for i in range(5):
        u, s2 = next_1d(s2)
        np.testing.assert_array_equal(np.asarray(u), seq_a[i])


def test_rng_2d_and_tea():
    s = make_sampler(3, n_lanes=64)
    u, _ = next_2d(s)
    assert u.shape == (64, 2)
    a, b = sample_tea_32(5, 7)
    a2, b2 = sample_tea_32(5, 7)
    assert int(a) == int(a2) and int(b) == int(b2)
    c, _ = sample_tea_32(5, 8)
    assert int(a) != int(c)


# ---------------------------------------------------------------- grids

def _rand_grid(shape, seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(*shape).astype(np.float32))


def test_trilinear_at_nodes_and_center():
    g = _rand_grid((3, 4, 5, 2))
    D, H, W, C = g.shape
    # At exact node positions the sample equals the node value.
    zs, ys, xs = np.meshgrid(np.arange(D), np.arange(H), np.arange(W), indexing="ij")
    pts = np.stack([xs / (W - 1), ys / (H - 1), zs / (D - 1)], -1).reshape(-1, 3)
    vals = trilinear_sample(g, jnp.asarray(pts, jnp.float32))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(g).reshape(-1, C),
                               rtol=1e-5, atol=1e-6)
    # Midpoint of an edge = average of two nodes.
    p = jnp.array([[0.5 / (W - 1), 0.0, 0.0]], jnp.float32)
    v = trilinear_sample(g, p)
    np.testing.assert_allclose(np.asarray(v)[0],
                               0.5 * (np.asarray(g)[0, 0, 0] + np.asarray(g)[0, 0, 1]),
                               rtol=1e-5)


def test_trilinear_clamps_out_of_bounds():
    g = _rand_grid((3, 3, 3, 1))
    p = jnp.array([[-0.5, 2.0, 0.5], [1.5, -1.0, 0.0]], jnp.float32)
    v = trilinear_sample(g, p)
    assert np.isfinite(np.asarray(v)).all()


def test_trilinear_scatter_is_pullback_of_sample():
    """trilinear_scatter must equal JAX AD's pullback of trilinear_sample."""
    g = _rand_grid((4, 3, 5, 2))
    rs = np.random.RandomState(1)
    p = jnp.asarray(rs.rand(50, 3).astype(np.float32))
    cot = jnp.asarray(rs.randn(50, 2).astype(np.float32))

    _, vjp = jax.vjp(lambda gg: trilinear_sample(gg, p), g)
    g_ad, = vjp(cot)
    g_manual = trilinear_scatter(jnp.zeros_like(g), p, cot)
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(g_manual),
                               rtol=1e-4, atol=1e-5)


def test_trilinear_scatter_mask():
    g = jnp.zeros((3, 3, 3, 1))
    p = jnp.array([[0.5, 0.5, 0.5], [0.1, 0.1, 0.1]], jnp.float32)
    cot = jnp.ones((2, 1), jnp.float32)
    mask = jnp.array([True, False])
    out = trilinear_scatter(g, p, cot, mask)
    assert abs(float(jnp.sum(out)) - 1.0) < 1e-5


def test_majorant_grid_is_conservative():
    g = _rand_grid((9, 9, 9, 1), seed=3) * 5.0
    maj = build_majorant_grid(g, factor=4)
    assert maj.shape == (2, 2, 2)
    # Check conservativeness by dense sampling.
    rs = np.random.RandomState(4)
    pts = jnp.asarray(rs.rand(2000, 3).astype(np.float32))
    vals = np.asarray(trilinear_sample(g, pts))[:, 0]
    # supercell index of each point: cells span 4 of the 8 interp cells
    cell = np.minimum((np.asarray(pts) * 8 // 4).astype(int), 1)
    m = np.asarray(maj)
    bound = m[cell[:, 2], cell[:, 1], cell[:, 0]]
    assert (vals <= bound + 1e-5).all()
    assert float(global_majorant(g)) >= vals.max() - 1e-5


def test_majorant_covers_nondivisible_boundary_slivers():
    """Regression: supercells are uniform in p-space at every lookup site
    (floor(p * dims)), so the builder must window nodes per uniform-p cell.
    On non-divisible grids (63 cells / factor 16) the old node-space
    stride-16 windowing left boundary slivers where trilinear sigma exceeded
    the looked-up majorant (observed: sigma 7.0 vs majorant 0.0) — a bias in
    the unbiased tracker.  Spike a single node near such a boundary and
    verify the uniform-p lookup bounds it."""
    D = 64                       # 63 interp cells, factor 16 -> dims 4
    g = np.zeros((D, D, D, 1), np.float32)
    g[32, 32, 47, 0] = 10.0      # node 47: old window split at x=48
    maj = build_majorant_grid(jnp.asarray(g), factor=16)
    assert maj.shape == (4, 4, 4)
    rs = np.random.RandomState(0)
    # dense sampling around the spike's support plus random points
    pts = np.concatenate([
        rs.rand(2000, 3).astype(np.float32),
        np.stack([np.linspace(46.0, 49.0, 200) / 63.0,
                  np.full(200, 32 / 63.0), np.full(200, 32 / 63.0)],
                 axis=-1).astype(np.float32)[:, [0, 1, 2]]])
    pts = jnp.asarray(np.stack([pts[:, 0], pts[:, 1], pts[:, 2]], axis=-1))
    vals = np.asarray(trilinear_sample(jnp.asarray(g), pts))[:, 0]
    cell = np.minimum((np.asarray(pts) * 4).astype(int), 3)
    m = np.asarray(maj)
    bound = m[cell[:, 2], cell[:, 1], cell[:, 0]]
    assert (vals <= bound + 1e-5).all(), \
        float((vals - bound).max())


def test_resize_trilinear_shapes():
    g = _rand_grid((4, 4, 4, 3))
    out = resize_trilinear(g, (8, 8, 8))
    assert out.shape == (8, 8, 8, 3)
    # Constant grids stay constant under upsampling.
    c = jnp.full((4, 4, 4, 1), 0.7)
    out = resize_trilinear(c, (8, 8, 8))
    np.testing.assert_allclose(np.asarray(out), 0.7, rtol=1e-5)


# ---------------------------------------------------------------- AABB

def test_ray_unit_cube_hits():
    o = jnp.array([[-1.0, 0.5, 0.5], [0.5, 0.5, 0.5], [-1.0, 5.0, 0.5]])
    d = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    tn, tf, hit = ray_unit_cube(o, d)
    assert bool(hit[0]) and bool(hit[1]) and not bool(hit[2])
    np.testing.assert_allclose(float(tn[0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(tf[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(tn[1]), 0.0, atol=1e-6)  # from inside
    np.testing.assert_allclose(float(tf[1]), 0.5, rtol=1e-5)


def test_ray_unit_cube_degenerate_axis():
    o = jnp.array([[0.5, 0.5, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    tn, tf, hit = ray_unit_cube(o, d)
    assert bool(hit[0])
    np.testing.assert_allclose(float(tn[0]), 3.0, rtol=1e-5)


# ---------------------------------------------------------------- IO

def test_vol_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    data = rs.rand(5, 4, 3, 3).astype(np.float32)
    p = str(tmp_path / "t.vol")
    vol_io.write_vol(p, data, bbox=(0, 0, 0, 2, 2, 2))
    back, bbox = vol_io.read_vol(p)
    np.testing.assert_array_equal(back, data)
    np.testing.assert_allclose(bbox, (0, 0, 0, 2, 2, 2))


@pytest.mark.parametrize("comp", ["none", "zips", "zip"])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_exr_roundtrip(tmp_path, comp, channels):
    rs = np.random.RandomState(1)
    img = rs.rand(33, 17, channels).astype(np.float32)
    p = str(tmp_path / f"t_{comp}_{channels}.exr")
    exr_io.write_exr(p, img, compression=comp)
    back = exr_io.read_exr(p)
    np.testing.assert_allclose(back, img, rtol=1e-6, atol=1e-7)
