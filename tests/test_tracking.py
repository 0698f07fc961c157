"""Tracking-kernel tests against analytic oracles.

Strategy mirrors the reference's numerical-oracle approach
(reference tests/test_integrators.py): stochastic estimators are validated
against closed-form solutions on controlled media and against
finite differences with common random numbers.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from uivr_tpu.core import make_sampler
from uivr_tpu.scene import MediumConfig, MediumParams, finalize_medium
from uivr_tpu.tracking import drt_distance, free_flight, transmittance

N = 200_000


def _homog_medium(sigma=2.0, factor=1, res=5):
    p = MediumParams(
        sigma_t=jnp.full((res, res, res, 1), sigma, jnp.float32),
        albedo=jnp.full((res, res, res, 3), 0.5, jnp.float32),
        emission=jnp.zeros((res, res, res, 3), jnp.float32),
    )
    return finalize_medium(p, MediumConfig(majorant_factor=factor, scale=1.0))


def _linear_medium(smin=0.2, smax=3.0, res=9, factor=2, axis=0):
    """sigma_t varies linearly along one axis (z by default — grid layout is
    (D, H, W, C) = (z, y, x, c), and the test rays travel along +z)."""
    ramp = np.linspace(smin, smax, res, dtype=np.float32)
    shape = [1, 1, 1]
    shape[axis] = res
    g = np.broadcast_to(ramp.reshape(shape), (res, res, res)).astype(np.float32)
    p = MediumParams(
        sigma_t=jnp.asarray(g[..., None]),
        albedo=jnp.full((res, res, res, 3), 0.5, jnp.float32),
        emission=jnp.zeros((res, res, res, 3), jnp.float32),
    )
    return finalize_medium(p, MediumConfig(majorant_factor=factor, scale=1.0))


def _z_rays(n, maxt=1.0):
    """Rays entering the local cube at z=0, going +z, through the middle."""
    ol = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.0]), (n, 3))
    dl = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    return ol, dl, jnp.full((n,), maxt, jnp.float32)


# ---------------------------------------------------------------- free flight

@pytest.mark.parametrize("factor", [1, 4])
def test_free_flight_homogeneous(factor):
    sigma = 2.0
    m = _homog_medium(sigma, factor=factor, res=9)
    ol, dl, maxt = _z_rays(N)
    s = make_sampler(1, n_lanes=N)
    t, found, _ = free_flight(m, ol, dl, maxt, s, jnp.ones((N,), bool))
    found = np.asarray(found)
    t = np.asarray(t)
    # collision probability = 1 - exp(-sigma * maxt)
    np.testing.assert_allclose(found.mean(), 1 - np.exp(-sigma), atol=0.005)
    # E[t ; t < maxt] = int_0^1 t sigma e^{-sigma t} dt
    analytic = (1 - np.exp(-sigma) * (1 + sigma)) / sigma
    np.testing.assert_allclose(t[found].sum() / N, analytic, atol=0.005)


def test_free_flight_linear_profile():
    m = _linear_medium(0.2, 3.0)
    ol, dl, maxt = _z_rays(N)
    s = make_sampler(2, n_lanes=N)
    t, found, _ = free_flight(m, ol, dl, maxt, s, jnp.ones((N,), bool))
    found = np.asarray(found)
    # survival probability = exp(-int sigma) with int = (0.2+3.0)/2
    tau = (0.2 + 3.0) / 2
    np.testing.assert_allclose(1 - found.mean(), np.exp(-tau), atol=0.01)
    # distribution check: E[t | collision] vs quadrature of t sigma(t) T(t)
    z = np.linspace(0, 1, 20001)
    sig = 0.2 + (3.0 - 0.2) * z
    T = np.exp(-np.cumsum(sig) * (z[1] - z[0]))
    pdf = sig * T
    num = np.trapz(z * pdf, z)
    np.testing.assert_allclose(np.asarray(t)[found].sum() / N, num, atol=0.01)


def test_free_flight_zero_density_escapes():
    m = _homog_medium(0.0)
    ol, dl, maxt = _z_rays(1000)
    s = make_sampler(3, n_lanes=1000)
    t, found, _ = free_flight(m, ol, dl, maxt, s, jnp.ones((1000,), bool))
    assert not np.asarray(found).any()
    assert np.isinf(np.asarray(t)).all()


# ---------------------------------------------------------------- transmittance

@pytest.mark.parametrize("factor", [1, 2])
def test_transmittance_linear_profile(factor):
    m = _linear_medium(0.5, 2.5, factor=factor)
    ol, dl, maxt = _z_rays(N)
    s = make_sampler(4, n_lanes=N)
    tr, _ = transmittance(m, ol, dl, maxt, s, jnp.ones((N,), bool))
    tau = (0.5 + 2.5) / 2
    np.testing.assert_allclose(np.asarray(tr).mean(), np.exp(-tau), atol=0.01)


def test_transmittance_partial_interval():
    m = _homog_medium(3.0)
    ol, dl, _ = _z_rays(N)
    tmax = jnp.full((N,), 0.3, jnp.float32)
    s = make_sampler(5, n_lanes=N)
    tr, _ = transmittance(m, ol, dl, tmax, s, jnp.ones((N,), bool))
    np.testing.assert_allclose(np.asarray(tr).mean(), np.exp(-0.9), atol=0.01)


def test_transmittance_adjoint_matches_fd():
    """Gradient of E[Tr] w.r.t. grid entries: in-loop scatter adjoint vs
    finite differences with common random numbers (the reference's FD
    methodology, python/fd.py)."""
    res = 3
    n = 60_000
    rs = np.random.RandomState(0)
    base = 0.5 + rs.rand(res, res, res, 1).astype(np.float32)

    def make(g):
        p = MediumParams(sigma_t=jnp.asarray(g),
                         albedo=jnp.full((res, res, res, 3), 0.5, jnp.float32),
                         emission=jnp.zeros((res, res, res, 3), jnp.float32))
        return finalize_medium(p, MediumConfig(majorant_factor=1, scale=1.0))

    ol = jnp.asarray(np.stack([
        rs.rand(n) * 0.8 + 0.1, rs.rand(n) * 0.8 + 0.1, np.zeros(n)], -1),
        jnp.float32)
    dl = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    maxt = jnp.ones((n,), jnp.float32)
    act = jnp.ones((n,), bool)

    def primal(g, seed):
        tr, _ = transmittance(make(g), ol, dl, maxt, make_sampler(seed, n_lanes=n), act)
        return float(np.asarray(tr).sum()) / n

    # adjoint gradient for loss = mean(Tr). PRB contract (reference
    # volpathsimple.py:393-401): run the primal first, then replay with the
    # SAME sampler stream passing adjoint = dL * <full primal estimate>; the
    # in-loop tr/detach(tr) algebra divides back out the per-step factor.
    from uivr_tpu.scene.gradients import finalize_accum, init_accum
    m0 = make(base)
    tr0, _ = transmittance(m0, ol, dl, maxt,
                           make_sampler(7, n_lanes=n), act)
    adj = jnp.broadcast_to((tr0 / (3.0 * n))[:, None], (n, 3))
    _, _, acc = transmittance(m0, ol, dl, maxt,
                              make_sampler(7, n_lanes=n), act,
                              adjoint=adj, accum=init_accum(m0))
    g_adj = np.asarray(finalize_accum(acc, m0).sigma_t)[..., 0]

    # FD with matched seed
    eps = 1e-2
    g_fd = np.zeros((res, res, res))
    c0 = primal(base, 7)
    for idx in np.ndindex(res, res, res):
        gp = base.copy()
        gp[idx + (0,)] += eps
        g_fd[idx] = (primal(gp, 7) - c0) / eps

    # normalize comparison scale by the gradient magnitude. The voxel that
    # DEFINES the global majorant is excluded: perturbing it rescales every
    # free-flight step length, so common random numbers break down and
    # pathwise FD diverges from the expectation gradient there.
    scale = np.abs(g_fd).max()
    mask = np.ones_like(g_fd, bool)
    mask[np.unravel_index(base[..., 0].argmax(), mask.shape)] = False
    np.testing.assert_allclose(g_adj[mask] / scale, g_fd[mask] / scale,
                               atol=0.08)


# ---------------------------------------------------------------- DRT

@pytest.mark.parametrize("factor", [1, 2])
def test_drt_estimates_transmittance_weighted_integrals(factor):
    """E[weight * f(t_sel)] must equal  int_0^tmax T(t) f(t) dt."""
    m = _linear_medium(0.4, 2.0, factor=factor)
    ol, dl, maxt = _z_rays(N)
    s = make_sampler(6, n_lanes=N)
    t_sel, w, found, _ = drt_distance(m, ol, dl, maxt, s, jnp.ones((N,), bool))
    t_sel = np.asarray(t_sel)
    w = np.asarray(w)

    z = np.linspace(0, 1, 40001)
    sig = 0.4 + (2.0 - 0.4) * z
    T = np.exp(-np.concatenate([[0], np.cumsum((sig[1:] + sig[:-1]) / 2 * np.diff(z))]))

    for f, fz in [(lambda t: np.ones_like(t), np.ones_like(z)),
                  (lambda t: t, z),
                  (lambda t: np.interp(t, z, sig), sig)]:
        est = (w * f(t_sel)).mean()
        ref = np.trapz(T * fz, z)
        np.testing.assert_allclose(est, ref, rtol=0.03)


def test_drt_zero_density():
    m = _homog_medium(0.0)
    ol, dl, maxt = _z_rays(1000)
    s = make_sampler(8, n_lanes=1000)
    _, w, found, _ = drt_distance(m, ol, dl, maxt, s, jnp.ones((1000,), bool))
    # no collisions possible -> weight 0, found False
    assert not np.asarray(found).any()
    np.testing.assert_allclose(np.asarray(w), 0.0)
