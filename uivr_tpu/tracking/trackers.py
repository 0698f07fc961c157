"""Stochastic tracking kernels: the hot inner loops of the path tracer.

TPU-native equivalents of the native Mitsuba medium samplers the reference
depends on (SURVEY.md N5):

- :func:`free_flight`      — real-collision distance sampling via delta
  tracking with DDA through the majorant supergrid (replaces the loop around
  ``medium.sample_interaction`` in reference
  python/integrators/volpathsimple.py:323-377).
- :func:`transmittance`    — ratio-tracking transmittance estimator with
  optional in-loop adjoint scatter-adds (reference ``estimate_transmittance``,
  volpathsimple.py:436-504).
- :func:`drt_distance`     — transmittance-proportional distance sampling for
  Differential Ratio Tracking (the branch-added native
  ``medium.sample_interaction_drt``, volpathsimple.py:550-551).

All run as masked ``lax.while_loop`` wavefronts over SoA ray state; rays are
given in the medium's LOCAL frame (directions not renormalized, so ``t``
matches world-frame ray parameters).  Collisions are (re)sampled from the
current supercell's majorant at every step — valid by the memorylessness of
the exponential distribution, which avoids carrying an optical-depth budget
across DDA cell crossings.

Mathematical notes (derived from the paper's estimators, validated by the
finite-difference oracle in tests):

- ratio tracking: E[prod_k sigma_n(t_k)/sigma_maj(t_k)] over majorant
  collisions in [0, t] equals T(t) = exp(-int_0^t sigma_t).
- DRT: for an inhomogeneous Poisson collision walk with rate sigma_maj(t),
  Campbell's formula gives
      E[ sum_k W_k f(t_k) / sigma_maj(t_k) ] = int_0^tmax T(t) f(t) dt,
  with W_k = prod_{j<k} sigma_n(t_j)/sigma_maj(t_j).  ``drt_distance``
  reservoir-samples ONE collision k with probability proportional to
  omega_k = W_k/sigma_maj(t_k) and returns weight sum_k omega_k, so
  E[weight * f(t_sel)] equals the integral — the "sample proportional to
  transmittance" estimator that removes the 1/sigma_t pdf factor.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rng import Sampler, next_1d
from ..scene.gradients import GradAccum, scatter_sigma
from ..scene.medium import Medium, sigma_t_at

# numpy scalar, not jnp: module-scope device arrays initialize the XLA
# backend at import time, breaking multi-host jax.distributed bring-up
_BIG = np.float32(1e30)


def _cell_exit(m: Medium, ol: jnp.ndarray, dl: jnp.ndarray,
               t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sigma_maj, t_exit): the supercell majorant at parameter ``t`` and the
    ray parameter at which the ray exits that supercell."""
    Dc, Hc, Wc = m.majorant_grid.shape
    res = jnp.array([Wc, Hc, Dc], jnp.float32)
    eps = jnp.float32(1e-5) * (1.0 + jnp.abs(t))
    p = ol + (t + eps)[..., None] * dl
    cell = jnp.clip(jnp.floor(jnp.clip(p, 0.0, 1.0 - 1e-7) * res), 0.0,
                    res - 1.0)
    sigma_maj = m.majorant_grid[cell[..., 2].astype(jnp.int32),
                                cell[..., 1].astype(jnp.int32),
                                cell[..., 0].astype(jnp.int32)]
    lo = cell / res
    hi = (cell + 1.0) / res
    safe_d = jnp.where(jnp.abs(dl) < 1e-20,
                       jnp.where(dl >= 0, 1e-20, -1e-20), dl)
    t_far = jnp.minimum(jnp.minimum(
        jnp.maximum((lo - ol) / safe_d, (hi - ol) / safe_d)[..., 0],
        jnp.maximum((lo - ol) / safe_d, (hi - ol) / safe_d)[..., 1]),
        jnp.maximum((lo - ol) / safe_d, (hi - ol) / safe_d)[..., 2])
    # Guarantee forward progress even at degenerate boundaries.
    t_exit = jnp.maximum(t_far, t + eps)
    return sigma_maj, t_exit


def _sigma_at(m: Medium, ol, dl, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
    p = ol + t[..., None] * dl
    return sigma_t_at(m, p), p


def free_flight(m: Medium, ol: jnp.ndarray, dl: jnp.ndarray,
                maxt: jnp.ndarray, sampler: Sampler, active: jnp.ndarray,
                max_steps: int = 4096
                ) -> Tuple[jnp.ndarray, jnp.ndarray, Sampler]:
    """Sample the distance to the next REAL collision by delta tracking.

    Returns ``(t, found, sampler)``: ``found`` lanes collided at parameter
    ``t`` with pdf sigma_t(t)T(t); the rest escaped past ``maxt`` (with
    probability T(maxt)).  ``t`` is inf for escaped/inactive lanes.
    """
    # Carry initializers are derived from the (possibly shard_map-varying)
    # inputs so that while_loop carry types match under manual sharding.
    t0 = maxt * 0.0
    found0 = jnp.logical_and(jnp.asarray(active), False)

    def cond(c):
        searching, *_ = c
        return jnp.any(searching)

    def body(c):
        searching, t, found, smp, it = c
        sigma_maj, t_exit = _cell_exit(m, ol, dl, t)
        u1, smp = next_1d(smp)
        u2, smp = next_1d(smp)
        step = jnp.where(sigma_maj > 0.0,
                         -jnp.log1p(-u1) / jnp.maximum(sigma_maj, 1e-20), _BIG)
        t_cand = t + step
        bound = jnp.minimum(t_exit, maxt)
        collided = t_cand < bound

        # cell crossing / escape
        escaped_now = searching & (~collided) & (t_exit >= maxt)
        crossed = searching & (~collided) & (t_exit < maxt)

        # tentative collision: classify real vs null
        sig, _ = _sigma_at(m, ol, dl, t_cand)
        r = jnp.where(sigma_maj > 0.0, sig / jnp.maximum(sigma_maj, 1e-20), 0.0)
        real = searching & collided & (u2 < r)

        t = jnp.where(searching & collided, t_cand,
                      jnp.where(crossed, t_exit, t))
        found = found | real
        searching = searching & (~escaped_now) & (~real)
        searching = searching & (it < max_steps)
        return searching, t, found, smp, it + 1

    init = (jnp.asarray(active), t0, found0, sampler, jnp.int32(0))
    _, t, found, sampler, _ = jax.lax.while_loop(cond, body, init)
    t = jnp.where(found, t, jnp.inf)
    return t, found, sampler


def transmittance(m: Medium, ol: jnp.ndarray, dl: jnp.ndarray,
                  tmax: jnp.ndarray, sampler: Sampler, active: jnp.ndarray,
                  max_steps: int = 4096,
                  adjoint: Optional[jnp.ndarray] = None,
                  accum: Optional[GradAccum] = None):
    """Ratio-tracking transmittance over [0, tmax] along local rays.

    Primal: returns ``(Tr (n,), sampler)``; Tr == 1 where no medium is
    crossed and 0 for inactive lanes (matching reference
    volpathsimple.py:459).

    Adjoint (``adjoint`` (n, 3) given): additionally scatter-adds the
    transmittance gradient into ``accum`` (a GradAccum) and returns
    ``(Tr, sampler, accum)``.  Derivation: each ratio-tracking factor
    tr = sigma_n/sigma_maj contributes d tr / tr = -d sigma_t / sigma_n, so
    the per-collision cotangent on sigma_t(p) is -sum_c adjoint_c / sigma_n
    (reference volpathsimple.py:483-492 via
    ``backward_from(adjoint*tr/detach(tr))``).
    """
    with_adj = adjoint is not None

    def cond(c):
        return jnp.any(c[0])

    def body(c):
        walking, t, tr, smp, g, it = c
        sigma_maj, t_exit = _cell_exit(m, ol, dl, t)
        u1, smp = next_1d(smp)
        step = jnp.where(sigma_maj > 0.0,
                         -jnp.log1p(-u1) / jnp.maximum(sigma_maj, 1e-20), _BIG)
        t_cand = t + step
        bound = jnp.minimum(t_exit, tmax)
        collided = walking & (t_cand < bound)
        crossed = walking & (~collided) & (t_exit < tmax)
        done_now = walking & (~collided) & (t_exit >= tmax)

        sig, p = _sigma_at(m, ol, dl, t_cand)
        ratio = jnp.where(sigma_maj > 0.0,
                          1.0 - sig / jnp.maximum(sigma_maj, 1e-20), 1.0)
        ratio = jnp.maximum(ratio, 0.0)

        if with_adj:
            sigma_n = jnp.maximum(sigma_maj - sig, 1e-8)
            # scatter_sigma applies the sigma_t = scale*grid chain factor
            cot = -jnp.sum(adjoint, axis=-1) / sigma_n
            g = scatter_sigma(g, m, p, cot, mask=collided & (ratio > 0.0))

        tr = jnp.where(collided, tr * ratio, tr)
        t = jnp.where(collided, t_cand, jnp.where(crossed, t_exit, t))
        walking = walking & (~done_now) & (tr > 0.0) & (it < max_steps)
        return walking, t, tr, smp, g, it + 1

    g0 = accum if with_adj else jnp.zeros((), tmax.dtype)
    # carry dtypes follow tmax (f64 under the x64 validation variant)
    init = (jnp.asarray(active), tmax * 0.0,
            jnp.where(active, 1.0, 0.0).astype(tmax.dtype), sampler, g0,
            jnp.int32(0))
    _, _, tr, sampler, g, _ = jax.lax.while_loop(cond, body, init)
    if with_adj:
        return tr, sampler, g
    return tr, sampler


def drt_distance(m: Medium, ol: jnp.ndarray, dl: jnp.ndarray,
                 maxt: jnp.ndarray, sampler: Sampler, active: jnp.ndarray,
                 max_steps: int = 4096, w_min: float = 1e-7
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Sampler]:
    """Transmittance-proportional distance sampling (DRT).

    Walks ALL majorant collisions in [0, maxt], reservoir-sampling one with
    probability proportional to omega_k = W_k / sigma_maj(t_k), where W_k is
    the running ratio-tracking product.  Returns
    ``(t_sel, weight, found, sampler)`` with weight = sum_k omega_k so that
    ``weight * f(t_sel)`` estimates  int_0^maxt T(t) f(t) dt  unbiasedly
    (see module docstring).  The walk stops early once W_k < w_min
    (negligible-mass tail).
    """
    n = ol.shape[0]

    def cond(c):
        return jnp.any(c[0])

    def body(c):
        walking, t, W, wsum, t_sel, smp, it = c
        sigma_maj, t_exit = _cell_exit(m, ol, dl, t)
        u1, smp = next_1d(smp)
        u_res, smp = next_1d(smp)
        step = jnp.where(sigma_maj > 0.0,
                         -jnp.log1p(-u1) / jnp.maximum(sigma_maj, 1e-20), _BIG)
        t_cand = t + step
        bound = jnp.minimum(t_exit, maxt)
        collided = walking & (t_cand < bound)
        crossed = walking & (~collided) & (t_exit < maxt)
        done_now = walking & (~collided) & (t_exit >= maxt)

        sig, _ = _sigma_at(m, ol, dl, t_cand)
        ratio = jnp.maximum(
            jnp.where(sigma_maj > 0.0,
                      1.0 - sig / jnp.maximum(sigma_maj, 1e-20), 1.0), 0.0)

        omega = jnp.where(collided, W / jnp.maximum(sigma_maj, 1e-20), 0.0)
        wsum_new = wsum + omega
        take = collided & (u_res * wsum_new <= omega)
        t_sel = jnp.where(take, t_cand, t_sel)

        W = jnp.where(collided, W * ratio, W)
        wsum = wsum_new
        t = jnp.where(collided, t_cand, jnp.where(crossed, t_exit, t))
        walking = walking & (~done_now) & (W > w_min) & (it < max_steps)
        return walking, t, W, wsum, t_sel, smp, it + 1

    init = (jnp.asarray(active), maxt * 0.0,
            jnp.where(active, 1.0, 0.0).astype(maxt.dtype),
            maxt * 0.0, maxt * 0.0, sampler, jnp.int32(0))
    _, _, _, wsum, t_sel, sampler, _ = jax.lax.while_loop(cond, body, init)
    found = jnp.asarray(active) & (wsum > 0.0)
    return t_sel, wsum, found, sampler
