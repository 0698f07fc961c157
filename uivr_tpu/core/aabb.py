"""Ray ↔ oriented-box intersection for the single medium bounding volume.

The reference's entire use of Mitsuba's ray-tracing core collapses to
intersecting rays with one convex null-BSDF bounding shape (reference:
python/integrators/volpathsimple.py:12-16,292-319; the test scene's shape is
a transformed unit cube, tests/test_integrators.py:105-115).  We therefore
implement only a slab test against the unit cube in the medium's local frame;
arbitrary affine ``to_world`` transforms (scale/rotate/translate) are handled
by transforming the ray into local coordinates *without renormalizing the
direction*, so ray parameters ``t`` are identical in both frames.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

# numpy scalars, NOT jnp: a module-scope jnp constant materializes a device
# array at import time, which initializes the XLA backend and breaks
# jax.distributed.initialize on multi-host bring-up
# (scripts/multihost_smoke.py).  Semantics under tracing are identical.
INF = np.float32(np.inf)
EPS = np.float32(1e-6)


class Rays(NamedTuple):
    """A wavefront of rays (SoA). ``maxt`` is the far clip distance."""
    o: jnp.ndarray      # (n, 3)
    d: jnp.ndarray      # (n, 3) — unit length in *world* space
    maxt: jnp.ndarray   # (n,)


def transform_points(mat: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 affine transform to points (n, 3)."""
    return p @ mat[:3, :3].T + mat[:3, 3]


def transform_dirs(mat: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Apply the linear part of a 4x4 transform to directions (n, 3)."""
    return d @ mat[:3, :3].T


def ray_unit_cube(o: jnp.ndarray, d: jnp.ndarray,
                  tmin: jnp.ndarray = 0.0, tmax: jnp.ndarray = INF
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slab test of rays (in the box's local frame) against [0,1]^3.

    Returns ``(t_near, t_far, hit)`` with the interval clipped to
    [tmin, tmax].  Handles axis-parallel rays via the IEEE inf semantics of
    the division (d==0 -> ±inf slabs).
    """
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e-20, -1e-20), d)
    t0 = (0.0 - o) * inv_d
    t1 = (1.0 - o) * inv_d
    t_lo = jnp.minimum(t0, t1)
    t_hi = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(t_lo, axis=-1), tmin)
    t_far = jnp.minimum(jnp.min(t_hi, axis=-1), tmax)
    hit = t_near <= t_far
    return t_near, t_far, hit
