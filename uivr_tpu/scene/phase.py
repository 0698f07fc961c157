"""Phase functions: isotropic and Henyey-Greenstein.

The reference assumes perfect importance sampling (phase value == pdf,
python/integrators/volpathsimple.py:220-222,386-389), which holds for both.
``g`` is a traced scalar; g == 0 reduces HG to isotropic exactly (guarded
limit), so a single code path serves both plugins.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

_INV_FOUR_PI = 1.0 / (4.0 * np.pi)


def _build_frame(n: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless orthonormal basis around unit vectors ``n`` (n, 3)
    (Duff et al. 2017)."""
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + sign * n[..., 0] ** 2 * a, sign * b,
                   -sign * n[..., 0]], axis=-1)
    s = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, s


def hg_eval(g: jnp.ndarray, cos_theta: jnp.ndarray) -> jnp.ndarray:
    """HG phase value (= pdf) for scattering angle cos_theta = dot(wi, wo)."""
    g2 = g * g
    denom = 1.0 + g2 - 2.0 * g * cos_theta
    return _INV_FOUR_PI * (1.0 - g2) / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


def phase_eval(g: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray) -> jnp.ndarray:
    cos_theta = jnp.sum(wi * wo, axis=-1)
    return jnp.where(jnp.abs(g) < 1e-4,
                     jnp.full_like(cos_theta, _INV_FOUR_PI),
                     hg_eval(g, cos_theta))


def phase_sample(g: jnp.ndarray, wi: jnp.ndarray, u1: jnp.ndarray,
                 u2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample outgoing direction ``wo`` given incident propagation direction
    ``wi`` (pointing along the ray). Returns (wo, pdf)."""
    iso = jnp.abs(g) < 1e-4
    g_safe = jnp.where(iso, 0.5, g)  # avoid 0-division in the HG branch
    sqr = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u1)
    cos_hg = (1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe)
    cos_theta = jnp.where(iso, 1.0 - 2.0 * u1, jnp.clip(cos_hg, -1.0, 1.0))
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u2
    t, s = _build_frame(wi)
    wo = (sin_theta * jnp.cos(phi))[..., None] * t \
        + (sin_theta * jnp.sin(phi))[..., None] * s \
        + cos_theta[..., None] * wi
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    pdf = jnp.where(iso, jnp.full_like(cos_theta, _INV_FOUR_PI),
                    hg_eval(g, cos_theta))
    return wo, pdf
