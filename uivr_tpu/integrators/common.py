"""Shared integrator utilities: MIS weights and gradient scatter helpers.

The gradient helpers implement the chain rule from the adjoint's cotangents
on physical quantities (sigma_t, albedo, emission at a point) down to the
voxel-grid parameters, replacing Dr.Jit's taped scatter-add AD (SURVEY.md
N2): sigma_t = scale * trilinear(grid), albedo = trilinear(grid),
emission = [scale *] trilinear(grid).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.grids import trilinear_scatter
from ..scene.medium import Medium, MediumParams


def mis_weight(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """Power heuristic (beta = 2), matching ``mi.ad.common.mis_weight``
    (used at reference volpathsimple.py:278,391)."""
    a2 = pdf_a * pdf_a
    w = a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-30)
    return jnp.where(pdf_a > 0.0, w, 0.0)


def zero_grads(params: MediumParams) -> MediumParams:
    return MediumParams(
        sigma_t=jnp.zeros_like(params.sigma_t),
        albedo=jnp.zeros_like(params.albedo),
        emission=jnp.zeros_like(params.emission),
    )


def scatter_sigma(grads: MediumParams, m: Medium, p: jnp.ndarray,
                  cot_sigma: jnp.ndarray, mask: jnp.ndarray) -> MediumParams:
    """Accumulate a cotangent on sigma_t(p) (n,) into the sigma grid."""
    return grads._replace(sigma_t=trilinear_scatter(
        grads.sigma_t, p, (cot_sigma * m.scale)[:, None], mask))


def scatter_albedo(grads: MediumParams, m: Medium, p: jnp.ndarray,
                   cot: jnp.ndarray, mask: jnp.ndarray) -> MediumParams:
    """Accumulate a cotangent on albedo(p) (n, 3) into the albedo grid."""
    return grads._replace(albedo=trilinear_scatter(grads.albedo, p, cot, mask))


def scatter_emission(grads: MediumParams, m: Medium, p: jnp.ndarray,
                     cot: jnp.ndarray, mask: jnp.ndarray,
                     scaled: bool = True) -> MediumParams:
    """Accumulate a cotangent on emission(p) (n, 3) into the emission grid."""
    c = cot * m.scale if scaled else cot
    return grads._replace(emission=trilinear_scatter(grads.emission, p, c, mask))
