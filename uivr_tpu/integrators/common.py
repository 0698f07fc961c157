"""Shared integrator utilities: MIS weights and gradient accumulators.

The gradient machinery (GradAccum + scatter helpers) lives in
scene/gradients.py (import-cycle avoidance); re-exported here for the
integrators.  See that module for the chain-rule/layout rationale.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..scene.gradients import (  # noqa: F401
    GradAccum, finalize_accum, init_accum, scatter_albedo, scatter_emission,
    scatter_sigma,
)
from ..scene.medium import MediumParams


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
