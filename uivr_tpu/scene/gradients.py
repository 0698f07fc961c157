"""Gradient accumulators for the hand-written adjoints.

Two layouts, selected statically by whether the medium carries corner
tables (core/grids.py):

- grid mode: scatter-add of (point, 8 corners) directly into (D,H,W,C)
  grids — 8 scattered elements per event.
- corner-table mode: sigma and albedo cotangents share ONE combined
  ((D-1)(H-1)(W-1), 32) row accumulator (8 sigma + 24 albedo slots per
  cell), so a scatter event is a single contiguous row scatter-add;
  emission has its own (.., 24) table.  Folded back to grid shape once at
  the end.  ~3x+ cheaper on TPU where scatter/gather cost is per-row.

Lives in scene/ so the tracking kernels can accumulate without importing
the integrators package (import cycle).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.grids import (_cell_index_weights, fold_corner_table,
                          trilinear_scatter)
from .medium import Medium, MediumParams


class GradAccum(NamedTuple):
    """Adjoint gradient accumulator.

    grid mode:  sigma (D,H,W,1), albedo (D,H,W,3), emission (D,H,W,3)
    ct mode:    sigma = combined sigma+albedo rows (Tc, 32), albedo = (),
                emission = (Tc, 24)
    """
    sigma: jnp.ndarray
    albedo: jnp.ndarray
    emission: jnp.ndarray


def _uses_ct(m: Medium) -> bool:
    # the COMBINED table is the one the row accumulator mirrors; above the
    # per-channel corner-table limit it is the only table kept (medium.py)
    return m.combined_ct is not None


def _n_cells(m: Medium) -> int:
    D, H, W, _ = m.params.sigma_t.shape
    return max(D - 1, 1) * max(H - 1, 1) * max(W - 1, 1)


def init_accum(m: Medium, vary: jnp.ndarray = None,
               need_emission: bool = True) -> GradAccum:
    """Zero accumulator. ``vary``: optional input-derived scalar zero added
    so the accumulator is 'varying' under shard_map manual sharding.
    ``need_emission=False`` (volpath adjoints, which never scatter emission
    cotangents) skips the (Tc, 24) emission rows — 1.6 GB at 256^3."""
    if _uses_ct(m):
        Tc = _n_cells(m)
        dt = m.params.sigma_t.dtype        # f64 under the x64 test mode
        acc = GradAccum(sigma=jnp.zeros((Tc, 32), dt),
                        albedo=jnp.zeros((), dt),
                        emission=(jnp.zeros((Tc, 24), dt) if need_emission
                                  else jnp.zeros((), dt)))
    else:
        acc = GradAccum(sigma=jnp.zeros_like(m.params.sigma_t),
                        albedo=jnp.zeros_like(m.params.albedo),
                        emission=(jnp.zeros_like(m.params.emission)
                                  if need_emission
                                  else jnp.zeros((),
                                                 m.params.emission.dtype)))
    if vary is not None:
        acc = GradAccum(*[a + vary.astype(a.dtype) for a in acc])
    return acc


def finalize_accum(acc: GradAccum, m: Medium) -> MediumParams:
    """Accumulator -> gradients shaped like MediumParams."""
    if _uses_ct(m):
        sa = acc.sigma.reshape(-1, 8, 4)
        sig_t = sa[:, :, 0].reshape(-1, 8)
        alb_t = sa[:, :, 1:].reshape(-1, 24)
        return MediumParams(
            sigma_t=fold_corner_table(sig_t, m.params.sigma_t.shape),
            albedo=fold_corner_table(alb_t, m.params.albedo.shape),
            emission=(fold_corner_table(acc.emission,
                                        m.params.emission.shape)
                      if acc.emission.ndim else
                      jnp.zeros_like(m.params.emission)),
        )
    return MediumParams(sigma_t=acc.sigma, albedo=acc.albedo,
                        emission=(acc.emission if acc.emission.ndim else
                                  jnp.zeros_like(m.params.emission)))


def _ct_row(shape, p, w_mask):
    cell, w = _cell_index_weights(shape, p)
    if w_mask is not None:
        w = w * w_mask.astype(w.dtype)[..., None]
    return cell, w


def scatter_sigma_albedo(acc: GradAccum, m: Medium, p: jnp.ndarray,
                         cot_sigma: jnp.ndarray, cot_albedo: jnp.ndarray,
                         mask: jnp.ndarray) -> GradAccum:
    """Fused accumulate of sigma_t (n,) and albedo (n,3) cotangents at the
    same points — ONE row scatter in corner-table mode."""
    cs = cot_sigma * m.scale
    if _uses_ct(m):
        cell, w = _ct_row(m.params.sigma_t.shape, p, mask)
        # interleaved per-corner layout: [sig, alb_r, alb_g, alb_b] x 8
        row = jnp.concatenate([
            (w * cs[:, None])[..., None],            # (n, 8, 1)
            w[..., None] * cot_albedo[:, None, :],   # (n, 8, 3)
        ], axis=-1).reshape(p.shape[0], 32)
        return acc._replace(sigma=acc.sigma.at[cell].add(row, mode="drop"))
    a = trilinear_scatter(acc.sigma, p, cs[:, None], mask)
    b = trilinear_scatter(acc.albedo, p, cot_albedo, mask)
    return acc._replace(sigma=a, albedo=b)


def scatter_sigma(acc: GradAccum, m: Medium, p: jnp.ndarray,
                  cot_sigma: jnp.ndarray, mask: jnp.ndarray) -> GradAccum:
    """Accumulate a cotangent on sigma_t(p) (n,)."""
    cs = cot_sigma * m.scale
    if _uses_ct(m):
        cell, w = _ct_row(m.params.sigma_t.shape, p, mask)
        row = jnp.concatenate([
            (w * cs[:, None])[..., None],
            jnp.zeros(w.shape + (3,), w.dtype),
        ], axis=-1).reshape(p.shape[0], 32)
        return acc._replace(sigma=acc.sigma.at[cell].add(row, mode="drop"))
    return acc._replace(sigma=trilinear_scatter(acc.sigma, p, cs[:, None],
                                                mask))


def scatter_albedo(acc: GradAccum, m: Medium, p: jnp.ndarray,
                   cot: jnp.ndarray, mask: jnp.ndarray) -> GradAccum:
    """Accumulate a cotangent on albedo(p) (n, 3)."""
    if _uses_ct(m):
        cell, w = _ct_row(m.params.albedo.shape, p, mask)
        row = jnp.concatenate([
            jnp.zeros(w.shape + (1,), w.dtype),
            w[..., None] * cot[:, None, :],
        ], axis=-1).reshape(p.shape[0], 32)
        return acc._replace(sigma=acc.sigma.at[cell].add(row, mode="drop"))
    return acc._replace(albedo=trilinear_scatter(acc.albedo, p, cot, mask))


def scatter_emission(acc: GradAccum, m: Medium, p: jnp.ndarray,
                     cot: jnp.ndarray, mask: jnp.ndarray,
                     scaled: bool = True) -> GradAccum:
    """Accumulate a cotangent on emission(p) (n, 3)."""
    c = cot * m.scale if scaled else cot
    if _uses_ct(m):
        cell, w = _ct_row(m.params.emission.shape, p, mask)
        row = (w[..., None] * c[:, None, :]).reshape(p.shape[0], 24)
        return acc._replace(
            emission=acc.emission.at[cell].add(row, mode="drop"))
    return acc._replace(emission=trilinear_scatter(acc.emission, p, c, mask))
