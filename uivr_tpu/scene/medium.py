"""The heterogeneous participating medium: voxel grids + majorant supergrid.

TPU-native replacement for the reference's Mitsuba ``heterogeneous`` medium
with branch extensions (emission grid, majorant supergrid, DRT sampler);
reference call sites: python/integrators/volpathsimple.py:126-141,348,
373-375,550-555, python/optimize.py:182-199.

Design: the *differentiable* state is a plain pytree of three grids
(``MediumParams`` — the reference's ``mi.traverse``/SceneParameters dict,
python/optimize.py:135-136 — becomes this pytree).  All derived state (the
majorant supergrid, which Mitsuba rebuilds natively on ``params.update``) is
recomputed functionally by :func:`finalize_medium` every iteration.

Geometry: the medium fills the unit cube [0,1]^3 in its local frame;
``to_world`` is an arbitrary affine transform.  Ray parameters are shared
between frames because directions are not renormalized (core/aabb.py).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..core import aabb
from ..core.grids import (build_corner_table, build_majorant_grid,
                          trilinear_sample, trilinear_sample_ct)


class MediumParams(NamedTuple):
    """Differentiable voxel grids (D, H, W, C); the optimization variables."""
    sigma_t: jnp.ndarray   # (D, H, W, 1)
    albedo: jnp.ndarray    # (D, H, W, 3)
    emission: jnp.ndarray  # (D, H, W, 3)


@dataclass(frozen=True)
class MediumConfig:
    """Static (compile-time) medium configuration."""
    majorant_factor: int = 8        # supergrid factor; <=1 -> single global cell
    scale: float = 1.0              # sigma_t = scale * grid (Mitsuba `scale`)
    emission_scaled: bool = True    # emission = scale * grid (branch behavior)
    phase_g: float = 0.0            # HG anisotropy; 0 = isotropic
    # Corner tables trade 8x grid memory for ~3x faster lookups on TPU
    # (gather cost is per-row).  Above `corner_table_max_voxels` the
    # per-channel tables (sigma/albedo/emission — 8x + 3*8x + 3*8x grid
    # memory) are dropped, but the COMBINED sigma+albedo table that the
    # fused tracking loop row-gathers is kept up to
    # `combined_ct_max_voxels` (2.1 GB at 256^3 — fits v5e HBM next to the
    # row-accumulator), so production-scale media (dust-devil 256^3,
    # reference scene_config.py:108,158) stay on the fast path.
    corner_tables: bool = True
    corner_table_max_voxels: int = 160 ** 3
    combined_ct_max_voxels: int = 260 ** 3
    # The fused Pallas tracking kernel keeps the majorant supergrid resident
    # in VMEM as 128-lane chunk rows and requires <= this many supercells
    # (ops/volpath_step.pallas_supported).  When a requested factor yields a
    # larger supergrid (e.g. the reference's factor 8 on 264^3 XML assets,
    # scene_config.py:110), the factor is doubled until it fits — a looser
    # majorant changes tracking COST (more null collisions), never bias.
    # 0 disables the adjustment (exact requested factor, may fall back to
    # the flat engine).  The UIVR_KERNEL_TM env raises the budget in lock
    # step with pallas_supported's gate (round-3 sweeps: a 4096-cell
    # supergrid is 32 chunk-shuffle rounds per lookup, and TIGHTER walking
    # majorants cut the dominant per-collision sigma row gathers now that
    # crossings/classified nulls resolve in-kernel).
    # default_factory: read the env at INSTANTIATION time so this moves in
    # lock step with pallas_supported's per-call read even if the var is
    # set after import
    kernel_majorant_max_cells: int = field(
        default_factory=lambda: int(os.environ.get("UIVR_KERNEL_TM", 2048)))


class Medium(NamedTuple):
    params: MediumParams
    scale: jnp.ndarray           # () f32
    local_to_world: jnp.ndarray  # (4, 4)
    world_to_local: jnp.ndarray  # (4, 4)
    majorant_grid: jnp.ndarray   # (Dc, Hc, Wc) — conservative sigma_t bounds
    phase_g: jnp.ndarray         # () f32
    # Optional corner tables for row-gather trilinear sampling (None = off).
    sigma_ct: object = None      # ((D-1)(H-1)(W-1), 8)
    albedo_ct: object = None     # (..., 24)
    emission_ct: object = None   # (..., 24)
    # Interleaved [sigma, albedo_rgb] x 8 rows: one row gather yields both
    # quantities in the fused tracking loop.
    combined_ct: object = None   # (..., 32)


def _effective_factor(requested: int, shape: Tuple[int, ...]) -> int:
    """Runtime majorant-factor adjustment: shrink the factor until the
    supergrid has a meaningful resolution, else disable (single cell).
    Mirrors reference python/optimize.py:182-199 (min_side // factor >= 4)."""
    f = int(requested)
    min_side = min(int(s) for s in shape[:3])
    while f > 1 and (min_side // f) < 4:
        f -= 1
    return max(f, 1) if f > 1 else 0


def finalize_medium(params: MediumParams, cfg: MediumConfig,
                    to_world: np.ndarray = None) -> Medium:
    """Build the full medium from differentiable grids + static config.

    The majorant supergrid is derived from a *detached* sigma_t (it is a
    sampling bound, not a differentiated quantity — matching the native
    supergrid in the reference branch).
    """
    import jax
    if to_world is None:
        to_world = np.eye(4, dtype=np.float32)
    if isinstance(to_world, np.ndarray):
        inv = jnp.asarray(np.linalg.inv(to_world.astype(np.float64)).astype(np.float32))
        to_world = jnp.asarray(to_world, jnp.float32)
    else:
        to_world = jnp.asarray(to_world, jnp.float32)
        inv = jnp.linalg.inv(to_world)

    f = _effective_factor(cfg.majorant_factor, params.sigma_t.shape)
    if f > 0 and cfg.kernel_majorant_max_cells:
        # coarsen to the kernel-resident supergrid budget (see MediumConfig)
        D_, H_, W_, _ = params.sigma_t.shape

        def n_cells(fac):
            return int(np.prod([-(-max(int(x) - 1, 1) // fac)
                                for x in (D_, H_, W_)]))

        min_side = min(D_, H_, W_)
        while n_cells(f) > cfg.kernel_majorant_max_cells and 2 * f < min_side:
            f *= 2
    sig = jax.lax.stop_gradient(params.sigma_t)
    if f == 0:
        maj = jnp.max(sig)[None, None, None]
    else:
        maj = build_majorant_grid(sig, f)
    maj = maj * jnp.float32(cfg.scale)

    D, H, W, _ = params.sigma_t.shape
    n_vox = D * H * W
    use_ct = (cfg.corner_tables and min(D, H, W) > 1
              and n_vox <= cfg.corner_table_max_voxels)
    use_combined = (cfg.corner_tables and min(D, H, W) > 1
                    and n_vox <= cfg.combined_ct_max_voxels)
    return Medium(
        params=params,
        scale=jnp.float32(cfg.scale),
        local_to_world=to_world,
        world_to_local=inv,
        majorant_grid=maj,
        phase_g=jnp.float32(cfg.phase_g),
        sigma_ct=build_corner_table(params.sigma_t) if use_ct else None,
        albedo_ct=build_corner_table(params.albedo) if use_ct else None,
        emission_ct=build_corner_table(params.emission) if use_ct else None,
        combined_ct=build_corner_table(
            jnp.concatenate([params.sigma_t, params.albedo], axis=-1))
        if use_combined else None,
    )


# ---------------------------------------------------------------- queries
# All positions below are in the medium's LOCAL unit-cube frame.

def sigma_t_at(m: Medium, p: jnp.ndarray) -> jnp.ndarray:
    """(n,) extinction at local points (n, 3)."""
    if m.sigma_ct is not None:
        v = trilinear_sample_ct(m.sigma_ct, m.params.sigma_t.shape, p)
    else:
        v = trilinear_sample(m.params.sigma_t, p)
    return v[..., 0] * m.scale


def albedo_at(m: Medium, p: jnp.ndarray) -> jnp.ndarray:
    """(n, 3) single-scattering albedo."""
    if m.albedo_ct is not None:
        return trilinear_sample_ct(m.albedo_ct, m.params.albedo.shape, p)
    return trilinear_sample(m.params.albedo, p)


def emission_at(m: Medium, p: jnp.ndarray, scaled: bool = True) -> jnp.ndarray:
    """(n, 3) emission radiance."""
    if m.emission_ct is not None:
        e = trilinear_sample_ct(m.emission_ct, m.params.emission.shape, p)
    else:
        e = trilinear_sample(m.params.emission, p)
    return e * m.scale if scaled else e


def sigma_albedo_at(m: Medium, p: jnp.ndarray):
    """(sigma (n,), albedo (n,3)) — ONE row gather in corner-table mode."""
    if m.combined_ct is not None:
        from ..core.grids import trilinear_sample_ct
        D, H, W, _ = m.params.sigma_t.shape
        v = trilinear_sample_ct(m.combined_ct, (D, H, W, 4), p)
        return v[..., 0] * m.scale, v[..., 1:]
    return sigma_t_at(m, p), albedo_at(m, p)


def to_local_rays(m: Medium, o: jnp.ndarray, d: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World rays -> local frame (directions NOT renormalized, so ray
    parameters agree between frames)."""
    return (aabb.transform_points(m.world_to_local, o),
            aabb.transform_dirs(m.world_to_local, d))


def intersect_bbox(m: Medium, o_world: jnp.ndarray, d_world: jnp.ndarray,
                   tmin=0.0, tmax=aabb.INF):
    """Ray/medium-boundary intersection. Returns (t_near, t_far, hit) in
    world ray parameters plus the local-frame ray for traversal."""
    ol, dl = to_local_rays(m, o_world, d_world)
    tn, tf, hit = aabb.ray_unit_cube(ol, dl, tmin, tmax)
    return tn, tf, hit, ol, dl


def majorant_at(m: Medium, p: jnp.ndarray) -> jnp.ndarray:
    """(n,) supercell majorant at local points — piecewise-constant lookup."""
    Dc, Hc, Wc = m.majorant_grid.shape
    res = jnp.array([Wc, Hc, Dc], jnp.float32)
    idx = jnp.clip((jnp.clip(p, 0.0, 1.0) * res).astype(jnp.int32), 0,
                   jnp.array([Wc - 1, Hc - 1, Dc - 1], jnp.int32))
    return m.majorant_grid[idx[..., 2], idx[..., 1], idx[..., 0]]


def global_majorant_of(m: Medium) -> jnp.ndarray:
    return jnp.max(m.majorant_grid)
