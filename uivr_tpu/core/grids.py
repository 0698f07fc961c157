"""Trilinearly interpolated 3D voxel grids + majorant supergrids.

TPU-native replacement for Mitsuba's native ``gridvolume`` 3D texture
(reference usage: python/integrators/volpathsimple.py:141,374-375,
python/integrators/nerf.py:157,164) and the branch-added majorant supergrid
(reference: python/optimize.py:182-199, tests/test_integrators.py:79-103).

Layout convention: ``data[D, H, W, C]`` with D = z (slowest), matching the
numpy layout of Mitsuba ``.vol`` grids (x fastest).  Sample positions are in
the grid's *local* unit cube [0,1]^3; data points are node-centered (value at
local coordinate (x,y,z) interpolates the 8 surrounding nodes of the
(W-1, H-1, D-1) cell lattice), coordinates clamped at the boundary.

Gradients: the forward lookup is a gather, whose pullback is a scatter-add of
``cotangent x trilinear-weight`` into the 8 corner nodes —
``trilinear_scatter`` implements that pullback explicitly so PRB adjoint
loops can accumulate grid gradients without an AD tape (reference relies on
Dr.Jit scatter-add AD; here the adjoint is hand-written).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _corner_indices_weights(shape: Tuple[int, ...], p: jnp.ndarray):
    """Shared helper: flat node indices (n, 8) int32 and weights (n, 8) f32
    for trilinear interpolation of points ``p`` (n, 3) in [0,1]^3 (x, y, z
    order) over a grid with shape (D, H, W, C)."""
    D, H, W = int(shape[0]), int(shape[1]), int(shape[2])
    res = jnp.array([W - 1, H - 1, D - 1], dtype=p.dtype)
    # Node-centered: local [0,1] spans node 0 .. node (n-1).
    x = jnp.clip(p, 0.0, 1.0) * res
    i0 = jnp.clip(jnp.floor(x), 0, jnp.maximum(res - 1, 0)).astype(jnp.int32)
    f = x - i0.astype(p.dtype)
    # Degenerate axes (single node): weight collapses to node 0.
    f = jnp.where(res > 0, f, 0.0)
    i1 = jnp.minimum(i0 + 1, jnp.maximum(res.astype(jnp.int32), 0))

    ix0, iy0, iz0 = i0[..., 0], i0[..., 1], i0[..., 2]
    ix1, iy1, iz1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz

    def flat(iz, iy, ix):
        return (iz * H + iy) * W + ix

    idx = jnp.stack([
        flat(iz0, iy0, ix0), flat(iz0, iy0, ix1),
        flat(iz0, iy1, ix0), flat(iz0, iy1, ix1),
        flat(iz1, iy0, ix0), flat(iz1, iy0, ix1),
        flat(iz1, iy1, ix0), flat(iz1, iy1, ix1),
    ], axis=-1)
    w = jnp.stack([
        gz * gy * gx, gz * gy * fx,
        gz * fy * gx, gz * fy * fx,
        fz * gy * gx, fz * gy * fx,
        fz * fy * gx, fz * fy * fx,
    ], axis=-1)
    return idx, w


def trilinear_sample(data: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Sample grid ``data`` (D,H,W,C) at points ``p`` (n,3) -> (n,C).

    Differentiable w.r.t. ``data`` through plain JAX AD (gather pullback),
    though hot adjoints use :func:`trilinear_scatter` directly.
    """
    C = data.shape[-1]
    idx, w = _corner_indices_weights(data.shape, p)
    flat = data.reshape(-1, C)
    vals = flat[idx]                       # (n, 8, C) gather
    return jnp.sum(vals * w[..., None], axis=-2)


def trilinear_scatter(grad_acc: jnp.ndarray, p: jnp.ndarray,
                      cot: jnp.ndarray, mask: jnp.ndarray = None) -> jnp.ndarray:
    """Explicit pullback of :func:`trilinear_sample`: accumulate
    ``cot`` (n, C) into ``grad_acc`` (D,H,W,C) at points ``p`` (n, 3).
    ``mask`` (n,) zeroes out inactive lanes. Returns the updated grid."""
    C = grad_acc.shape[-1]
    idx, w = _corner_indices_weights(grad_acc.shape, p.astype(grad_acc.dtype))
    if mask is not None:
        w = w * mask.astype(w.dtype)[..., None]
    contrib = w[..., None] * cot[..., None, :]          # (n, 8, C)
    flat = grad_acc.reshape(-1, C)
    flat = flat.at[idx.reshape(-1)].add(
        contrib.reshape(-1, C), mode="drop")
    return flat.reshape(grad_acc.shape)


def build_corner_table(data: jnp.ndarray) -> jnp.ndarray:
    """Cell-corner table for row-gather trilinear sampling.

    TPU's XLA gather cost is dominated by the per-row count, not row width
    (measured ~3x win): storing each interpolation cell's 8 corner values
    contiguously turns a trilinear lookup (8 scattered element-gathers) into
    ONE row gather of 8*C contiguous floats.

    data (D,H,W,C) -> table ((D-1)(H-1)(W-1), 8*C); corner order matches
    ``_corner_indices_weights`` (z-major: 000,001,010,011,100,101,110,111
    in (z,y,x) bit order with x fastest).
    """
    D, H, W, C = data.shape
    assert D > 1 and H > 1 and W > 1, "corner table needs >=2 nodes per axis"
    corners = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                corners.append(data[dz:dz + D - 1, dy:dy + H - 1,
                                    dx:dx + W - 1, :])
    # (D-1,H-1,W-1, 8, C) -> rows of 8*C
    t = jnp.stack(corners, axis=3)
    return t.reshape((D - 1) * (H - 1) * (W - 1), 8 * C)


def _cell_index_weights(shape: Tuple[int, ...], p: jnp.ndarray):
    """Cell row index (n,) and trilinear weights (n, 8) for the corner-table
    layout; numerically identical to ``_corner_indices_weights``."""
    D, H, W = int(shape[0]), int(shape[1]), int(shape[2])
    res = jnp.array([W - 1, H - 1, D - 1], dtype=p.dtype)
    x = jnp.clip(p, 0.0, 1.0) * res
    i0 = jnp.clip(jnp.floor(x), 0, jnp.maximum(res - 1, 0)).astype(jnp.int32)
    f = x - i0.astype(p.dtype)
    f = jnp.where(res > 0, f, 0.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    cell = (i0[..., 2] * (H - 1) + i0[..., 1]) * (W - 1) + i0[..., 0]
    w = jnp.stack([
        gz * gy * gx, gz * gy * fx,
        gz * fy * gx, gz * fy * fx,
        fz * gy * gx, fz * gy * fx,
        fz * fy * gx, fz * fy * fx,
    ], axis=-1)
    return cell, w


def trilinear_sample_ct(table: jnp.ndarray, shape: Tuple[int, ...],
                        p: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample via the corner table (one row gather per point).
    ``shape`` is the ORIGINAL grid shape (D,H,W,C). Returns (n, C)."""
    C = int(shape[3])
    cell, w = _cell_index_weights(shape, p)
    rows = table[cell]                                   # (n, 8*C)
    vals = rows.reshape(rows.shape[:-1] + (8, C))
    return jnp.sum(vals * w[..., None], axis=-2)


def trilinear_scatter_ct(grad_table: jnp.ndarray, shape: Tuple[int, ...],
                         p: jnp.ndarray, cot: jnp.ndarray,
                         mask: jnp.ndarray = None) -> jnp.ndarray:
    """Corner-table analogue of :func:`trilinear_scatter`: accumulate
    cotangents as ONE contiguous row scatter-add per point into a
    ((D-1)(H-1)(W-1), 8*C) gradient table (fold back to grid shape with
    :func:`fold_corner_table`)."""
    C = int(shape[3])
    cell, w = _cell_index_weights(shape, p.astype(grad_table.dtype))
    if mask is not None:
        w = w * mask.astype(w.dtype)[..., None]
    contrib = (w[..., None] * cot[..., None, :]).reshape(
        p.shape[:-1] + (8 * C,))
    return grad_table.at[cell].add(contrib, mode="drop")


def fold_corner_table(grad_table: jnp.ndarray,
                      shape: Tuple[int, ...]) -> jnp.ndarray:
    """Fold a corner-table gradient accumulator back into grid shape: each
    node sums the contributions from every cell it is a corner of."""
    D, H, W, C = (int(s) for s in shape)
    t = grad_table.reshape(D - 1, H - 1, W - 1, 8, C)
    out = jnp.zeros((D, H, W, C), grad_table.dtype)
    k = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                out = out.at[dz:dz + D - 1, dy:dy + H - 1,
                             dx:dx + W - 1, :].add(t[..., k, :])
                k += 1
    return out


def _axis_window_max(arr: jnp.ndarray, axis: int, n_nodes: int,
                     n_cells: int) -> jnp.ndarray:
    """Per-axis conservative max-pool onto ``n_cells`` UNIFORM-p cells.

    Cell ``s`` covers local coordinates p in [s/c, (s+1)/c], i.e. node-space
    x = p*(N-1) in [s*(N-1)/c, (s+1)*(N-1)/c]; trilinear interpolation there
    reads nodes floor(x) and floor(x)+1, so the cell's bound is the max over
    nodes [floor(s*(N-1)/c), floor((s+1)*(N-1)/c) + 1] (clamped).  Windows
    have data-independent extents, implemented as one static gather + max.
    """
    import numpy as np
    N, c = int(n_nodes), int(n_cells)
    s = np.arange(c, dtype=np.int64)
    lo = (s * (N - 1)) // c
    hi = np.minimum(((s + 1) * (N - 1)) // c + 1, N - 1)
    win = int((hi - lo).max()) + 1
    idx = np.minimum(lo[:, None] + np.arange(win)[None, :], hi[:, None])
    g = jnp.take(arr, jnp.asarray(idx.reshape(-1), jnp.int32), axis=axis)
    shp = list(g.shape)
    shp[axis:axis + 1] = [c, win]
    return jnp.max(g.reshape(shp), axis=axis + 1)


def build_bound_grid(sigma: jnp.ndarray, dims: Tuple[int, int, int]
                     ) -> jnp.ndarray:
    """Conservative per-cell upper bound of trilinear(sigma) on a uniform-p
    cell grid of shape ``dims`` (Dc, Hc, Wc): separable application of
    :func:`_axis_window_max` over the (D,H,W,1) node grid."""
    D, H, W, C = sigma.shape
    assert C == 1
    s = sigma[..., 0]
    s = _axis_window_max(s, 0, D, dims[0])
    s = _axis_window_max(s, 1, H, dims[1])
    s = _axis_window_max(s, 2, W, dims[2])
    return s


def majorant_dims(shape: Tuple[int, ...], factor: int) -> Tuple[int, int, int]:
    """Supergrid dims for a (D,H,W,...) grid: Xc = ceil(max(X-1,1)/factor)."""
    return tuple(-(-max(int(n) - 1, 1) // factor) for n in shape[:3])


def build_majorant_grid(sigma: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Conservative coarse max-grid over a (D,H,W,1) density grid.

    TPU-native equivalent of the branch-added Mitsuba majorant supergrid
    (reference: python/optimize.py:182-199).  Supercells are UNIFORM in the
    local [0,1]^3 frame — matching every runtime lookup (floor(p * dims)) —
    and each cell's majorant is the max over all nodes whose trilinear
    support intersects the cell (:func:`build_bound_grid`), so trilinear
    sigma never exceeds the looked-up majorant anywhere in the cell.
    (An earlier node-space stride-``factor`` windowing disagreed with the
    uniform-p lookup on non-divisible grids, under-covering boundary
    slivers — a bias; see tests/test_grids.py majorant coverage tests.)
    Returns (Dc, Hc, Wc) with Xc = ceil(max(X-1, 1) / factor).
    """
    assert factor >= 1
    return build_bound_grid(sigma, majorant_dims(sigma.shape, factor))


def global_majorant(sigma: jnp.ndarray) -> jnp.ndarray:
    """Scalar majorant over the whole grid (supergrid factor 0 fallback)."""
    return jnp.max(sigma)


def resize_trilinear(data: jnp.ndarray, new_res: Tuple[int, int, int]) -> jnp.ndarray:
    """First-order (trilinear) grid resampling used by the multi-resolution
    upsampling schedule (reference: python/optimize.py:203-252, which uses
    ``scipy.ndimage.zoom(order=1, grid_mode=True)``)."""
    D, H, W, C = data.shape
    out = jax.image.resize(data, (*new_res, C), method="trilinear")
    return out
