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


def build_majorant_grid(sigma: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Conservative coarse max-grid over a (D,H,W,1) density grid.

    TPU-native equivalent of the branch-added Mitsuba majorant supergrid
    (reference: python/optimize.py:182-199).  Supercell ``s`` along an axis
    covers interpolation cells [s*f, (s+1)*f); since a trilinear value inside
    a cell is bounded by the max of its corner nodes, the supercell majorant
    is the max over nodes [s*f, s*f + f] (window f+1, stride f), clamped at
    the boundary.  Returns (Dc, Hc, Wc) with Xc = ceil(max(X-1, 1) / f).
    """
    assert factor >= 1
    D, H, W, C = sigma.shape
    assert C == 1
    s = sigma[..., 0]

    def ncells(n):
        return -(-max(n - 1, 1) // factor)

    dims = (ncells(D), ncells(H), ncells(W))
    pads = []
    for n, c in zip((D, H, W), dims):
        needed = c * factor + 1   # nodes required to cover all windows
        pads.append((0, max(0, needed - n)))
    sp = jnp.pad(s, pads, mode="edge")
    out = jax.lax.reduce_window(
        sp, -jnp.inf, jax.lax.max,
        window_dimensions=(factor + 1,) * 3,
        window_strides=(factor,) * 3,
        padding="VALID")
    assert out.shape == dims, (out.shape, dims)
    return out


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
