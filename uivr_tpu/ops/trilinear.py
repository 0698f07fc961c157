"""In-kernel trilinear grid sampling for Pallas TPU ("spread gather").

Replaces the XLA corner-table row gather (core/grids.py:140-148) inside
Pallas kernels, where XLA's per-row gather cost (~20 ns/lane/op, PLAN.md)
does not apply but Mosaic's ``tpu.dynamic_gather`` has hard constraints
(measured on this toolchain, scripts/repro2/3):

- only ``jnp.take_along_axis(op, idx, axis=1)`` lowers; axis 0 crashes;
- operand and indices must have identical (128, P) shapes;
- no gathers inside traced loops (fori/while) — top level only.

Scheme ("spread"): store each voxel grid as a plane ``plane[x, z*H + y]``
with the x axis in SUBLANES (W <= 128) and (z, y) node rows in LANES.  For a
batch of P rays, broadcast each ray's (z,y) node-row index across all 128
sublanes and gather: column l of the result then holds the grid's entire
x-row at ray l's (z,y).  The four (z,y) corner rows are fetched with four
gathers and combined with the bilinear (fy, fz) weights; the x interpolation
collapses the sublane axis with a weighted one-hot mask and a sublane
reduction.  Exact trilinear interpolation, node-centered, boundary-clamped —
numerically equivalent to ``core.grids.trilinear_sample`` (addition order
differs by float rounding only).

Cost: 4 gathers + ~10 vector passes over (128, P) per channel-plane, i.e.
~1-2 VPU cycles/ray/channel — versus ~20+ ns/ray for one XLA gather.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def plane_from_grid(grid3d: jnp.ndarray, P: int) -> jnp.ndarray:
    """(D, H, W) voxel grid -> (128, P) spread plane, plane[x, z*H + y].

    XLA-side (one transpose per render call).  Requires W <= 128 and
    D*H <= P; pads with zeros.
    """
    D, H, W = grid3d.shape
    assert W <= 128, f"spread plane needs W <= 128, got {W}"
    assert D * H <= P, (D * H, P)
    t = jnp.transpose(grid3d, (2, 0, 1)).reshape(W, D * H)
    return jnp.pad(t, ((0, 128 - W), (0, P - D * H)))


def replicated_table(flat: jnp.ndarray, P: int) -> jnp.ndarray:
    """(T,) table -> (128, max(T, P)) row-replicated operand for arbitrary
    element gathers (every sublane holds the full table)."""
    T = flat.shape[0]
    width = max(T, P)
    row = jnp.pad(flat.reshape(1, T), ((0, 0), (0, width - T)))
    return jnp.broadcast_to(row, (128, width))


# ---------------------------------------------------------------------------
# In-kernel helpers.  All operate on "row" layout (1, P) / spread (128, P).
# ---------------------------------------------------------------------------

def rep_gather(table: jnp.ndarray, idx_row: jnp.ndarray) -> jnp.ndarray:
    """Arbitrary element gather from a row-replicated (128, T) table.

    ``idx_row`` (rows, P) int32 with P <= T: every sublane of the operand
    holds the whole table, so any (i, j) -> table[idx[i, j]] works.  Pads the
    index block to the operand shape (same-shape constraint) and slices back.
    """
    rows, P = idx_row.shape
    T = table.shape[1]
    idx = jnp.pad(idx_row, ((0, 128 - rows), (0, T - P)))
    out = jnp.take_along_axis(table, idx, axis=1)
    return out[:rows, :P]


def cell_coords(px, py, pz, shape: Tuple[int, int, int]):
    """Trilinear cell coordinates for points in [0,1]^3 (node-centered,
    clamped) — numerically identical to grids._corner_indices_weights.

    Inputs are (.., P) f32 planes (x, y, z separately). Returns
    (ix0, zy00, dx, dy, dzH (i32), fx, fy, fz (f32)) where zy00 = iz0*H+iy0
    indexes the (z,y) node-row lanes of a spread plane and dx/dy/dzH are the
    boundary-clamped +1 offsets (dzH pre-multiplied by H).
    """
    D, H, W = shape

    def axis(p, n):
        res = jnp.float32(n - 1)
        x = jnp.clip(p, 0.0, 1.0) * res
        i0 = jnp.clip(jnp.floor(x), 0.0, jnp.maximum(res - 1.0, 0.0))
        f = x - i0
        f = f if n > 1 else jnp.zeros_like(f)
        i0i = i0.astype(jnp.int32)
        d = jnp.minimum(i0i + 1, max(n - 1, 0)) - i0i
        return i0i, d, f

    ix0, dx, fx = axis(px, W)
    iy0, dy, fy = axis(py, H)
    iz0, dz, fz = axis(pz, D)
    return ix0, iz0 * H + iy0, dx, dy, dz * H, fx, fy, fz


def trilinear_spread(plane, zy00, dy, dzH, wz0y0, wz0y1, wz1y0, wz1y1,
                     xmask) -> jnp.ndarray:
    """zy-bilinear fetch + x mask-reduce. All index/weight rows are (1, P);
    ``plane`` is (128, P'); ``xmask`` from :func:`x_select_mask`.
    Returns (1, P) interpolated values."""
    P = zy00.shape[1]

    def fetch(zy):
        idx = jnp.broadcast_to(zy, (128, P))
        if plane.shape[1] != P:
            idx = jnp.pad(idx, ((0, 0), (0, plane.shape[1] - P)))
            return jnp.take_along_axis(plane, idx, axis=1)[:, :P]
        return jnp.take_along_axis(plane, idx, axis=1)

    a = (fetch(zy00) * wz0y0 + fetch(zy00 + dy) * wz0y1
         + fetch(zy00 + dzH) * wz1y0 + fetch(zy00 + dzH + dy) * wz1y1)
    return jnp.sum(xmask * a, axis=0, keepdims=True)


def x_select_mask(ix0, dx, fx) -> jnp.ndarray:
    """(128, P) weighted one-hot over sublanes: gx at row ix0, fx at row
    ix0+dx (same row when clamped — weights then sum to 1)."""
    P = ix0.shape[1]
    s = jax.lax.broadcasted_iota(jnp.int32, (128, P), 0)
    gx = 1.0 - fx
    return ((s == ix0).astype(jnp.float32) * gx
            + (s == (ix0 + dx)).astype(jnp.float32) * fx)


def zy_weights(fy, fz):
    gy, gz = 1.0 - fy, 1.0 - fz
    return gz * gy, gz * fy, fz * gy, fz * fy
