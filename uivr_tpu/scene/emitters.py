"""Emitters: constant background and importance-sampled lat-long envmap.

TPU-native replacement for Mitsuba's ``constant`` and ``envmap`` plugins and
``scene.sample_emitter_direction`` / ``emitter.pdf_direction`` /
``emitter.eval`` (reference: python/integrators/volpathsimple.py:267-285,
406-433).  Envmap importance sampling uses 2D CDF tables (sin-weighted row
marginal + per-row conditional), evaluated with vectorized searchsorted —
gather-friendly on TPU.

Both emitters are infinite ("distance to emitter" never matters); sampling
returns (direction, solid-angle pdf, radiance/pdf) to match Mitsuba's
``sample_emitter_direction`` contract.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

_TWO_PI = 2.0 * np.pi
_INV_FOUR_PI = 1.0 / (4.0 * np.pi)


def _square_to_uniform_sphere(u: jnp.ndarray) -> jnp.ndarray:
    z = 1.0 - 2.0 * u[:, 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = _TWO_PI * u[:, 1]
    return jnp.stack([r * jnp.cos(phi), z, r * jnp.sin(phi)], axis=-1)


class ConstantEmitter(NamedTuple):
    radiance: jnp.ndarray  # (3,)

    def eval(self, d: jnp.ndarray) -> jnp.ndarray:
        return jnp.broadcast_to(self.radiance, d.shape[:-1] + (3,))

    def pdf_direction(self, d: jnp.ndarray) -> jnp.ndarray:
        return jnp.full(d.shape[:-1], _INV_FOUR_PI, d.dtype)

    def sample_direction(self, u2: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        d = _square_to_uniform_sphere(u2)
        pdf = jnp.full(u2.shape[:-1], _INV_FOUR_PI, u2.dtype)
        weight = self.radiance / _INV_FOUR_PI
        return d, pdf, jnp.broadcast_to(weight, d.shape[:-1] + (3,))


class EnvmapEmitter(NamedTuple):
    """Lat-long environment map with 2D CDF importance sampling.

    Mapping (y-up world): v = theta/pi with theta = angle from +y,
    u = atan2(d.z, d.x) / 2pi (wrapped).  ``to_world`` rotates emitter-local
    directions into world space.
    """
    data: jnp.ndarray       # (H, W, 3)
    row_cdf: jnp.ndarray    # (H,)   inclusive cdf over rows (sin-weighted)
    cond_cdf: jnp.ndarray   # (H, W) inclusive cdf within each row
    row_pmf: jnp.ndarray    # (H,)
    cond_pmf: jnp.ndarray   # (H, W)
    to_world: jnp.ndarray   # (3, 3)

    # ---- direction <-> uv ------------------------------------------------
    def _dir_to_uv(self, d: jnp.ndarray) -> jnp.ndarray:
        dl = d @ self.to_world  # world -> local (rotation: inverse = transpose)
        u = jnp.arctan2(dl[..., 2], dl[..., 0]) / _TWO_PI
        u = jnp.mod(u, 1.0)
        v = jnp.arccos(jnp.clip(dl[..., 1], -1.0, 1.0)) / jnp.pi
        return jnp.stack([u, v], axis=-1)

    def _uv_to_dir(self, uv: jnp.ndarray) -> jnp.ndarray:
        phi = uv[..., 0] * _TWO_PI
        theta = uv[..., 1] * jnp.pi
        st = jnp.sin(theta)
        dl = jnp.stack([st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi)],
                       axis=-1)
        return dl @ self.to_world.T

    # ---- queries ---------------------------------------------------------
    def eval(self, d: jnp.ndarray) -> jnp.ndarray:
        """Bilinear radiance lookup in direction ``d`` (n, 3)."""
        H, W, _ = self.data.shape
        uv = self._dir_to_uv(d)
        x = uv[..., 0] * W - 0.5
        y = jnp.clip(uv[..., 1] * H - 0.5, 0.0, H - 1.0)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0i = jnp.mod(x0.astype(jnp.int32), W)
        x1i = jnp.mod(x0i + 1, W)
        y1 = jnp.minimum(y0 + 1, H - 1)
        c00 = self.data[y0, x0i]
        c01 = self.data[y0, x1i]
        c10 = self.data[y1, x0i]
        c11 = self.data[y1, x1i]
        return ((c00 * (1 - fx) + c01 * fx) * (1 - fy)
                + (c10 * (1 - fx) + c11 * fx) * fy)

    def pdf_direction(self, d: jnp.ndarray) -> jnp.ndarray:
        """Solid-angle pdf of ``sample_direction`` for MIS."""
        H, W, _ = self.data.shape
        uv = self._dir_to_uv(d)
        col = jnp.clip((uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
        row = jnp.clip((uv[..., 1] * H).astype(jnp.int32), 0, H - 1)
        p_uv = self.row_pmf[row] * H * self.cond_pmf[row, col] * W
        sin_theta = jnp.sin(jnp.clip(uv[..., 1], 1e-4, 1 - 1e-4) * jnp.pi)
        return p_uv / (2.0 * jnp.pi * jnp.pi * sin_theta)

    def sample_direction(self, u2: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Importance-sample a direction; returns (d, pdf, radiance/pdf)."""
        H, W, _ = self.data.shape
        row = jnp.clip(jnp.searchsorted(self.row_cdf, u2[:, 0], side="right"),
                       0, H - 1)
        # continuous offset within the row bin
        lo = jnp.where(row > 0, self.row_cdf[row - 1], 0.0)
        dv = jnp.where(self.row_pmf[row] > 0,
                       (u2[:, 0] - lo) / jnp.maximum(self.row_pmf[row], 1e-20), 0.5)
        v = (row.astype(u2.dtype) + jnp.clip(dv, 0.0, 1.0)) / H

        # vectorized per-row searchsorted via comparison counting would be
        # O(W) per lane; vmap of searchsorted keeps the log(W) binary search.
        cdf_rows = self.cond_cdf[row]                  # (n, W) gather
        col = jnp.clip(_rowwise_searchsorted(cdf_rows, u2[:, 1]), 0, W - 1)
        pmf_c = jnp.take_along_axis(self.cond_pmf[row], col[:, None], 1)[:, 0]
        lo_c = jnp.where(col > 0,
                         jnp.take_along_axis(cdf_rows, jnp.maximum(col - 1, 0)[:, None], 1)[:, 0],
                         0.0)
        du = jnp.where(pmf_c > 0, (u2[:, 1] - lo_c) / jnp.maximum(pmf_c, 1e-20), 0.5)
        u = (col.astype(u2.dtype) + jnp.clip(du, 0.0, 1.0)) / W

        uv = jnp.stack([u, v], axis=-1)
        d = self._uv_to_dir(uv)
        sin_theta = jnp.sin(jnp.clip(v, 1e-4, 1 - 1e-4) * jnp.pi)
        pdf = (self.row_pmf[row] * H * pmf_c * W) / (2.0 * jnp.pi * jnp.pi * sin_theta)
        val = self.data[row, col]
        weight = jnp.where(pdf[:, None] > 0, val / jnp.maximum(pdf, 1e-20)[:, None], 0.0)
        return d, pdf, weight


def _rowwise_searchsorted(cdf_rows: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Binary search of u[i] in cdf_rows[i, :] (right side), vectorized."""
    n, W = cdf_rows.shape
    lo = jnp.zeros((n,), jnp.int32)
    hi = jnp.full((n,), W, jnp.int32)
    steps = int(np.ceil(np.log2(max(W, 2)))) + 1
    for _ in range(steps):
        mid = (lo + hi) // 2
        val = jnp.take_along_axis(cdf_rows, jnp.clip(mid, 0, W - 1)[:, None], 1)[:, 0]
        go_right = val <= u
        lo = jnp.where(go_right, jnp.minimum(mid + 1, hi), lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def make_envmap(data: np.ndarray, to_world: np.ndarray = None) -> EnvmapEmitter:
    """Build CDF tables for a (H, W, 3) radiance map."""
    data = np.asarray(data, np.float32)
    H, W, _ = data.shape
    lum = data @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    sin_theta = np.sin((np.arange(H) + 0.5) / H * np.pi).astype(np.float32)
    w = np.maximum(lum, 0.0) * sin_theta[:, None] + 1e-12
    row_w = w.sum(axis=1)
    row_pmf = row_w / row_w.sum()
    row_cdf = np.cumsum(row_pmf)
    row_cdf[-1] = 1.0
    cond_pmf = w / row_w[:, None]
    cond_cdf = np.cumsum(cond_pmf, axis=1)
    cond_cdf[:, -1] = 1.0
    if to_world is None:
        to_world = np.eye(3, dtype=np.float32)
    return EnvmapEmitter(
        data=jnp.asarray(data),
        row_cdf=jnp.asarray(row_cdf.astype(np.float32)),
        cond_cdf=jnp.asarray(cond_cdf.astype(np.float32)),
        row_pmf=jnp.asarray(row_pmf.astype(np.float32)),
        cond_pmf=jnp.asarray(cond_pmf.astype(np.float32)),
        to_world=jnp.asarray(np.asarray(to_world, np.float32)),
    )
