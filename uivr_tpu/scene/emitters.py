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

import os
from typing import NamedTuple, Optional, Tuple

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
    """Lat-long environment map with alias-table importance sampling.

    Mapping (y-up world): v = theta/pi with theta = angle from +y,
    u = atan2(d.z, d.x) / 2pi (wrapped).  ``to_world`` rotates emitter-local
    directions into world space.

    Sampling uses the Walker alias method over the flattened (H*W) texel
    distribution: O(1) — two table reads + one radiance read — instead of a
    log(H)+log(W) binary search; critical inside flattened tracking loops
    where emitter sampling runs every wavefront iteration.  ``pdf_direction``
    keeps the pmf tables for MIS queries.
    """
    data: jnp.ndarray       # (H, W, 3)
    row_pmf: jnp.ndarray    # (H,)
    cond_pmf: jnp.ndarray   # (H, W)
    # fused per-texel sampling table: ONE row gather per sample
    # [alias_p, alias_idx(float), pmf_self, pmf_alias] (H*W, 4)
    alias_tab: jnp.ndarray
    # radiance with pre-divided pdf-free values per texel (H*W, 3) = data rows
    flat_data: jnp.ndarray
    to_world: jnp.ndarray   # (3, 3)
    # Coarse proxy emitter for in-kernel NEE on maps too large for VMEM
    # chunk tables (built once, host-side, in make_envmap; None when the
    # full-res map is small enough).  The Pallas engine SAMPLES directions
    # from nee's alias table / pdf and evaluates radiance at FULL res — the
    # 1e-12 pmf floor in make_envmap guarantees nee covers the support of
    # the radiance, so the estimator stays unbiased.
    nee: Optional["EnvmapEmitter"] = None

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
        """Importance-sample a direction via the alias table; returns
        (d, pdf, radiance/pdf). Three table reads per lane."""
        H, W, _ = self.data.shape
        N = H * W
        scaled = u2[:, 0] * N
        slot = jnp.clip(scaled.astype(jnp.int32), 0, N - 1)
        frac = scaled - slot.astype(u2.dtype)
        tab = self.alias_tab[slot]                 # one row gather
        a_p, a_idx, pmf_self, pmf_alias = (tab[:, 0], tab[:, 1], tab[:, 2],
                                           tab[:, 3])
        keep = frac < a_p
        texel = jnp.where(keep, slot, a_idx.astype(jnp.int32))
        pmf = jnp.where(keep, pmf_self, pmf_alias)
        row = texel // W
        col = texel - row * W
        # uniform position within the chosen texel
        u = (col.astype(u2.dtype) + u2[:, 1]) / W
        # reuse the sub-texel fraction for v jitter (decorrelated via alias)
        dv = jnp.where(keep, frac / jnp.maximum(a_p, 1e-20),
                       (frac - a_p) / jnp.maximum(1.0 - a_p, 1e-20))
        v = (row.astype(u2.dtype) + jnp.clip(dv, 0.0, 1.0 - 1e-6)) / H

        uv = jnp.stack([u, v], axis=-1)
        d = self._uv_to_dir(uv)
        sin_theta = jnp.sin(jnp.clip(v, 1e-4, 1 - 1e-4) * jnp.pi)
        pdf = (pmf * N) / (2.0 * jnp.pi * jnp.pi * sin_theta)
        val = self.flat_data[texel]                # one row gather
        weight = jnp.where(pdf[:, None] > 0,
                           val / jnp.maximum(pdf, 1e-20)[:, None], 0.0)
        return d, pdf, weight


def _build_alias(pmf: np.ndarray):
    """Walker/Vose alias table for a pmf (host-side, O(N)); uses the native
    C++ kernel when available (uivr_tpu/native), else pure Python."""
    from .. import native
    nat = native.build_alias_table(pmf)
    if nat is not None:
        return nat
    N = pmf.size
    scaled = pmf * N
    alias = np.arange(N, dtype=np.int32)
    prob = np.ones(N, dtype=np.float32)
    small = [i for i in range(N) if scaled[i] < 1.0]
    large = [i for i in range(N) if scaled[i] >= 1.0]
    scaled = scaled.copy()
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = scaled[l] - (1.0 - scaled[s])
        (small if scaled[l] < 1.0 else large).append(l)
    for i in large + small:
        prob[i] = 1.0
    return alias, prob


def _area_downsample(data: np.ndarray, max_texels: int) -> np.ndarray:
    """Exact area-weighted mean downsample of (H, W, 3) so that the result
    has at most ``max_texels`` texels (aspect preserved; arbitrary dims —
    coarse/fine cell boundaries need not align)."""
    H, W, _ = data.shape
    k = 1
    while -(-H // k) * -(-W // k) > max_texels:
        k += 1
    Hc, Wc = -(-H // k), -(-W // k)

    def overlap(nc, nf):
        # A[i, j] = |[i/nc,(i+1)/nc] ∩ [j/nf,(j+1)/nf]| * nc  (rows sum to 1)
        i = np.arange(nc, dtype=np.float64)[:, None]
        j = np.arange(nf, dtype=np.float64)[None, :]
        lo = np.maximum(i / nc, j / nf)
        hi = np.minimum((i + 1) / nc, (j + 1) / nf)
        return (np.maximum(hi - lo, 0.0) * nc).astype(np.float64)

    Ah = overlap(Hc, H)
    Aw = overlap(Wc, W)
    out = np.einsum("ij,jwc,kw->ikc", Ah, data.astype(np.float64), Aw)
    return out.astype(np.float32)


def make_envmap(data: np.ndarray, to_world: np.ndarray = None,
                nee_max_texels: int = 8192) -> EnvmapEmitter:
    """Build pmf + alias tables for a (H, W, 3) radiance map.

    Maps larger than ``nee_max_texels`` also get a coarse ``nee`` proxy
    (target size ``UIVR_NEE_COARSE_TEX``, default 2048 texels) used by the
    Pallas engine for in-kernel NEE sampling."""
    data = np.asarray(data, np.float32)
    H, W, _ = data.shape
    lum = data @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    sin_theta = np.sin((np.arange(H) + 0.5) / H * np.pi).astype(np.float32)
    w = np.maximum(lum, 0.0) * sin_theta[:, None] + 1e-12
    row_w = w.sum(axis=1)
    row_pmf = (row_w / row_w.sum()).astype(np.float32)
    cond_pmf = (w / row_w[:, None]).astype(np.float32)
    texel_pmf = (row_pmf[:, None] * cond_pmf).reshape(-1).astype(np.float64)
    texel_pmf /= texel_pmf.sum()
    alias, prob = _build_alias(texel_pmf)
    tp32 = texel_pmf.astype(np.float32)
    alias_tab = np.stack([prob, alias.astype(np.float32), tp32, tp32[alias]],
                         axis=-1).astype(np.float32)
    if to_world is None:
        to_world = np.eye(3, dtype=np.float32)
    nee = None
    if nee_max_texels and H * W > nee_max_texels:
        tgt = int(os.environ.get("UIVR_NEE_COARSE_TEX", 2048))
        nee = make_envmap(_area_downsample(data, tgt), to_world,
                          nee_max_texels=0)
    return EnvmapEmitter(
        nee=nee,
        data=jnp.asarray(data),
        row_pmf=jnp.asarray(row_pmf),
        cond_pmf=jnp.asarray(cond_pmf),
        alias_tab=jnp.asarray(alias_tab),
        flat_data=jnp.asarray(data.reshape(-1, 3)),
        to_world=jnp.asarray(np.asarray(to_world, np.float32)),
    )
