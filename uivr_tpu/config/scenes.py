"""Procedural scene builders.

Replaces the reference's Mitsuba XML scene files + ``$var`` substitution
(reference: python/optimize.py:14-21, scenes/*.xml).  The cube test scene
reproduces the deterministic 3x3x3 grids of the reference test fixture
(tests/test_integrators.py:19-116) so the test strategies map one-to-one.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..scene.camera import Cameras, look_at, make_cameras, orbit_cameras
from ..scene.emitters import ConstantEmitter, make_envmap
from ..scene.medium import MediumConfig, MediumParams
from ..scene.scene import Emitter


@dataclass
class SceneBundle:
    """Everything needed to render/optimize one scene."""
    params: MediumParams          # ground-truth (reference) grids
    medium_cfg: MediumConfig
    emitter: Emitter
    cameras: Cameras
    to_world: np.ndarray          # medium local->world
    film_size: Tuple[int, int]
    max_depth: int = 64
    max_density: float = 250.0
    start_from: Optional[MediumParams] = None   # optimization initialization
    # Calibrated sensor-rig subsets (reference SceneConfig.sensors /
    # preview_sensors, scene_config.py:15,28): training batches and
    # reference renders draw only from `sensors` (None = all cameras);
    # previews render `preview_sensors` (None = first of `sensors`).
    sensors: Optional[Tuple[int, ...]] = None
    preview_sensors: Optional[Tuple[int, ...]] = None


def cube_test_grids():
    """The reference's deterministic 3x3x3 test grids
    (tests/test_integrators.py:22-38)."""
    sigma = np.full((3, 3, 3, 1), 1.0, np.float32) * 0.5
    sigma[0, 0, 0, :] = 0.1
    sigma[0, -1, 0, :] = 2.0
    sigma[0, 0, -1, :] = 0.2
    emission = np.full((3, 3, 3, 3), 1.0, np.float32)
    emission[..., 0] = 0.3
    emission[..., 1] = 0.5
    emission[..., 2] = 0.9
    n = emission.shape[0]
    for i in range(n):
        emission[i, :, :, 0] *= np.square((i + 1) / n)
        emission[i, :, :, 1] *= 1 - (i + 1) / n
        emission[:, i, :, 1] *= np.square((i + 1) / n)
    albedo = np.clip(emission, 0, 1)
    return sigma, albedo, emission


def cube_test_scene(resx: int = 128, resy: int = 128,
                    density_scale: float = 1.0,
                    majorant_factor: int = 8,
                    max_depth: int = 64) -> SceneBundle:
    """Procedural equivalent of the reference cube test scene
    (tests/test_integrators.py:19-116): unit cube scaled x2 centered near the
    origin, constant emitter [1.0, 0.8, 0.2], one perspective sensor at
    (4,4,4) looking at (0,-0.15,0), fov 30."""
    sigma, albedo, emission = cube_test_grids()
    params = MediumParams(sigma_t=jnp.asarray(sigma),
                          albedo=jnp.asarray(albedo),
                          emission=jnp.asarray(emission))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] *= 2.0
    T[:3, 3] = [-0.5, -0.5, -0.5]
    cams = make_cameras(look_at([4.0, 4.0, 4.0], [0.0, -0.15, 0.0],
                                [0.0, 1.0, 0.0]), 30.0, resx, resy)
    start = MediumParams(
        sigma_t=jnp.full_like(params.sigma_t, 0.04 / density_scale),
        albedo=jnp.full_like(params.albedo, 0.6),
        emission=jnp.full_like(params.emission, 0.1 / density_scale),
    )
    return SceneBundle(
        params=params,
        medium_cfg=MediumConfig(majorant_factor=majorant_factor,
                                scale=density_scale),
        emitter=ConstantEmitter(radiance=jnp.array([1.0, 0.8, 0.2])),
        cameras=cams,
        to_world=T,
        film_size=(resx, resy),
        max_depth=max_depth,
        start_from=start,
    )


def procedural_smoke_grids(res: int = 64, seed: int = 0):
    """A smooth smoke-like density (sum of randomized Gaussian blobs +
    falloff), used for benchmark scenes in place of the paper's downloadable
    .vol assets."""
    rs = np.random.RandomState(seed)
    z, y, x = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res),
                          np.linspace(0, 1, res), indexing="ij")
    density = np.zeros((res, res, res), np.float32)
    for _ in range(24):
        c = rs.rand(3) * 0.7 + 0.15
        s = rs.rand() * 0.12 + 0.04
        a = rs.rand() * 1.2
        density += a * np.exp(-(((x - c[0]) ** 2 + (y - c[1]) ** 2
                                 + (z - c[2]) ** 2) / (2 * s * s)))
    # vertical falloff like a smoke plume
    density *= np.exp(-2.5 * np.abs(y - 0.4))
    density = (density / density.max()).astype(np.float32)
    albedo = np.stack([0.7 + 0.2 * x, 0.7 + 0.2 * y, 0.7 + 0.2 * z],
                      axis=-1).astype(np.float32)
    emission = (0.1 * density)[..., None] * np.array([1.0, 0.6, 0.3],
                                                     np.float32)
    return density[..., None], np.clip(albedo, 0, 1), emission


def smoke_scene(res: int = 64, resx: int = 128, resy: int = 128,
                n_sensors: int = 26, density_scale: float = 20.0,
                majorant_factor: int = 8, seed: int = 0,
                envmap: Optional[np.ndarray] = None) -> SceneBundle:
    """Synthetic stand-in for the paper's production scenes (janga-smoke
    etc., scene_config.py:95-121): heterogeneous plume in a 2x cube with an
    orbit of sensors and an envmap (procedural sky if none given)."""
    sigma, albedo, emission = procedural_smoke_grids(res, seed)
    params = MediumParams(sigma_t=jnp.asarray(sigma),
                          albedo=jnp.asarray(albedo),
                          emission=jnp.asarray(emission))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] *= 2.0
    T[:3, 3] = [-1.0, -1.0, -1.0]
    if envmap is None:
        envmap = procedural_sky(64, 128)
    cams = orbit_cameras(n_sensors, radius=4.5, target=(0.0, 0.0, 0.0),
                         elevation_deg=15.0, fov_x_deg=40.0,
                         resx=resx, resy=resy)
    start = MediumParams(
        sigma_t=jnp.full_like(params.sigma_t, 0.04 / density_scale),
        albedo=jnp.full_like(params.albedo, 0.6),
        emission=jnp.full_like(params.emission, 0.1 / density_scale),
    )
    return SceneBundle(
        params=params,
        medium_cfg=MediumConfig(majorant_factor=majorant_factor,
                                scale=density_scale),
        emitter=make_envmap(envmap),
        cameras=cams,
        to_world=T,
        film_size=(resx, resy),
        start_from=start,
    )


def scene_from_files(sigma_vol: str, albedo_vol: str, emission_vol: str,
                     envmap_exr: Optional[str] = None,
                     resx: int = 720, resy: int = 620, n_sensors: int = 64,
                     density_scale: float = 1.0, majorant_factor: int = 8,
                     to_world: Optional[np.ndarray] = None) -> SceneBundle:
    """Load a scene from Mitsuba-format assets — the paper's published
    ``.vol`` volumes + HDR/EXR environment maps (reference scenes use
    ``medium_filename``/``envmap_filename`` XML vars,
    scene_config.py:99-113). This is the interop path for running the
    original reconstructions once the assets are downloaded."""
    from ..core.exr_io import read_exr
    from ..core.vol_io import read_vol

    sigma, bbox = read_vol(sigma_vol)
    albedo, _ = read_vol(albedo_vol)
    emission, _ = read_vol(emission_vol)
    if albedo.shape[-1] == 1:
        albedo = np.repeat(albedo, 3, axis=-1)
    if emission.shape[-1] == 1:
        emission = np.repeat(emission, 3, axis=-1)
    params = MediumParams(sigma_t=jnp.asarray(sigma),
                          albedo=jnp.asarray(albedo),
                          emission=jnp.asarray(emission))
    if to_world is None:
        # map the .vol bbox onto the world
        T = np.eye(4, dtype=np.float32)
        T[0, 0] = bbox[3] - bbox[0]
        T[1, 1] = bbox[4] - bbox[1]
        T[2, 2] = bbox[5] - bbox[2]
        T[:3, 3] = bbox[:3]
        to_world = T
    emitter = (make_envmap(read_exr(envmap_exr)) if envmap_exr
               else ConstantEmitter(radiance=jnp.ones(3)))
    center = to_world[:3, 3] + 0.5 * np.diag(to_world[:3, :3])
    radius = 2.2 * float(np.abs(np.diag(to_world[:3, :3])).max())
    cams = orbit_cameras(n_sensors, radius=radius, target=tuple(center),
                         elevation_deg=15.0, fov_x_deg=40.0,
                         resx=resx, resy=resy)
    start = MediumParams(
        sigma_t=jnp.full_like(params.sigma_t, 0.04 / density_scale),
        albedo=jnp.full_like(params.albedo, 0.6),
        emission=jnp.full_like(params.emission, 0.1 / density_scale),
    )
    return SceneBundle(
        params=params,
        medium_cfg=MediumConfig(majorant_factor=majorant_factor,
                                scale=density_scale),
        emitter=emitter, cameras=cams, to_world=np.asarray(to_world),
        film_size=(resx, resy), start_from=start,
    )


def procedural_sky(h: int = 64, w: int = 128) -> np.ndarray:
    """Simple analytic sky + sun HDR environment."""
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    uu, vv = np.meshgrid(u, v)
    horizon = np.exp(-8.0 * np.square(vv - 0.55))
    zenith = np.clip(1.0 - vv * 1.4, 0, 1)
    sky = np.stack([0.25 + 0.3 * horizon + 0.2 * zenith,
                    0.35 + 0.3 * horizon + 0.3 * zenith,
                    0.6 + 0.25 * horizon + 0.4 * zenith], axis=-1)
    sun = 60.0 * np.exp(-((uu - 0.3) ** 2 + (vv - 0.3) ** 2) / 0.002)
    sky += sun[..., None] * np.array([1.0, 0.9, 0.7])
    return sky.astype(np.float32)
