"""Ray-centric batched differentiable rendering with a custom VJP.

TPU-native re-design of the reference's ``_BatchedRenderOp``/``render_batch``
(reference: python/batched.py): every optimization step renders a batch of
(sensor, pixel) pairs drawn across ALL sensors, with the backward pass
re-sampling a *decorrelated* set of adjoint rays through the same pixels —
the decorrelation of primal and adjoint estimators is what keeps gradients
unbiased (batched.py:69-82,119-124).

Mapping of the reference machinery onto JAX:

- ``dr.CustomOp``            -> ``jax.custom_vjp`` over the grid params
- W x 1 hdrfilm + box filter -> per-pixel mean over the spp axis; the
  "differentiate splat/develop to get per-ray adjoint dL" step
  (batched.py:272-306) reduces analytically to dL = image_cotangent / spp
- sampler bookkeeping        -> TEA-derived seeds per purpose
  (batched.py:397-423): pixel sampler tea(seed, 5), primal subpixel sampler
  tea(seed, 22), adjoint subpixel sampler tea(seed, 39); the integrator
  stream uses ``seed`` (primal) / ``seed_grad`` (adjoint replay+backward)

Static configuration (integrator kind + flags, spp, film size) is closed
over by :func:`make_render`; the returned function is jit-compatible, and
its arguments are traced so one compilation serves the whole optimization.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rng import make_sampler, next_2d, sample_tea_32
from ..integrators import nerf as nerf_mod
from ..integrators import volpath_flat as vflat_mod
from ..integrators import volpathsimple as vps_mod
from ..integrators.nerf import NerfConfig
from ..integrators.volpathsimple import VolpathConfig
from ..scene.camera import Cameras, sample_rays
from ..scene.medium import MediumConfig, MediumParams, finalize_medium
from ..scene.scene import Emitter, Scene

IntegratorConfig = Union[NerfConfig, VolpathConfig]


def sample_batch_pixels(seed, n_sensors: int, film_size: Tuple[int, int],
                        batch_size: int, sensors=None):
    """Draw (sensor, pixel) pairs for one batch (reference
    sample_batch_pixels, batched.py:397-423). Returns
    (sensor_idx (B,) i32, pixels (B, 2) i32 with (x, y)).

    ``sensors``: optional calibrated sensor-index subset — batches draw
    uniformly from the SUBSET and return absolute sensor ids (the
    reference's scene_config.sensors indexing, optimize.py:344)."""
    if sensors is not None:
        sensors = jnp.asarray(sensors, jnp.int32)
        n_sensors = int(sensors.shape[0])
    sub_seed, _ = sample_tea_32(seed, 5)
    s = make_sampler(sub_seed, n_lanes=batch_size)
    u1, s = next_2d(s)
    sensor_idx = jnp.minimum((u1[:, 0] * n_sensors).astype(jnp.int32),
                             n_sensors - 1)
    if sensors is not None:
        sensor_idx = sensors[sensor_idx]
    u2, s = next_2d(s)
    fs = jnp.array(film_size, jnp.float32)
    pixels = jnp.minimum((u2 * fs).astype(jnp.int32),
                         jnp.array(film_size, jnp.int32) - 1)
    return sensor_idx, pixels


def _expand_rays(cameras: Cameras, sensor_idx, pixels, film_size, spp: int,
                 subpixel_seed):
    """Repeat each pixel spp times with jittered subpixel positions and
    generate camera rays (reference sample_batch_rays, batched.py:426-467)."""
    B = sensor_idx.shape[0]
    rep = jax.lax.broadcasted_iota(jnp.int32, (B * spp, 1), 0)[:, 0] // spp
    sidx = sensor_idx[rep]
    pix = pixels[rep].astype(jnp.float32)
    s = make_sampler(subpixel_seed, n_lanes=B * spp)
    offset, _ = next_2d(s)
    fs = jnp.array(film_size, jnp.float32)
    uv = (pix + offset) / fs
    o, d = sample_rays(cameras, sidx, uv)
    return o, d


@dataclass(frozen=True)
class RenderSettings:
    integrator: IntegratorConfig
    medium: MediumConfig
    film_size: Tuple[int, int]
    spp: int
    spp_grad: int
    # K-candidate event batching for the pallas engine's FORWARD pass
    # (ops/volpath_step.StepSpec.k_cand).  None = resolve the UIVR_KCAND
    # env var ONCE in make_render (captured in the closed-over static
    # config, so later env changes cannot silently desynchronize two
    # traced renders).
    k_cand: int = None
    # In-step SPP splitting (the reference's multi-pass render splitting,
    # optimize.py:24-51): when batch*spp exceeds this, the primal/adjoint
    # passes scan over spp chunks with per-chunk derived seeds, so the
    # production configuration (32768 pixels x 1024 primal spp = 33.5M
    # lanes) fits one chip's HBM.  Per-chunk seeds make the chunked render
    # a *different but identically-distributed* estimator than the
    # unchunked one (exactly like the reference's per-pass seeds).
    # Proven-good wavefront width on the axon v5e (gathers amortize by
    # ~262k and plateau by 1M; >1M-lane dispatches have crashed the TPU
    # worker — see PLAN.md production audit).  The reference's analogous
    # pass cap is 720*720*2048 rays on a 24 GB Titan RTX (optimize.py:24).
    max_rays_per_pass: int = 1024 * 1024


def _resolve_engine(cfg, scene, n: int) -> str:
    """'auto' -> pallas on accelerator backends when the scene supports the
    fused kernel (ops/volpath_step.pallas_supported), else flat; explicit
    'pallas' also degrades to flat on unsupported scenes."""
    e = getattr(cfg, "engine", None)
    if e == "auto":
        import jax
        if jax.default_backend() == "cpu":
            return "flat"
        e = "pallas"
    if e == "pallas":
        from ..ops import volpath_step as vk
        if not vk.pallas_supported(scene, n):
            return "flat"
    return e


def _dispatch_primal(cfg: IntegratorConfig, scene, o, d, seed, k_cand=None):
    """``k_cand``: None = UIVR_KCAND env default (forward pass); the PRB
    backward's detached replay MUST pass 1 so its realization matches the
    k_cand=1 adjoint walk (K-batching consumes extra discarded TEA draws,
    so k>1 and k=1 walks sample different — equally valid — paths)."""
    if isinstance(cfg, NerfConfig):
        return nerf_mod.sample_primal(cfg, scene, o, d,
                                      make_sampler(seed, n_lanes=o.shape[0]))[:2]
    engine = _resolve_engine(cfg, scene, o.shape[0])
    if engine == "pallas":
        from ..ops import volpath_step as vk
        return vk.sample_primal_pallas(cfg, scene, o, d, seed, k_cand=k_cand)
    if engine == "flat":
        return vflat_mod.sample_primal_compact(cfg, scene, o, d, seed)
    L, valid, _ = vps_mod.sample_primal(
        cfg, scene, o, d, make_sampler(seed, n_lanes=o.shape[0]))
    return L, valid


def _dispatch_adjoint(cfg: IntegratorConfig, scene, o, d, seed, dL, L):
    if isinstance(cfg, NerfConfig):
        g, _ = nerf_mod.sample_adjoint(
            cfg, scene, o, d, make_sampler(seed, n_lanes=o.shape[0]), dL, L)
        return g
    engine = _resolve_engine(cfg, scene, o.shape[0])
    if engine == "pallas":
        from ..ops import volpath_step as vk
        return vk.sample_adjoint_pallas(cfg, scene, o, d, seed, dL, L)
    if engine == "flat":
        return vflat_mod.sample_adjoint(cfg, scene, o, d, seed, dL, L,
                                        schedule=(96, None, None))
    g, _ = vps_mod.sample_adjoint(
        cfg, scene, o, d, make_sampler(seed, n_lanes=o.shape[0]), dL, L)
    return g


def make_render(settings: RenderSettings, medium_to_world: np.ndarray = None):
    """Build the differentiable batched render function:

        image (B, 3) = render(params, emitter, cameras,
                              sensor_idx (B,), pixels (B,2), seed, seed_grad)

    Differentiable w.r.t. ``params`` (the voxel grids); emitter/camera
    gradients are not propagated (matching the reference's scope —
    "TODO: envmap gradients", volpathsimple.py:283).
    """
    st = settings
    if medium_to_world is None:
        medium_to_world = np.eye(4, dtype=np.float32)
    # resolve the env default ONCE (see RenderSettings.k_cand)
    import os
    k_cand = (st.k_cand if st.k_cand is not None
              else int(os.environ.get("UIVR_KCAND", 1)))

    def _scene(params: MediumParams, emitter: Emitter, cameras: Cameras):
        return Scene(medium=finalize_medium(params, st.medium, medium_to_world),
                     emitter=emitter, cameras=cameras)

    def _spp_chunks(B: int, spp: int) -> int:
        """Largest divisor of spp keeping B*chunk <= max_rays_per_pass."""
        if B * spp <= st.max_rays_per_pass:
            return spp
        c = max(1, st.max_rays_per_pass // B)
        while spp % c:
            c -= 1
        return c

    def _primal_image(params, emitter, cameras, sensor_idx, pixels, seed):
        scene = _scene(params, emitter, cameras)
        B = sensor_idx.shape[0]
        spp_c = _spp_chunks(B, st.spp)
        if spp_c == st.spp:
            sub_seed, _ = sample_tea_32(seed, 22)
            o, d = _expand_rays(cameras, sensor_idx, pixels, st.film_size,
                                st.spp, sub_seed)
            L, valid = _dispatch_primal(st.integrator, scene, o, d, seed,
                                        k_cand=k_cand)
            return L.reshape(B, st.spp, 3).mean(axis=1)

        def body(acc, c):
            sub_seed, _ = sample_tea_32(sample_tea_32(seed, 22)[0], 1000 + c)
            seed_c, _ = sample_tea_32(seed, 7070 + c)
            o, d = _expand_rays(cameras, sensor_idx, pixels, st.film_size,
                                spp_c, sub_seed)
            L, _ = _dispatch_primal(st.integrator, scene, o, d, seed_c,
                                    k_cand=k_cand)
            return acc + L.reshape(B, spp_c, 3).mean(axis=1), None

        n_chunks = st.spp // spp_c
        acc, _ = jax.lax.scan(body, jnp.zeros((B, 3), jnp.float32),
                              jnp.arange(n_chunks, dtype=jnp.uint32))
        return acc / n_chunks

    @jax.custom_vjp
    def render(params, emitter, cameras, sensor_idx, pixels, seed, seed_grad):
        return _primal_image(params, emitter, cameras, sensor_idx, pixels, seed)

    def render_fwd(params, emitter, cameras, sensor_idx, pixels, seed, seed_grad):
        img = _primal_image(params, emitter, cameras, sensor_idx, pixels, seed)
        return img, (params, emitter, cameras, sensor_idx, pixels, seed_grad)

    def render_bwd(res, g_img):
        params, emitter, cameras, sensor_idx, pixels, seed_grad = res
        scene = _scene(params, emitter, cameras)
        B = sensor_idx.shape[0]
        spp_g = st.spp_grad

        def one_pass(spp_c, sub_seed, seed_c):
            # Decorrelated adjoint rays through the same pixels
            # (batched.py:69-75)
            o, d = _expand_rays(cameras, sensor_idx, pixels, st.film_size,
                                spp_c, sub_seed)
            # per-sample adjoint radiance: develop() is the mean over spp,
            # so the splat-differentiation step reduces to g / spp
            # (batched.py:272-306); under chunking every sample still
            # carries 1/spp_grad of the pixel cotangent
            rep = jax.lax.broadcasted_iota(
                jnp.int32, (B * spp_c, 1), 0)[:, 0] // spp_c
            dL = g_img[rep] / spp_g
            # (1) detached primal replay, (2) adjoint pass — same stream;
            # the replay engine matches the adjoint engine (PRB replays the
            # same realized paths: pallas primal + pallas adjoint share
            # bit-identical TEA sequences and arithmetic, likewise
            # flat + flat).  k_cand is pinned to 1: the adjoint walk is
            # k_cand=1, and a K-batched replay would realize different
            # paths (see _dispatch_primal).
            L, _ = _dispatch_primal(st.integrator, scene, o, d, seed_c,
                                    k_cand=1)
            return _dispatch_adjoint(st.integrator, scene, o, d, seed_c,
                                     dL, L)

        spp_c = _spp_chunks(B, spp_g)
        if spp_c == spp_g:
            sub_seed, _ = sample_tea_32(seed_grad, 39)
            grads = one_pass(spp_g, sub_seed, seed_grad)
        else:
            # in-step SPP splitting (see RenderSettings.max_rays_per_pass)
            def body(acc, c):
                sub_seed, _ = sample_tea_32(sample_tea_32(seed_grad, 39)[0],
                                            2000 + c)
                seed_c, _ = sample_tea_32(seed_grad, 9090 + c)
                g = one_pass(spp_c, sub_seed, seed_c)
                return jax.tree_util.tree_map(jnp.add, acc, g), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            n_chunks = spp_g // spp_c
            grads, _ = jax.lax.scan(body, zero,
                                    jnp.arange(n_chunks, dtype=jnp.uint32))

        zero_em = jax.tree_util.tree_map(jnp.zeros_like, emitter)
        zero_cam = jax.tree_util.tree_map(jnp.zeros_like, cameras)
        return (grads, zero_em, zero_cam, None, None, None, None)

    render.defvjp(render_fwd, render_bwd)
    return render


import functools


@functools.lru_cache(maxsize=32)
def _chunk_renderer(settings: RenderSettings, spp: int):
    """One jitted chunk renderer per (settings, spp): the sensor index and
    seed are TRACED arguments, so a single compilation serves every sensor
    of a rig and every preview iteration (62-sensor reference scenes would
    otherwise recompile per sensor — minutes each through the TPU relay)."""
    st = settings

    @jax.jit
    def run(params_, emitter, cameras, to_world, pixels, sensor_, seed_):
        sc = Scene(medium=finalize_medium(params_, st.medium, to_world),
                   emitter=emitter, cameras=cameras)
        sub_seed, _ = sample_tea_32(seed_, 22)
        sidx = jnp.full((pixels.shape[0],), sensor_, jnp.int32)
        o, d = _expand_rays(sc.cameras, sidx, pixels, st.film_size, spp,
                            sub_seed)
        L, _ = _dispatch_primal(st.integrator, sc, o, d, seed_)
        return L.reshape(pixels.shape[0], spp, 3).mean(axis=1)

    return run


def render_image(settings: RenderSettings, params: MediumParams,
                 emitter: Emitter, cameras: Cameras, sensor: int,
                 seed=0, spp: int = None, chunk: int = None,
                 medium_to_world: np.ndarray = None) -> np.ndarray:
    """Full-frame (non-differentiable) render of one sensor with multi-pass
    chunking — the reference's reference-image/preview path with its
    memory-bounded pass splitting (optimize.py:24-53, render_previews).
    Host-side loop over pixel chunks; returns (H, W, 3) numpy.

    ``chunk`` (rays per dispatch, default 2^20, UIVR_RENDER_CHUNK): the
    axon relay kills executions past ~45 s, and on dense production media
    an edge-on sensor's 1M-ray chunk can cross that line DETERMINISTICALLY
    (janga-smoke 1024-spp references, sensor 31, round 4) — every resume
    then dies at the same frame.  Lower it for such scenes."""
    import os as _os
    if chunk is None:
        chunk = int(_os.environ.get("UIVR_RENDER_CHUNK", 1 << 20))
    st = settings
    W, H = st.film_size
    spp = spp or st.spp
    if medium_to_world is None:
        medium_to_world = np.eye(4, dtype=np.float32)

    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    all_pixels = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.int32)
    n_pix = all_pixels.shape[0]
    chunk_pix = max(1, chunk // spp)
    run = _chunk_renderer(st, spp)
    to_world = jnp.asarray(medium_to_world, jnp.float32)

    out = np.zeros((n_pix, 3), np.float32)
    for i in range(0, n_pix, chunk_pix):
        pix = all_pixels[i:i + chunk_pix]
        pad = 0
        if pix.shape[0] < chunk_pix and i > 0:
            pad = chunk_pix - pix.shape[0]
            pix = np.concatenate([pix, np.zeros((pad, 2), np.int32)])
        vals = np.asarray(run(params, emitter, cameras, to_world,
                              jnp.asarray(pix), jnp.int32(sensor),
                              jnp.uint32(seed + i)))
        out[i:i + chunk_pix - pad] = vals[:pix.shape[0] - pad]
    return out.reshape(H, W, 3)
