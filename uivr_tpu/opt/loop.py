"""The inverse-rendering optimization loop (reference: python/optimize.py).

Orchestration is host-side Python; every hot step (render fwd + adjoint +
Adam + projection) is one jitted, optionally mesh-sharded XLA program.
Feature parity with ``run_optimization`` (optimize.py:275-365):

- reference-image rendering with multi-pass spp splitting + disk cache
- batched ray-centric rendering across all sensors + ref-pixel gather
- TEA-derived per-iteration seeds (optimize.py:327-328)
- LR schedule + per-key LR factors
- multires upsampling at fractional milestones w/ optimizer-state reset and
  majorant-factor readjustment (handled inside finalize_medium)
- parameter projection to valid ranges
- checkpointing (.vol grids + numpy) and preview renders
- metrics logging (loss/PSNR/rays-per-second) — an addition over the
  reference, which only wrote images (SURVEY.md §5)
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from os.path import join
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.scenes import SceneBundle
from ..core import exr_io, vol_io
from ..core.rng import sample_tea_32
from ..render.batched import (RenderSettings, make_render, render_image,
                              sample_batch_pixels)
from ..scene.medium import MediumParams
from ..utils.cache import gallery
from . import losses as losses_mod
from .checkpoint import load_state, save_state
from .optimizer import adam_init, adam_step, reset_state_like, sgd_step
from .schedule import (Schedule, enforce_valid_params, initial_resolution,
                       learning_rates, upsample_iterations, upsample_params)


@dataclass
class OptimizationConfig:
    """Mirror of the reference OptimizationConfig (opt_config.py:11-75)."""
    name: str = "opt"
    spp: int = 16                  # adjoint spp
    n_iter: int = 6000
    lr: float = 5e-3
    primal_spp_factor: int = 64
    batch_size: int = 32768
    lr_schedule: Schedule = Schedule.Constant
    upsample: Optional[List[float]] = None
    base_seed: int = 988378
    preview_stride: int = 100
    checkpoint_stride: int = 1000
    checkpoint_initial: bool = True
    checkpoint_final: bool = True
    render_initial: bool = True
    render_final: bool = True
    preview_spp: Optional[int] = None
    opt_type: str = "adam"
    loss: Callable = staticmethod(losses_mod.l1)
    lr_factors: Dict[str, float] = field(
        default_factory=lambda: {"albedo": 2.0})
    # Device-resident inner loop: scan up to this many iterations inside ONE
    # jitted program between host events (upsample / LR change / checkpoint
    # / preview).  0 = host loop (one dispatch per iteration).  On the TPU
    # relay, per-dispatch latency is large and host-loop timing is
    # unreliable, so production presets enable this; seeds/pixel draws are
    # identical to the host loop either way.
    scan_stride: int = 0

    def __post_init__(self):
        self.upsample_at = upsample_iterations(self.upsample, self.n_iter)


def render_references(bundle: SceneBundle, settings: RenderSettings,
                      out_dir: str, spp: int = 512,
                      sensors: Optional[List[int]] = None,
                      overwrite: bool = False) -> np.ndarray:
    """Render (or load cached) reference images for all sensors using the
    ground-truth grids (reference render_reference_image /
    get_reference_image_paths, optimize.py:24-71)."""
    os.makedirs(out_dir, exist_ok=True)
    n = bundle.cameras.n_sensors
    sensors = sensors if sensors is not None else list(range(n))
    # sidecar records the spp the cached EXRs were rendered at: a resumed
    # output dir silently reusing lower-spp references would misattribute
    # reference noise to the estimator (filenames stay spp-less so existing
    # runs keep their caches)
    meta_path = join(out_dir, "_refspp.json")
    meta = {}
    if os.path.isfile(meta_path):
        try:
            meta = json.load(open(meta_path))
        except (OSError, ValueError):
            meta = {}
    cached_spp = meta.get("spp")
    partial = bool(meta.get("partial"))
    done = set(meta.get("done", []))
    # LOWER-spp (or unknown-provenance) caches re-render: silently reusing
    # them would feed reference noise into the reconstruction (advisor r3;
    # the reference renders at 8192 spp, scene_config.py:24).  A refresh is
    # RESUMABLE across process restarts: the sidecar records the target spp
    # with a `partial` marker and the per-frame `done` list, so a relay
    # crash mid-refresh costs only the frame in flight, never the pass.
    if cached_spp == spp and partial:
        print(f"[refs] resuming partial spp={spp} refresh in {out_dir}: "
              f"{len(done)}/{len(sensors)} frames done")
    elif cached_spp is None or cached_spp < spp or partial:
        if any(os.path.isfile(join(out_dir, f"ref_{s:06d}.exr"))
               for s in sensors):
            print(f"[refs] cache in {out_dir} is spp={cached_spp}"
                  f"{' (partial)' if partial else ''}, run requests "
                  f"spp={spp}: re-rendering all references")
        done = set()
    elif cached_spp > spp:
        print(f"[refs] reusing cached references at spp={cached_spp} "
              f">= requested {spp}")
        spp = cached_spp
        done = set(sensors)
    else:                                   # complete cache at this spp
        done = set(sensors)
    if overwrite:
        done = set()
    W, H = bundle.film_size
    out = np.zeros((n, H, W, 3), np.float32)
    fresh = [s for s in sensors if s not in done]
    for s in sensors:
        fname = join(out_dir, f"ref_{s:06d}.exr")
        if s in done and os.path.isfile(fname):
            out[s] = exr_io.read_exr(fname)
        else:
            img = render_image(settings, bundle.params, bundle.emitter,
                               bundle.cameras, s, seed=1234, spp=spp,
                               medium_to_world=bundle.to_world)
            exr_io.write_exr(fname, img)
            out[s] = img
            if fresh:                       # refresh in progress: checkpoint
                done.add(s)
                with open(meta_path, "w") as f:
                    json.dump({"spp": spp, "partial": True,
                               "done": sorted(done)}, f)
    with open(meta_path, "w") as f:
        json.dump({"spp": spp}, f)
    return out


def load_references(ref_dir: str, bundle: SceneBundle,
                    sensors: Optional[List[int]] = None) -> np.ndarray:
    """Load externally produced reference EXRs (reference
    get_reference_image_paths + mi.Bitmap loading, optimize.py:56-71):
    ``ref_dir`` holds one ``ref_%06d.exr`` per calibrated sensor — this is
    how surface-scene experiments (astronaut/rover/tree-2, whose reference
    images come from a `path` integrator over surface geometry the volume
    tracer is out of scope for) are driven from precomputed references.
    Validates film size and sensor coverage loudly."""
    n = bundle.cameras.n_sensors
    sensors = sensors if sensors is not None else list(range(n))
    W, H = bundle.film_size
    out = np.zeros((n, H, W, 3), np.float32)
    missing = []
    for s in sensors:
        fname = join(ref_dir, f"ref_{s:06d}.exr")
        if not os.path.isfile(fname):
            missing.append(s)
            continue
        img = exr_io.read_exr(fname)
        if img.shape != (H, W, 3):
            raise ValueError(
                f"{fname}: reference image is {img.shape}, scene film is "
                f"{(H, W, 3)} — --references must match the film size")
    # second pass only after validation so a partial dir fails atomically
    if missing:
        raise FileNotFoundError(
            f"--references {ref_dir}: missing ref images for sensors "
            f"{missing} (need ref_%06d.exr for every calibrated sensor)")
    for s in sensors:
        out[s] = exr_io.read_exr(join(ref_dir, f"ref_{s:06d}.exr"))
    return out


def gather_ref_values(ref_images: jnp.ndarray, sensor_idx: jnp.ndarray,
                      pixels: jnp.ndarray) -> jnp.ndarray:
    """Gather reference pixel values for a batch (reference
    gather_ref_values, optimize.py:90-107). ref_images: (S, H, W, 3)."""
    return ref_images[sensor_idx, pixels[:, 1], pixels[:, 0]]


def save_checkpoint(out_dir: str, params: MediumParams, prefix: str) -> None:
    """Write grids as Mitsuba-compatible .vol files (reference save_params,
    util.py:55-71)."""
    os.makedirs(out_dir, exist_ok=True)
    for key in ("sigma_t", "albedo", "emission"):
        vol_io.write_vol(join(out_dir, f"{prefix}-medium1_{key}.vol"),
                         np.asarray(getattr(params, key)))


def load_checkpoint(out_dir: str, prefix: str) -> MediumParams:
    vals = {}
    for key in ("sigma_t", "albedo", "emission"):
        data, _ = vol_io.read_vol(join(out_dir, f"{prefix}-medium1_{key}.vol"))
        vals[key] = jnp.asarray(data)
    return MediumParams(**vals)


def run_optimization(output_dir: str, opt: OptimizationConfig,
                     bundle: SceneBundle, int_cfg, ref_images=None,
                     ref_spp: int = 512, mesh=None,
                     start_params: Optional[MediumParams] = None,
                     resume: bool = True,
                     verbose: bool = True) -> MediumParams:
    """Main optimization loop. Returns the optimized grids.

    With ``resume=True`` (default), a full-state checkpoint
    (params + Adam moments + iteration; opt/checkpoint.py) is written at
    every checkpoint stride and the run continues from it if present — a
    capability the reference lacks (its checkpoints are write-only grids,
    SURVEY.md §5)."""
    os.makedirs(output_dir, exist_ok=True)
    spp_grad = opt.spp
    spp_primal = opt.spp * opt.primal_spp_factor
    settings = RenderSettings(integrator=int_cfg, medium=bundle.medium_cfg,
                              film_size=bundle.film_size, spp=spp_primal,
                              spp_grad=spp_grad)

    # --- references
    if ref_images is None:
        ref_settings = RenderSettings(
            integrator=int_cfg, medium=bundle.medium_cfg,
            film_size=bundle.film_size, spp=ref_spp, spp_grad=ref_spp)
        ref_images = render_references(bundle, ref_settings,
                                       join(output_dir, "references"),
                                       spp=ref_spp)
    ref_images = jnp.asarray(ref_images)

    # --- init params (downscaled for upsampling schedule, optimize.py:134-166)
    params = start_params if start_params is not None else bundle.start_from
    assert params is not None, "bundle.start_from or start_params required"
    if opt.upsample_at:
        # Downscale the start grids so that the upsample schedule lands on
        # the final resolution (optimize.py:146-163); works both for
        # constant starts and warm-start grids.
        from ..core.grids import resize_trilinear
        n_up = len(opt.upsample_at)
        params = MediumParams(*[
            resize_trilinear(g, initial_resolution(g.shape, n_up)[:3])
            for g in params])

    opt_state = adam_init(params)
    start_it = 0
    state_path = join(output_dir, "state")
    if resume:
        restored = load_state(state_path)
        if restored is not None:
            params, opt_state, start_it = restored
            start_it += 1
            if verbose:
                print(f"[i] Resumed from iteration {start_it - 1}")
    step_fn = _make_step(opt, settings, bundle, mesh)

    n_sensors = bundle.cameras.n_sensors
    sensors = bundle.sensors            # calibrated subset (None = all)
    metrics_path = join(output_dir, "metrics.jsonl")
    metrics_f = open(metrics_path, "a")
    # reference SceneConfig.preview_sensors semantics (scene_config.py:63):
    # defaults to the first TRAINING sensor
    preview_sensors = list(bundle.preview_sensors
                           or (bundle.sensors[:1] if bundle.sensors else [0]))
    preview_settings = RenderSettings(
        integrator=int_cfg, medium=bundle.medium_cfg,
        film_size=bundle.film_size,
        spp=opt.preview_spp or opt.spp, spp_grad=opt.spp)

    def previews(params, tag):
        for s in preview_sensors:
            img = render_image(preview_settings, params, bundle.emitter,
                               bundle.cameras, s, seed=1234,
                               medium_to_world=bundle.to_world)
            exr_io.write_exr(join(output_dir, f"opt_{tag}_{s:04d}.exr"), img)
            ref = np.asarray(ref_images[s])
            psnr = float(losses_mod.psnr(jnp.asarray(img), jnp.asarray(ref)))
            metrics_f.write(json.dumps(
                {"preview": tag, "sensor": s, "psnr": round(psnr, 3)}) + "\n")
            metrics_f.flush()
        # grid-slice montage of the current sigma_t (reference util.gallery,
        # util.py:44-52): 9 evenly-spaced z-slices tiled 3x3
        sig = np.asarray(params.sigma_t)[..., :1]
        D = sig.shape[0]
        sl = sig[np.linspace(0, D - 1, 9).astype(int)]
        exr_io.write_exr(join(output_dir, f"opt_{tag}_sigma_gallery.exr"),
                         gallery(np.repeat(sl, 3, axis=-1), ncols=3))

    if opt.checkpoint_initial:
        save_checkpoint(join(output_dir, "params"), params, "initial")
    if opt.render_initial:
        previews(params, "init")

    t_start = time.time()
    use_scan = bool(opt.scan_stride and opt.scan_stride > 1 and mesh is None)
    if use_scan:
        chunk_fn = _make_chunk(opt, settings, bundle)
        cut_before = sorted(set(opt.upsample_at)
                            | _lr_change_iterations(opt))
        ref_dev = jnp.asarray(ref_images)

    def log_metrics(it, lv):
        rec = {"it": it, "loss": lv,
               "elapsed_s": round(time.time() - t_start, 3)}
        metrics_f.write(json.dumps(rec) + "\n")
        metrics_f.flush()
        if verbose and (it % 100 == 0):
            print(f"[{opt.name}] it {it:6d} loss {lv:.6f}")

    def post_events(it):
        """Host actions the reference performs after finishing iteration
        ``it`` (optimize.py:357-365)."""
        if opt.checkpoint_stride and it > 0 and it % opt.checkpoint_stride == 0:
            save_checkpoint(join(output_dir, "params"), params, f"{it:08d}")
            save_state(state_path, params, opt_state, it)
        if opt.preview_stride and it > 0 and it % opt.preview_stride == 0 \
                and opt.preview_stride <= opt.n_iter:
            previews(params, f"{it:08d}")

    it = start_it
    while it < opt.n_iter:
        if it in opt.upsample_at:
            params = upsample_params(params)
            opt_state = reset_state_like(params)
            if verbose:
                print(f"[i] Upsampled grids at iteration {it}: "
                      f"{tuple(params.sigma_t.shape)}")

        lr = learning_rates(opt.lr, opt.lr_schedule, it, opt.n_iter,
                            opt.lr_factors)
        if use_scan:
            end = _chunk_end(it, opt, cut_before)
            its = jnp.arange(it, end, dtype=jnp.uint32)
            params, opt_state, ls = chunk_fn(params, opt_state, ref_dev,
                                             its, lr)
            ls = np.asarray(ls)
            for j, it2 in enumerate(range(it, end)):
                if (it2 % 10) == 0 or it2 == opt.n_iter - 1:
                    log_metrics(it2, float(ls[j]))
            it2 = end - 1
            post_events(it2)
            it = end
        else:
            seed, _ = sample_tea_32(2 * it + 0, opt.base_seed)
            seed_grad, _ = sample_tea_32(2 * it + 1, opt.base_seed)
            sensor_idx, pixels = sample_batch_pixels(
                jnp.uint32(seed), n_sensors, bundle.film_size,
                opt.batch_size, sensors=sensors)
            ref = gather_ref_values(ref_images, sensor_idx, pixels)
            params, opt_state, loss_val = step_fn(
                params, opt_state, bundle.emitter, bundle.cameras,
                sensor_idx, pixels, ref, jnp.uint32(seed),
                jnp.uint32(seed_grad), lr)
            if (it % 10) == 0 or it == opt.n_iter - 1:
                log_metrics(it, float(loss_val))
            post_events(it)
            it += 1

    if opt.checkpoint_final:
        save_checkpoint(join(output_dir, "params"), params, "final")
    if opt.render_final:
        previews(params, "final")
    metrics_f.close()
    return params


def _make_step(opt: OptimizationConfig, settings: RenderSettings,
               bundle: SceneBundle, mesh):
    """One jitted optimization step (optionally mesh-sharded)."""
    render = make_render(settings, bundle.to_world)
    loss_fn = opt.loss
    max_density = bundle.max_density

    if mesh is not None:
        from ..parallel import sharded_loss_and_grad
        vag = sharded_loss_and_grad(mesh, render, loss_fn)
    else:
        def vag(params, emitter, cameras, sensor_idx, pixels, ref, seed,
                seed_grad):
            def f(p):
                img = render(p, emitter, cameras, sensor_idx, pixels, seed,
                             seed_grad)
                return loss_fn(img, ref)
            return jax.value_and_grad(f)(params)

    opt_step = adam_step if opt.opt_type == "adam" else sgd_step

    @jax.jit
    def step(params, opt_state, emitter, cameras, sensor_idx, pixels, ref,
             seed, seed_grad, lr):
        loss_val, grads = vag(params, emitter, cameras, sensor_idx, pixels,
                              ref, seed, seed_grad)
        params, opt_state = opt_step(params, grads, opt_state, lr)
        params = enforce_valid_params(params, max_density)
        return params, opt_state, loss_val

    return step


def _lr_change_iterations(opt: OptimizationConfig) -> set:
    """Iterations where the LR schedule factor changes (chunk boundaries —
    LR is passed to the scanned chunk as a constant)."""
    from .schedule import schedule_factor
    out = set()
    prev = schedule_factor(opt.lr_schedule, 0, opt.n_iter)
    for it in range(1, opt.n_iter):
        f = schedule_factor(opt.lr_schedule, it, opt.n_iter)
        if f != prev:
            out.add(it)
            prev = f
    return out


def _next_post_event(pos: int, stride: Optional[int]) -> int:
    """Smallest iteration e >= pos with (e > 0 and e % stride == 0)."""
    if not stride:
        return 1 << 60
    e = ((pos + stride - 1) // stride) * stride
    return e if e > 0 else stride


def _chunk_end(pos: int, opt: OptimizationConfig, cut_before) -> int:
    """End (exclusive) of the scanned chunk starting at ``pos``: stop
    BEFORE upsample/LR-change iterations and right AFTER checkpoint/preview
    iterations, never exceeding scan_stride iterations."""
    end = min(pos + opt.scan_stride, opt.n_iter)
    for u in cut_before:
        if pos < u < end:
            end = u
            break
    e = _next_post_event(pos, opt.checkpoint_stride)
    end = min(end, e + 1)
    if opt.preview_stride and opt.preview_stride <= opt.n_iter:
        e = _next_post_event(pos, opt.preview_stride)
        end = min(end, e + 1)
    return end


def _make_chunk(opt: OptimizationConfig, settings: RenderSettings,
                bundle: SceneBundle):
    """Jitted device-resident chunk: lax.scan of whole optimization steps
    (seed derivation, pixel sampling, ref gather, render fwd+adjoint, Adam,
    projection) — one dispatch per chunk.  Seeds and pixel draws are
    bit-identical to the host loop (_make_step path)."""
    render = make_render(settings, bundle.to_world)
    loss_fn = opt.loss
    max_density = bundle.max_density
    opt_step = adam_step if opt.opt_type == "adam" else sgd_step
    n_sensors = bundle.cameras.n_sensors
    sensors = bundle.sensors
    base_seed = jnp.uint32(opt.base_seed)

    @jax.jit
    def run_chunk(params, opt_state, ref_images, its, lr):
        def body(carry, it):
            params, opt_state = carry
            seed, _ = sample_tea_32(jnp.uint32(2) * it, base_seed)
            seed_grad, _ = sample_tea_32(jnp.uint32(2) * it + jnp.uint32(1),
                                         base_seed)
            sensor_idx, pixels = sample_batch_pixels(
                seed, n_sensors, bundle.film_size, opt.batch_size,
                sensors=sensors)
            ref = gather_ref_values(ref_images, sensor_idx, pixels)

            def f(p):
                img = render(p, bundle.emitter, bundle.cameras, sensor_idx,
                             pixels, seed, seed_grad)
                return loss_fn(img, ref)

            loss_val, grads = jax.value_and_grad(f)(params)
            params, opt_state = opt_step(params, grads, opt_state, lr)
            params = enforce_valid_params(params, max_density)
            return (params, opt_state), loss_val

        (params, opt_state), ls = jax.lax.scan(body, (params, opt_state),
                                               its)
        return params, opt_state, ls

    return run_chunk
