"""Null-scattering volumetric path tracer with PRB adjoint + DRT.

TPU-native re-design of the reference's core integrator (reference:
python/integrators/volpathsimple.py).  The estimator set is preserved:

- primal: delta-tracking free flight + NEE (ratio-tracked shadow rays) with
  power-heuristic MIS against phase sampling, envmap/constant background on
  escape (volpathsimple.py:110-288)
- adjoint (path replay backpropagation):
  * in-scattering gradients, either via the biased free-flight estimator
    (1/sigma_t pdf factor, volpathsimple.py:152-171) and/or via DRT —
    transmittance-proportional distance resampling with a recursive detached
    Li estimate (volpathsimple.py:507-581), combined by MIS with weights
    sigma_t^2/(1+sigma_t^2) vs 1/(1+sigma_t^2)
  * DRT subsampling: a per-lane reservoir picks ONE path vertex, making the
    adjoint O(n) instead of O(n^2) (volpathsimple.py:93-96,248-259,730-765)
  * transmittance gradients: 4 uniform resamples of -sigma_t per traversed
    segment (volpathsimple.py:181-189,584-607)
  * NEE transmittance gradients: replayed ratio tracking with in-loop
    scatter-adds (volpathsimple.py:393-401,483-492)

Architectural difference from the reference: Dr.Jit's taped AD is replaced by
explicit cotangent algebra + trilinear scatter-adds (integrators/common.py),
and the stateful sampler fork/clone discipline becomes counter-based key
derivation (core/rng.py).  The primal and adjoint passes consume identical
draw counts from the primary stream — the PRB correctness invariant.

Wavefront state is a SoA pytree advanced by ``lax.while_loop``; the loop is
in *local* medium coordinates (directions unnormalized so ray params match
world units).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import aabb
from ..core.rng import Sampler, clone, fork, next_1d, next_2d
from ..scene.medium import albedo_at, sigma_t_at
from ..scene.phase import phase_eval, phase_sample
from ..scene.scene import Scene
from ..tracking import drt_distance, free_flight, transmittance
from .common import (finalize_accum, init_accum, mis_weight,
                     scatter_albedo, scatter_sigma)


@dataclass(frozen=True)
class VolpathConfig:
    max_depth: int = 64
    rr_depth: int = 1064          # > max_depth: RR disabled (opt_config.py:106)
    use_nee: bool = True
    use_drt: bool = True
    use_drt_subsampling: bool = True
    use_drt_mis: bool = True
    hide_emitters: bool = False
    max_steps: int = 4096         # tracking-loop trip bound
    trans_grad_samples: int = 4   # volpathsimple.py:584 n_samples
    # Russian roulette on shadow-walk transmittance (flat + pallas engines;
    # beyond the reference): once a walk's Tr falls below this threshold it
    # survives with probability Tr/threshold (Tr reset to the threshold) or
    # dies (Tr = 0).  Unbiased in value AND gradient: the survival q is
    # treated as detached, so E_u[1{u<q} C/q] = C pointwise and the replay
    # cotangent (-1/sigma_n per null collision) is unchanged; the decision
    # reuses the shadow-lane u_evt draw, so TEA streams and the REPLAY
    # counter arithmetic are untouched.  0 disables (reference semantics).
    shadow_rr: float = 0.0
    # 'auto'   = pallas on TPU backends when the scene supports it, else flat
    # 'pallas' = fused Pallas step kernel (ops/volpath_step.py)
    # 'flat'   = single fused XLA state-machine loop (volpath_flat.py)
    # 'nested' = reference-structured loops (reference semantics baseline)
    engine: str = "auto"


class PathState(NamedTuple):
    """Resumable mid-path state for recursive detached rays (reference
    PathState, volpathsimple.py:660-707). All in local frame."""
    active: jnp.ndarray    # (n,)
    depth: jnp.ndarray     # (n,) i32
    o_l: jnp.ndarray       # (n,3) current position
    d_l: jnp.ndarray       # (n,3) local direction
    d_w: jnp.ndarray       # (n,3) world direction
    maxt: jnp.ndarray      # (n,) distance to medium exit
    last_pdf: jnp.ndarray  # (n,) pdf of last scatter direction (for MIS)


def _exit_dist(o_l, d_l):
    """Distance to the unit-cube exit from a point inside (or on) it."""
    _, tf, _ = aabb.ray_unit_cube(o_l, d_l, 0.0, aabb.INF)
    return tf


def _nee_primal(cfg: VolpathConfig, scene: Scene, p, d_w, throughput,
                sampler: Sampler, active_e):
    """Primal NEE estimate from points ``p`` (local) with incident world
    direction d_w. Returns (contrib (n,3), shadow info for replay, sampler)."""
    m = scene.medium
    u2, sampler = next_2d(sampler)
    ds_d, ds_pdf, em_weight = scene.emitter.sample_direction(u2)
    ok = ds_pdf > 0.0
    active_e = active_e & ok
    dln = aabb.transform_dirs(m.world_to_local, ds_d)
    tmax = _exit_dist(p, dln)
    tr, sampler = transmittance(m, p, dln, tmax, sampler, active_e,
                                max_steps=cfg.max_steps)
    ph = phase_eval(m.phase_g, d_w, ds_d)
    w = mis_weight(ds_pdf, ph)
    contrib = throughput * (ph * w * tr)[:, None] * em_weight
    contrib = jnp.where(active_e[:, None], contrib, 0.0)
    return contrib, (dln, tmax, active_e), sampler


def _nee_adjoint_replay(cfg: VolpathConfig, scene: Scene, p, shadow_info,
                        nee_sampler: Sampler, adjoint, grads):
    """Replay the shadow-ray transmittance with adjoint scatter-adds
    (reference volpathsimple.py:393-401). ``nee_sampler`` must be a clone
    taken BEFORE the primal NEE consumed its draws."""
    m = scene.medium
    dln, tmax, active_e = shadow_info
    # consume the direction draw identically to the primal call
    _, nee_sampler = next_2d(nee_sampler)
    _, _, grads = transmittance(m, p, dln, tmax, nee_sampler, active_e,
                                max_steps=cfg.max_steps, adjoint=adjoint,
                                accum=grads)
    return grads


# --------------------------------------------------------------------------
# Primal
# --------------------------------------------------------------------------

def _fresh_state(scene: Scene, o: jnp.ndarray, d: jnp.ndarray
                 ) -> Tuple[PathState, jnp.ndarray]:
    """reach_medium (reference volpathsimple.py:292-319): intersect the
    medium bbox; rays that miss escape directly."""
    m = scene.medium
    ol = aabb.transform_points(m.world_to_local, o)
    dl = aabb.transform_dirs(m.world_to_local, d)
    tn, tf, hit = aabb.ray_unit_cube(ol, dl, 0.0, aabb.INF)
    active = hit & (tf > tn)
    escaped = ~active
    entry = ol + tn[:, None] * dl
    # carry initializers derived from inputs: keeps while_loop carry types
    # consistent ("varying") under shard_map manual sharding
    state = PathState(
        active=active,
        depth=(tn * 0).astype(jnp.int32),
        o_l=entry, d_l=dl, d_w=d,
        maxt=jnp.where(active, tf - tn, 0.0),
        last_pdf=tn * 0 + 1.0,
    )
    return state, escaped


class _PrimalCarry(NamedTuple):
    st: PathState
    escaped: jnp.ndarray
    throughput: jnp.ndarray
    result: jnp.ndarray
    has_scattered: jnp.ndarray
    sampler: Sampler


def _primal_loop(cfg: VolpathConfig, scene: Scene, carry: _PrimalCarry
                 ) -> _PrimalCarry:
    m = scene.medium

    def cond(c):
        return jnp.any(c.st.active)

    def body(c: _PrimalCarry) -> _PrimalCarry:
        st, escaped, throughput, result, has_scattered, sampler = c
        active = st.active

        # Russian roulette (disabled by default via rr_depth)
        q = jnp.minimum(jnp.max(throughput, axis=-1), 0.99)
        u_rr, sampler = next_1d(sampler)
        perform_rr = st.depth > cfg.rr_depth
        alive = jnp.any(throughput != 0.0, axis=-1)
        active = active & alive & ((~perform_rr) | (u_rr < q))
        throughput = jnp.where(perform_rr[:, None],
                               throughput / jnp.maximum(q, 1e-8)[:, None],
                               throughput)

        # Free-flight sampling to the next real collision
        t_coll, found, sampler = free_flight(
            m, st.o_l, st.d_l, st.maxt, sampler, active,
            max_steps=cfg.max_steps)
        did_escape = active & (~found)
        did_scatter = active & found
        t_safe = jnp.where(found, t_coll, 0.0)
        p = st.o_l + t_safe[:, None] * st.d_l

        alb = jnp.where(did_scatter[:, None], albedo_at(m, p), 1.0)
        throughput = throughput * alb

        depth = jnp.where(did_scatter, st.depth + 1, st.depth)
        active = did_scatter & (depth < cfg.max_depth)
        has_scattered = has_scattered | did_scatter

        # NEE at the collision vertex
        if cfg.use_nee:
            active_e = did_scatter & active
            contrib, _, sampler = _nee_primal(
                cfg, scene, p, st.d_w, throughput, sampler, active_e)
            result = result + contrib

        # Phase sampling for the next direction
        u1, sampler = next_1d(sampler)
        u2, sampler = next_2d(sampler)
        wo, ph_pdf = phase_sample(m.phase_g, st.d_w, u1, u2[:, 1])
        d_w = jnp.where(did_scatter[:, None], wo, st.d_w)
        d_l = jnp.where(did_scatter[:, None],
                        aabb.transform_dirs(m.world_to_local, wo), st.d_l)
        o_l = jnp.where(did_scatter[:, None], p, st.o_l)
        last_pdf = jnp.where(did_scatter, ph_pdf, st.last_pdf)

        # New segment bound to the medium exit; kill numerically-degenerate
        # boundary cases ("accidental escape", volpathsimple.py:238-241).
        tf = _exit_dist(o_l, d_l)
        maxt = jnp.where(did_scatter, tf, st.maxt)
        active = active & ~(did_scatter & (tf <= 1e-7))

        escaped = escaped | did_escape
        st = PathState(active=active, depth=depth, o_l=o_l, d_l=d_l,
                       d_w=d_w, maxt=maxt, last_pdf=last_pdf)
        return _PrimalCarry(st, escaped, throughput, result,
                            has_scattered, sampler)

    return jax.lax.while_loop(cond, body, carry)


def _finish_primal(cfg: VolpathConfig, scene: Scene, c: _PrimalCarry):
    """Envmap contribution for escaped rays with NEE MIS
    (volpathsimple.py:262-288)."""
    active_e = c.escaped
    if cfg.hide_emitters:
        active_e = active_e & ~(c.st.depth <= 0)
    if cfg.use_nee:
        epdf = scene.emitter.pdf_direction(c.st.d_w)
        epdf = jnp.where(c.has_scattered, epdf, 0.0)
        w = mis_weight(c.st.last_pdf, epdf)
    else:
        w = 1.0
    contrib = c.throughput * (w if isinstance(w, float) else w[:, None]) \
        * scene.emitter.eval(c.st.d_w)
    return c.result + jnp.where(active_e[:, None], contrib, 0.0)


def sample_primal(cfg: VolpathConfig, scene: Scene, o: jnp.ndarray,
                  d: jnp.ndarray, sampler: Sampler,
                  path_state: Optional[PathState] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, Sampler]:
    """Primal radiance estimate. With ``path_state``, resumes a detached
    mid-path ray (recursive DRT Li estimation, volpathsimple.py:60-67)."""
    if path_state is None:
        _, sampler = next_1d(sampler)        # channel draw (parity with ref)
        st, escaped = _fresh_state(scene, o, d)
        has_scattered = jnp.logical_and(st.active, False)
    else:
        st = path_state
        escaped = jnp.logical_and(st.active, False)
        has_scattered = jnp.asarray(st.active)
    _, sampler = next_1d(sampler)            # alt-seed draw (parity)

    zero3 = st.o_l * 0.0
    carry = _PrimalCarry(
        st=st, escaped=escaped,
        throughput=zero3 + 1.0,
        result=zero3,
        has_scattered=has_scattered, sampler=sampler)
    carry = _primal_loop(cfg, scene, carry)
    result = _finish_primal(cfg, scene, carry)
    valid = carry.escaped
    return result, valid, carry.sampler


# --------------------------------------------------------------------------
# Adjoint (path replay backpropagation)
# --------------------------------------------------------------------------

class _Reservoir(NamedTuple):
    """Per-lane reservoir over path vertices for DRT subsampling
    (reference DRTReservoir, volpathsimple.py:730-765)."""
    wsum: jnp.ndarray       # (n,3)
    cur_w: jnp.ndarray      # (n,3)
    depth: jnp.ndarray      # (n,) i32
    o_l: jnp.ndarray        # (n,3) segment origin
    d_l: jnp.ndarray        # (n,3)
    d_w: jnp.ndarray        # (n,3)
    maxt: jnp.ndarray       # (n,)
    active: jnp.ndarray     # (n,)


def _reservoir_init(ref3: jnp.ndarray) -> _Reservoir:
    """``ref3``: any (n,3) input-derived array (for shard_map carry typing)."""
    z3 = ref3 * 0.0
    z1 = z3[:, 0]
    return _Reservoir(wsum=z3, cur_w=z3,
                      depth=z1.astype(jnp.int32) - 1,
                      o_l=z3, d_l=z3, d_w=z3, maxt=z1,
                      active=z1 > 1.0)


def _reservoir_update(r: _Reservoir, weight, u, active, depth, o_l, d_l, d_w,
                      maxt) -> _Reservoir:
    w = jnp.where(active[:, None], weight, 0.0)
    wsum = r.wsum + w
    ratio = jnp.mean(jnp.where(wsum > 0, w / jnp.maximum(wsum, 1e-30), 0.0),
                     axis=-1)
    change = active & (u <= ratio)
    sel = change[:, None]
    return _Reservoir(
        wsum=wsum,
        cur_w=jnp.where(sel, w, r.cur_w),
        depth=jnp.where(change, depth, r.depth),
        o_l=jnp.where(sel, o_l, r.o_l),
        d_l=jnp.where(sel, d_l, r.d_l),
        d_w=jnp.where(sel, d_w, r.d_w),
        maxt=jnp.where(change, maxt, r.maxt),
        active=r.active | change,
    )


def _reservoir_get(r: _Reservoir):
    """Returns (state..., sampling_weight (n,3)) à la volpathsimple.py:756-760."""
    d = jnp.mean(r.cur_w, axis=-1)
    w = jnp.where((d > 0)[:, None],
                  jnp.mean(r.wsum, axis=-1)[:, None] * r.cur_w
                  / jnp.maximum(d, 1e-30)[:, None], 0.0)
    return w


def _drt_backward(cfg: VolpathConfig, scene: Scene, alt: Sampler,
                  o_l, d_l, d_w, maxt, depth, adjoint, active, grads):
    """In-scattering gradient via Differential Ratio Tracking (reference
    backpropagate_scattering_drt, volpathsimple.py:507-581): resample a
    distance proportional to transmittance, estimate incident radiance with a
    recursive detached path, scatter the sigma_t/albedo cotangents."""
    m = scene.medium

    t_sub, w_drt, found, alt = drt_distance(
        m, o_l, d_l, maxt, alt, active, max_steps=cfg.max_steps)
    active = active & found
    t_safe = jnp.where(found, t_sub, 0.0)
    p = o_l + t_safe[:, None] * d_l

    # Detached incident-radiance estimate Li (sample_recursive,
    # volpathsimple.py:610-655): NEE at p + phase-sampled recursive path.
    Li = jnp.zeros_like(adjoint)
    if cfg.use_nee:
        nee, _, alt = _nee_primal(cfg, scene, p, d_w,
                                  jnp.ones_like(adjoint), alt, active)
        Li = Li + nee
    u1, alt = next_1d(alt)
    u2, alt = next_2d(alt)
    wo, ph_pdf = phase_sample(m.phase_g, d_w, u1, u2[:, 1])
    rec_dl = aabb.transform_dirs(m.world_to_local, wo)
    rec_maxt = _exit_dist(p, rec_dl)
    next_depth = jnp.where(active, depth + 1, depth)
    ps = PathState(
        active=active & (next_depth < cfg.max_depth) & (rec_maxt > 1e-7),
        depth=next_depth, o_l=p, d_l=rec_dl, d_w=wo, maxt=rec_maxt,
        last_pdf=jnp.where(active, ph_pdf, 1.0))
    rec_Li, _, alt = sample_primal(cfg, scene, None, None, alt, path_state=ps)
    Li = Li + rec_Li

    sig = sigma_t_at(m, p)
    if cfg.use_drt_mis:
        w_mis = 1.0 / (1.0 + sig * sig)
    else:
        w_mis = jnp.ones_like(sig)

    alb = albedo_at(m, p)
    factor = (w_mis * w_drt)[:, None] * adjoint * Li      # (n,3), detached
    cot_sig = jnp.sum(factor * alb, axis=-1)
    cot_alb = factor * sig[:, None]
    grads = scatter_sigma(grads, m, p, cot_sig, active)
    grads = scatter_albedo(grads, m, p, cot_alb, active)
    return grads, alt


class _AdjointCarry(NamedTuple):
    st: PathState
    escaped: jnp.ndarray
    throughput: jnp.ndarray
    result: jnp.ndarray
    has_scattered: jnp.ndarray
    sampler: Sampler
    alt: Sampler
    res: _Reservoir
    grads: object  # GradAccum pytree


def sample_adjoint(cfg: VolpathConfig, scene: Scene, o: jnp.ndarray,
                   d: jnp.ndarray, sampler: Sampler, dL: jnp.ndarray,
                   state_in: jnp.ndarray, grads=None):
    """Adjoint pass: accumulate dloss/dgrids given per-ray adjoint radiance
    ``dL`` and the detached primal radiance ``state_in`` (PRB).

    ``sampler`` must replay the primal's stream (same seed).  Returns the
    grads pytree and the advanced sampler.
    """
    m = scene.medium

    _, sampler = next_1d(sampler)            # channel draw (parity)
    st, escaped = _fresh_state(scene, o, d)
    _, sampler = next_1d(sampler)            # alt-seed draw (parity)
    alt = fork(sampler, 0x9E3779B9)

    zero3 = st.o_l * 0.0
    # accumulators become shard-local partials under shard_map; mark varying
    if grads is None:
        grads = init_accum(m, vary=jnp.sum(zero3[:, 0]), need_emission=False)
    carry = _AdjointCarry(
        st=st, escaped=escaped,
        throughput=zero3 + 1.0,
        result=jnp.asarray(state_in),
        has_scattered=jnp.logical_and(st.active, False),
        sampler=sampler, alt=alt, res=_reservoir_init(zero3), grads=grads)

    def cond(c):
        return jnp.any(c.st.active)

    def body(c: _AdjointCarry) -> _AdjointCarry:
        (st, escaped, throughput, result, has_scattered, sampler, alt,
         res, grads) = c
        active = st.active

        # RR (parity with primal stream)
        q = jnp.minimum(jnp.max(throughput, axis=-1), 0.99)
        u_rr, sampler = next_1d(sampler)
        perform_rr = st.depth > cfg.rr_depth
        alive = jnp.any(throughput != 0.0, axis=-1)
        active = active & alive & ((~perform_rr) | (u_rr < q))
        throughput = jnp.where(perform_rr[:, None],
                               throughput / jnp.maximum(q, 1e-8)[:, None],
                               throughput)

        t_coll, found, sampler = free_flight(
            m, st.o_l, st.d_l, st.maxt, sampler, active,
            max_steps=cfg.max_steps)
        did_escape = active & (~found)
        did_scatter = active & found
        t_safe = jnp.where(found, t_coll, 0.0)
        p = st.o_l + t_safe[:, None] * st.d_l

        alb = jnp.where(did_scatter[:, None], albedo_at(m, p), 1.0)
        sig = sigma_t_at(m, p)

        # --- Scattering gradients (volpathsimple.py:139-172).
        # DRT estimates the in-scattering gradient along the whole traversed
        # SEGMENT, so it applies on escape segments too (the reference calls
        # backpropagate_scattering_drt with the pre-collision `active` mask,
        # volpathsimple.py:147-149).
        seg_lanes = did_scatter | did_escape
        if cfg.use_drt:
            adjoint = dL * throughput
            if cfg.use_drt_subsampling:
                u_res, alt = next_1d(alt)
                res = _reservoir_update(res, jax.lax.stop_gradient(throughput),
                                        u_res, seg_lanes, st.depth,
                                        st.o_l, st.d_l, st.d_w, st.maxt)
            else:
                grads, alt = _drt_backward(
                    cfg, scene, alt, st.o_l, st.d_l, st.d_w, st.maxt,
                    st.depth, adjoint, seg_lanes, grads)
        if (not cfg.use_drt) or cfg.use_drt_mis:
            if cfg.use_drt and cfg.use_drt_mis:
                # combined MIS weight * 1/sigma_t = sigma_t/(1+sigma_t^2)
                wf = sig / (1.0 + sig * sig)
            else:
                wf = 1.0 / jnp.maximum(sig, 1e-8)
            Li = result / jnp.maximum(alb, 1e-8)
            # d/d(sigma*albedo): cot_sig = sum_c w dL_c alb_c Li_c;
            #                    cot_alb_c = w dL_c sig Li_c
            base = dL * Li * wf[:, None]
            cot_sig_ff = jnp.sum(base * alb, axis=-1)
            cot_alb_ff = base * sig[:, None]
            grads = scatter_sigma(grads, m, p, cot_sig_ff, did_scatter)
            grads = scatter_albedo(grads, m, p, cot_alb_ff, did_scatter)

        # --- Transmittance gradients (volpathsimple.py:181-189,584-607)
        seg_active = did_scatter | did_escape
        interval = jnp.where(did_escape, st.maxt, t_safe)
        adj_w = jnp.sum(dL * result, axis=-1)      # sum_c dL_c * result_c
        inv_pdf = interval / cfg.trans_grad_samples
        for _ in range(cfg.trans_grad_samples):
            u_t, alt = next_1d(alt)
            t_s = u_t * interval
            p_s = st.o_l + t_s[:, None] * st.d_l
            grads = scatter_sigma(grads, m, p_s, -adj_w * inv_pdf, seg_active)

        throughput = throughput * alb
        depth = jnp.where(did_scatter, st.depth + 1, st.depth)
        active = did_scatter & (depth < cfg.max_depth)
        has_scattered = has_scattered | did_scatter

        # --- NEE: primal contribution (subtracted: PRB state update) +
        #     replayed adjoint transmittance (volpathsimple.py:207-215,380-403)
        if cfg.use_nee:
            active_e = did_scatter & active
            nee_sampler = clone(sampler)
            contrib, shadow_info, sampler = _nee_primal(
                cfg, scene, p, st.d_w, throughput, sampler, active_e)
            result = result - contrib
            grads = _nee_adjoint_replay(cfg, scene, p, shadow_info,
                                        nee_sampler, dL * contrib, grads)

        # --- Phase sampling (identical stream use as primal)
        u1, sampler = next_1d(sampler)
        u2, sampler = next_2d(sampler)
        wo, ph_pdf = phase_sample(m.phase_g, st.d_w, u1, u2[:, 1])
        d_w = jnp.where(did_scatter[:, None], wo, st.d_w)
        d_l = jnp.where(did_scatter[:, None],
                        aabb.transform_dirs(m.world_to_local, wo), st.d_l)
        o_l = jnp.where(did_scatter[:, None], p, st.o_l)
        last_pdf = jnp.where(did_scatter, ph_pdf, st.last_pdf)

        tf = _exit_dist(o_l, d_l)
        maxt = jnp.where(did_scatter, tf, st.maxt)
        active = active & ~(did_scatter & (tf <= 1e-7))
        escaped = escaped | did_escape

        st = PathState(active=active, depth=depth, o_l=o_l, d_l=d_l, d_w=d_w,
                       maxt=maxt, last_pdf=last_pdf)
        return _AdjointCarry(st, escaped, throughput, result, has_scattered,
                             sampler, alt, res, grads)

    carry = jax.lax.while_loop(cond, body, carry)

    # --- Delayed DRT on the reservoir-selected vertex (volpathsimple.py:248-259)
    if cfg.use_drt and cfg.use_drt_subsampling:
        res = carry.res
        w_sub = _reservoir_get(res)
        adjoint = w_sub * dL
        grads, _ = _drt_backward(cfg, scene, carry.alt, res.o_l, res.d_l,
                                 res.d_w, res.maxt, res.depth, adjoint,
                                 res.active, carry.grads)
        carry = carry._replace(grads=grads)

    return finalize_accum(carry.grads, m), carry.sampler
