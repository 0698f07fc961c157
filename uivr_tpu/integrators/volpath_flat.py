"""Flattened (megakernel) volumetric path tracer: one uniform tracking step
per lane per iteration.

TPU-first redesign of ``volpathsimple``: the reference's nested structure
(path loop > free-flight loop, path loop > NEE ratio-tracking loop;
volpathsimple.py:110-246,345-365,464-503) executes, per outer iteration, the
MAX inner trip count over the whole wavefront — measured ~1000 sequential
wavefront steps per render on production media.  Here every lane advances
exactly ONE majorant-tracking step per iteration of a SINGLE ``while_loop``,
switching between walk modes:

    MAIN    — delta-track the camera/bounce ray to its next real collision
    SHADOW  — ratio-track an NEE shadow ray (transmittance)
    REPLAY  — (adjoint only) re-walk the shadow ray with the completed
              contribution as adjoint, scattering transmittance gradients
    DONE    — terminated

Total iterations = max over lanes of the TOTAL per-lane event count — the
optimum for a masked wavefront.  Scatter-event work (phase/NEE direction
sampling, albedo lookups, gradient scatters) is masked arithmetic that runs
every iteration; all table accesses use corner-table row gathers
(core/grids.py) to respect TPU's per-row gather cost.

RNG: per-lane draw counters (core/rng.py LaneSampler) — lanes consume
asynchronously, and NEE replay restores a per-lane counter snapshot; this
reproduces the Dr.Jit clone/fork semantics that PRB correctness requires
(reference volpathsimple.py:99-108,380-403) under flattened control flow.

The estimators are IDENTICAL to volpathsimple.py (same terms, same MIS, same
DRT reservoir subsampling); only the event schedule differs, so primal
images and expected gradients agree (tested against the nested engine and
the quadrature oracle).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import aabb
from ..core.rng import (LaneSampler, _to_unit_float, lane_fork, lane_next_1d,
                        make_lane_sampler, make_sampler, next_1d, next_2d,
                        sample_tea_32, tea)
from ..scene.gradients import GradAccum, finalize_accum, init_accum
from ..scene.medium import albedo_at, sigma_albedo_at, sigma_t_at
from ..scene.phase import phase_eval, phase_sample
from ..scene.scene import Scene
from ..tracking import drt_distance
from .common import mis_weight, scatter_sigma
from ..scene.gradients import scatter_sigma_albedo
from .volpathsimple import (PathState, VolpathConfig, _exit_dist, _nee_primal,
                            _reservoir_get, _reservoir_init,
                            _reservoir_update)

DONE, MAIN, SHADOW, REPLAY = 0, 1, 2, 3
# numpy scalar, not jnp: module-scope device arrays initialize the XLA
# backend at import time, breaking multi-host jax.distributed bring-up
_BIG = np.float32(1e30)


def _cell_step(m, o_l, wd, wt):
    """Supercell majorant + exit parameter at walk position wt (same math
    as tracking/trackers._cell_exit, inlined for the fused loop)."""
    Dc, Hc, Wc = m.majorant_grid.shape
    res = jnp.array([Wc, Hc, Dc], jnp.float32)
    eps = jnp.float32(1e-5) * (1.0 + jnp.abs(wt))
    p = o_l + (wt + eps)[..., None] * wd
    cell = jnp.clip(jnp.floor(jnp.clip(p, 0.0, 1.0 - 1e-7) * res), 0.0,
                    res - 1.0)
    sigma_maj = m.majorant_grid[cell[..., 2].astype(jnp.int32),
                                cell[..., 1].astype(jnp.int32),
                                cell[..., 0].astype(jnp.int32)]
    lo = cell / res
    hi = (cell + 1.0) / res
    safe_d = jnp.where(jnp.abs(wd) < 1e-20,
                       jnp.where(wd >= 0, 1e-20, -1e-20), wd)
    t_hi = jnp.maximum((lo - o_l) / safe_d, (hi - o_l) / safe_d)
    t_exit = jnp.minimum(jnp.minimum(t_hi[..., 0], t_hi[..., 1]),
                         t_hi[..., 2])
    return sigma_maj, jnp.maximum(t_exit, wt + eps)


class _FlatCarry(NamedTuple):
    mode: jnp.ndarray            # (n,) i32
    o_l: jnp.ndarray             # (n,3) segment origin (local)
    d_l: jnp.ndarray             # (n,3)
    d_w: jnp.ndarray             # (n,3)
    t: jnp.ndarray               # (n,) walk param along main segment
    maxt: jnp.ndarray            # (n,)
    depth: jnp.ndarray           # (n,) i32
    throughput: jnp.ndarray      # (n,3)
    result: jnp.ndarray          # (n,3)
    escaped: jnp.ndarray         # (n,)
    has_scattered: jnp.ndarray   # (n,)
    last_pdf: jnp.ndarray        # (n,)
    post_mode: jnp.ndarray       # (n,) i32 — mode to resume after shadow
    sh_d: jnp.ndarray            # (n,3) shadow dir (local)
    sh_t: jnp.ndarray            # (n,)
    sh_tmax: jnp.ndarray         # (n,)
    sh_tr: jnp.ndarray           # (n,)
    sh_base: jnp.ndarray         # (n,3) contribution excluding transmittance
    smp: LaneSampler
    it: jnp.ndarray


class _StepEvents(NamedTuple):
    """Per-iteration event data the adjoint consumes."""
    p: jnp.ndarray               # (n,3) candidate collision point
    sig: jnp.ndarray             # (n,)
    sigma_maj: jnp.ndarray       # (n,)
    ratio: jnp.ndarray           # (n,)
    collided: jnp.ndarray        # (n,)
    fin_seg: jnp.ndarray         # (n,)
    t_next: jnp.ndarray          # (n,)
    t_cand: jnp.ndarray          # (n,)
    real: jnp.ndarray            # (n,)
    scat: jnp.ndarray            # (n,)
    m_escape: jnp.ndarray        # (n,)
    sh_done: jnp.ndarray         # (n,)
    contrib: jnp.ndarray         # (n,3) completed NEE contribution
    alb: jnp.ndarray             # (n,3)
    thr_pre: jnp.ndarray         # (n,3) throughput BEFORE albedo
    is_rp: jnp.ndarray           # (n,)
    u_evt: jnp.ndarray           # (n,) event draw (replay shadow-RR reuse)


def _init_carry(scene: Scene, o, d, smp: LaneSampler,
                path_state: Optional[PathState]) -> _FlatCarry:
    m = scene.medium
    if path_state is None:
        ol = aabb.transform_points(m.world_to_local, o)
        dl = aabb.transform_dirs(m.world_to_local, d)
        tn, tf, hit = aabb.ray_unit_cube(ol, dl, 0.0, aabb.INF)
        active = hit & (tf > tn)
        entry = ol + tn[:, None] * dl
        st = PathState(active=active, depth=(tn * 0).astype(jnp.int32),
                       o_l=entry, d_l=dl, d_w=d,
                       maxt=jnp.where(active, tf - tn, 0.0),
                       last_pdf=tn * 0 + 1.0)
        escaped = ~active
        has_scattered = jnp.logical_and(active, False)
    else:
        st = path_state
        escaped = jnp.logical_and(st.active, False)
        has_scattered = jnp.asarray(st.active)

    z1 = st.maxt * 0.0
    z3 = st.o_l * 0.0
    return _FlatCarry(
        mode=jnp.where(st.active, MAIN, DONE).astype(jnp.int32),
        o_l=st.o_l, d_l=st.d_l, d_w=st.d_w, t=z1, maxt=st.maxt,
        depth=st.depth, throughput=z3 + 1.0, result=z3,
        escaped=escaped, has_scattered=has_scattered,
        last_pdf=st.last_pdf,
        post_mode=(st.depth * 0 + MAIN),
        sh_d=z3, sh_t=z1, sh_tmax=z1, sh_tr=z1, sh_base=z3,
        smp=smp, it=jnp.int32(0))


def _flat_step(cfg: VolpathConfig, scene: Scene, c: _FlatCarry,
               rp_dim=None, rp_t=None) -> Tuple[_FlatCarry, _StepEvents]:
    """One fused tracking step for every lane.  In the adjoint, REPLAY lanes
    walk with the restored counter ``rp_dim`` and position ``rp_t``; their
    state updates are handled by the adjoint body.  Primal-side mode
    transitions for SHADOW completion are NOT applied here in adjoint mode
    (the body routes them through REPLAY)."""
    m = scene.medium
    is_adj = rp_dim is not None
    mode = c.mode
    is_main = mode == MAIN
    is_sh = mode == SHADOW
    is_rp = (mode == REPLAY) if is_adj else jnp.zeros_like(is_main)
    walking = is_main | is_sh | is_rp

    # --- current-walk ray parameters
    wd = jnp.where(is_main[:, None], c.d_l, c.sh_d)
    wt = jnp.where(is_main, c.t, c.sh_t)
    wmax = jnp.where(is_main, c.maxt, c.sh_tmax)
    if is_adj:
        wt = jnp.where(is_rp, rp_t, wt)

    sigma_maj, t_exit = _cell_step(m, c.o_l, wd, wt)

    # --- draws: MAIN/SHADOW consume the primary stream; REPLAY re-reads the
    # shadow walk's values from the restored counter
    smp = c.smp
    consume = is_main | is_sh
    u_step, smp = lane_next_1d(smp, consume=consume)
    u_evt, smp = lane_next_1d(smp, consume=consume)
    if is_adj:
        # replay re-derivation of the shadow walk's draws: must use the
        # SAME round count as lane_next_1d (core.rng._DRAW_ROUNDS)
        from ..core.rng import _DRAW_ROUNDS
        b1, _ = tea(smp.h, rp_dim, rounds=_DRAW_ROUNDS)
        b2, _ = tea(smp.h, rp_dim + jnp.uint32(1), rounds=_DRAW_ROUNDS)
        u_step = jnp.where(is_rp, _to_unit_float(b1), u_step)
        u_evt = jnp.where(is_rp, _to_unit_float(b2), u_evt)

    step = jnp.where(sigma_maj > 0.0,
                     -jnp.log1p(-u_step) / jnp.maximum(sigma_maj, 1e-20),
                     _BIG)
    t_cand = wt + step
    bound = jnp.minimum(t_exit, wmax)
    collided = walking & (t_cand < bound)
    fin_seg = walking & (~collided) & (t_exit >= wmax)
    crossed = walking & (~collided) & (t_exit < wmax)
    t_next = jnp.where(collided, t_cand, jnp.where(crossed, t_exit, wt))

    p = c.o_l + t_cand[:, None] * wd
    sig, alb = sigma_albedo_at(m, p)   # one fused row gather
    r = jnp.where(sigma_maj > 0.0, sig / jnp.maximum(sigma_maj, 1e-20), 0.0)
    ratio = jnp.maximum(1.0 - r, 0.0)

    # ================= SHADOW walk (primal transmittance) =================
    sh_coll = is_sh & collided
    sh_tr = jnp.where(sh_coll, c.sh_tr * ratio, c.sh_tr)
    if cfg.shadow_rr > 0.0:
        # RR on low-transmittance walks (see VolpathConfig.shadow_rr);
        # reuses the shadow-lane u_evt draw, q detached
        tail = sh_coll & (sh_tr < cfg.shadow_rr) & (sh_tr > 0.0)
        q_sh = sh_tr * (1.0 / cfg.shadow_rr)
        sh_tr = jnp.where(tail,
                          jnp.where(u_evt < q_sh,
                                    jnp.float32(cfg.shadow_rr), 0.0), sh_tr)
    sh_t = jnp.where(is_sh, t_next, c.sh_t)
    sh_done = is_sh & (fin_seg | (sh_tr <= 0.0))
    contrib = c.sh_base * sh_tr[:, None]
    result = c.result
    if not is_adj:
        result = result + jnp.where(sh_done[:, None], contrib, 0.0)
        mode = jnp.where(sh_done, c.post_mode, mode)

    # ================= MAIN walk ==========================================
    real = is_main & collided & (u_evt < r)
    m_escape = is_main & fin_seg
    t = jnp.where(is_main, t_next, c.t)
    escaped = c.escaped | m_escape
    mode = jnp.where(m_escape, DONE, mode)

    thr_pre = c.throughput
    throughput = jnp.where(real[:, None], c.throughput * alb, c.throughput)
    depth = jnp.where(real, c.depth + 1, c.depth)
    die_depth = real & (depth >= cfg.max_depth)
    mode = jnp.where(die_depth, DONE, mode)
    scat = real & ~die_depth

    # Russian roulette at scatter vertices past rr_depth (reference
    # volpathsimple.py:116-121; disabled by default via rr_depth >
    # max_depth). Unbiased: survivors divide throughput by q. The adjoint
    # replays the identical decisions via the shared primary stream.
    u_rr, smp = lane_next_1d(smp, consume=real)
    perform_rr = scat & (depth > cfg.rr_depth)
    q = jnp.minimum(jnp.max(throughput, axis=-1), 0.99)
    rr_dead = perform_rr & (u_rr >= q)
    throughput = jnp.where(perform_rr[:, None],
                           throughput / jnp.maximum(q, 1e-8)[:, None],
                           throughput)
    mode = jnp.where(rr_dead, DONE, mode)
    scat = scat & ~rr_dead

    # --- phase sampling for the continuation direction
    u_p1, smp = lane_next_1d(smp, consume=scat)
    u_p2, smp = lane_next_1d(smp, consume=scat)
    wo_w, ph_pdf = phase_sample(m.phase_g, c.d_w, u_p1, u_p2)
    d_w = jnp.where(scat[:, None], wo_w, c.d_w)
    d_l_new = aabb.transform_dirs(m.world_to_local, wo_w)
    d_l = jnp.where(scat[:, None], d_l_new, c.d_l)
    last_pdf = jnp.where(scat, ph_pdf, c.last_pdf)
    has_scattered = c.has_scattered | scat

    o_l = jnp.where(scat[:, None], p, c.o_l)
    cont_maxt = _exit_dist(o_l, d_l)
    maxt = jnp.where(scat, cont_maxt, c.maxt)
    t = jnp.where(scat, 0.0, t)
    acc_escape = scat & (cont_maxt <= 1e-7)
    resume_mode = jnp.where(acc_escape, DONE, MAIN)

    # --- NEE setup (direction sampling; the walk happens on later iters)
    if cfg.use_nee:
        u_e1, smp = lane_next_1d(smp, consume=scat)
        u_e2, smp = lane_next_1d(smp, consume=scat)
        ds_d, ds_pdf, em_w = scene.emitter.sample_direction(
            jnp.stack([u_e1, u_e2], -1))
        nee_ok = scat & (ds_pdf > 0.0)
        phv = phase_eval(m.phase_g, c.d_w, ds_d)   # incident dir pre-update
        wmis = mis_weight(ds_pdf, phv)
        sh_d_new = aabb.transform_dirs(m.world_to_local, ds_d)
        sh_tmax_new = _exit_dist(o_l, sh_d_new)
        base_new = throughput * (phv * wmis)[:, None] * em_w

        sh_d = jnp.where(nee_ok[:, None], sh_d_new, c.sh_d)
        sh_tmax = jnp.where(nee_ok, sh_tmax_new, c.sh_tmax)
        sh_base = jnp.where(nee_ok[:, None], base_new, c.sh_base)
        sh_t = jnp.where(nee_ok, 0.0, sh_t)
        sh_tr = jnp.where(nee_ok, 1.0, sh_tr)
        post_mode = jnp.where(scat, resume_mode, c.post_mode)
        mode = jnp.where(nee_ok, SHADOW,
                         jnp.where(scat & ~nee_ok, resume_mode, mode))
    else:
        sh_d, sh_tmax, sh_base, post_mode = (c.sh_d, c.sh_tmax, c.sh_base,
                                             c.post_mode)
        mode = jnp.where(scat, resume_mode, mode)

    out = _FlatCarry(
        mode=mode, o_l=o_l, d_l=d_l, d_w=d_w, t=t, maxt=maxt, depth=depth,
        throughput=throughput, result=result, escaped=escaped,
        has_scattered=has_scattered, last_pdf=last_pdf, post_mode=post_mode,
        sh_d=sh_d, sh_t=sh_t, sh_tmax=sh_tmax, sh_tr=sh_tr, sh_base=sh_base,
        smp=smp, it=c.it + 1)
    ev = _StepEvents(p=p, sig=sig, sigma_maj=sigma_maj, ratio=ratio,
                     collided=collided, fin_seg=fin_seg, t_next=t_next,
                     t_cand=t_cand, real=real, scat=scat, m_escape=m_escape,
                     sh_done=sh_done, contrib=contrib, alb=alb,
                     thr_pre=thr_pre, is_rp=is_rp, u_evt=u_evt)
    return out, ev


def _finish(cfg: VolpathConfig, scene: Scene, c: _FlatCarry,
            nee_emitter=None) -> jnp.ndarray:
    """Envmap contribution on escape with NEE MIS (volpathsimple.py:262-288).

    ``nee_emitter``: emitter whose pdf the NEE strategy actually sampled
    with (the coarse proxy in the Pallas deferred-radiance mode) — MIS
    weights on both strategies must use the same pdf pair to partition to 1;
    radiance is always evaluated on the full-res emitter."""
    active_e = c.escaped
    if cfg.hide_emitters:
        active_e = active_e & ~(c.depth <= 0)
    if cfg.use_nee:
        epdf = (nee_emitter or scene.emitter).pdf_direction(c.d_w)
        epdf = jnp.where(c.has_scattered, epdf, 0.0)
        w = mis_weight(c.last_pdf, epdf)[:, None]
    else:
        w = 1.0
    contrib = c.throughput * w * scene.emitter.eval(c.d_w)
    return c.result + jnp.where(active_e[:, None], contrib, 0.0)


def sample_primal(cfg: VolpathConfig, scene: Scene, o, d, seed,
                  path_state: Optional[PathState] = None,
                  max_iters: int = 100_000, return_stats: bool = False):
    """Flat primal estimate. Returns (L (n,3), escaped)[, stats dict]."""
    n = (o if path_state is None else path_state.o_l).shape[0]
    smp = make_lane_sampler(seed, n_lanes=n)
    carry = _init_carry(scene, o, d, smp, path_state)

    def cond(c: _FlatCarry):
        return jnp.any(c.mode != DONE) & (c.it < max_iters)

    def body(c: _FlatCarry) -> _FlatCarry:
        return _flat_step(cfg, scene, c)[0]

    carry = jax.lax.while_loop(cond, body, carry)
    L = _finish(cfg, scene, carry)
    if return_stats:
        # per-lane consumed-draw counters ~ 2x events; loop trip count
        stats = {"iters": carry.it, "lane_dims": carry.smp.dim,
                 "depth": carry.depth}
        return L, carry.escaped, stats
    return L, carry.escaped


# ---------------------------------------------------------------------------
# Compaction rounds: shrink the wavefront as lanes terminate.
#
# Measured on production media: mean ~30 events/lane but max ~800, so a
# single full-width while_loop wastes ~96% of the wavefront on the
# divergence tail.  Rounds of `block_iters` steps with host-side compaction
# into progressively smaller buffers (shrink factor until `min_size`) bring
# the cost from O(n * max_events) toward O(sum events).  Lane independence
# (per-lane RNG counters) makes compaction exact: results are identical to
# the single-loop engine realization.
# ---------------------------------------------------------------------------

def _carry_take(c: _FlatCarry, idx: jnp.ndarray) -> _FlatCarry:
    """Gather the per-lane state of `idx` lanes (it counter kept)."""
    def take(x):
        return x[idx]
    return _FlatCarry(
        mode=take(c.mode), o_l=take(c.o_l), d_l=take(c.d_l), d_w=take(c.d_w),
        t=take(c.t), maxt=take(c.maxt), depth=take(c.depth),
        throughput=take(c.throughput), result=take(c.result),
        escaped=take(c.escaped), has_scattered=take(c.has_scattered),
        last_pdf=take(c.last_pdf), post_mode=take(c.post_mode),
        sh_d=take(c.sh_d), sh_t=take(c.sh_t), sh_tmax=take(c.sh_tmax),
        sh_tr=take(c.sh_tr), sh_base=take(c.sh_base),
        smp=LaneSampler(h=take(c.smp.h), dim=take(c.smp.dim)), it=c.it)


def _carry_put(full: _FlatCarry, sub: _FlatCarry,
               idx: jnp.ndarray) -> _FlatCarry:
    """Scatter the per-lane state of `sub` back into `full` at `idx`."""
    def put(f, s):
        return f.at[idx].set(s)
    return _FlatCarry(
        mode=put(full.mode, sub.mode), o_l=put(full.o_l, sub.o_l),
        d_l=put(full.d_l, sub.d_l), d_w=put(full.d_w, sub.d_w),
        t=put(full.t, sub.t), maxt=put(full.maxt, sub.maxt),
        depth=put(full.depth, sub.depth),
        throughput=put(full.throughput, sub.throughput),
        result=put(full.result, sub.result),
        escaped=put(full.escaped, sub.escaped),
        has_scattered=put(full.has_scattered, sub.has_scattered),
        last_pdf=put(full.last_pdf, sub.last_pdf),
        post_mode=put(full.post_mode, sub.post_mode),
        sh_d=put(full.sh_d, sub.sh_d), sh_t=put(full.sh_t, sub.sh_t),
        sh_tmax=put(full.sh_tmax, sub.sh_tmax),
        sh_tr=put(full.sh_tr, sub.sh_tr),
        sh_base=put(full.sh_base, sub.sh_base),
        smp=LaneSampler(h=put(full.smp.h, sub.smp.h),
                        dim=put(full.smp.dim, sub.smp.dim)),
        it=sub.it)


def _run_rounds(step_body, take_fn, put_fn, active_of, full,
                schedule, n, max_iters: int = 100_000):
    """In-graph compaction driver: run `block_iters` fused steps at full
    width, then for each (size, iters) stage gather the most-active lanes
    into a `size`-wide buffer and continue there; any overflow lanes (rare:
    actives exceeded the stage capacity) finish in a final full-width loop,
    which costs one cond check when empty.  Static shapes throughout ->
    jittable inside the render op.

    ``max_iters`` bounds EVERY loop on the total step counter ``c.it`` — a
    lane that never reaches DONE (numeric corner) must truncate, not spin
    the device until the TPU watchdog kills the program."""
    first_iters, stages = schedule[0], schedule[1:]

    def bounded(c, iters):
        it0 = c.it

        def cond(cc):
            return (jnp.any(active_of(cc)) & (cc.it - it0 < iters)
                    & (cc.it < max_iters))
        return jax.lax.while_loop(cond, step_body, c)

    def unbounded(c):
        def cond(cc):
            return jnp.any(active_of(cc)) & (cc.it < max_iters)
        return jax.lax.while_loop(cond, step_body, c)

    full = bounded(full, first_iters)
    for size, iters in stages:
        if size >= n:
            full = unbounded(full) if iters is None else bounded(full, iters)
            continue
        order = jnp.argsort(~active_of(full))
        idx = order[:size]
        sub = take_fn(full, idx)
        sub = unbounded(sub) if iters is None else bounded(sub, iters)
        full = put_fn(full, sub, idx)

    return unbounded(full)


def _adj_take(a: "_FlatAdjCarry", idx: jnp.ndarray) -> "_FlatAdjCarry":
    """Per-lane gather for the adjoint carry; the gradient accumulator and
    iteration counter are global and pass through untouched."""
    return _FlatAdjCarry(
        c=_carry_take(a.c, idx),
        alt=LaneSampler(h=a.alt.h[idx], dim=a.alt.dim[idx]),
        acc=a.acc,
        rp_dim=a.rp_dim[idx], rp_t=a.rp_t[idx], rp_tr=a.rp_tr[idx],
        sh_dim0=a.sh_dim0[idx], sh_adj=a.sh_adj[idx], dL=a.dL[idx],
        res=type(a.res)(*[f[idx] for f in a.res]))


def _adj_put(full: "_FlatAdjCarry", sub: "_FlatAdjCarry",
             idx: jnp.ndarray) -> "_FlatAdjCarry":
    return _FlatAdjCarry(
        c=_carry_put(full.c, sub.c, idx),
        alt=LaneSampler(h=full.alt.h.at[idx].set(sub.alt.h),
                        dim=full.alt.dim.at[idx].set(sub.alt.dim)),
        acc=sub.acc,   # threaded: the sub rounds kept accumulating
        rp_dim=full.rp_dim.at[idx].set(sub.rp_dim),
        rp_t=full.rp_t.at[idx].set(sub.rp_t),
        rp_tr=full.rp_tr.at[idx].set(sub.rp_tr),
        sh_dim0=full.sh_dim0.at[idx].set(sub.sh_dim0),
        sh_adj=full.sh_adj.at[idx].set(sub.sh_adj),
        dL=full.dL.at[idx].set(sub.dL),
        res=type(full.res)(*[f.at[idx].set(g)
                             for f, g in zip(full.res, sub.res)]))


def sample_primal_compact(cfg: VolpathConfig, scene: Scene, o, d, seed,
                          schedule=(96, None, None),
                          path_state: Optional[PathState] = None):
    """Flat primal with in-graph compaction rounds (see note above).

    ``schedule``: (first_iters, (size1, iters1), ..., ) — sizes default to
    n/8 and n/64 when given as None placeholders.  Fully jittable; results
    are bit-identical to :func:`sample_primal` (lane independence).
    """
    # below ~32k lanes gather cost is overhead-dominated, so deeper
    # compaction stages stop paying off; default = one n/8 stage (unbounded)
    n = (o if path_state is None else path_state.o_l).shape[0]
    sched = [schedule[0]]
    defaults = [(max(n // 8, 8192), 256), (max(n // 32, 8192), None)]
    for i, st in enumerate(schedule[1:]):
        sched.append(st if st is not None else
                     defaults[i] if i < len(defaults) else (n, None))
    smp = make_lane_sampler(seed, n_lanes=n)
    full = _init_carry(scene, o, d, smp, path_state)

    def step_body(c):
        return _flat_step(cfg, scene, c)[0]

    full = _run_rounds(step_body, _carry_take, _carry_put,
                       lambda c: c.mode != DONE, full, sched, n,
                       max_iters=cfg.max_steps)
    return _finish(cfg, scene, full), full.escaped


# ---------------------------------------------------------------------------
# Adjoint
# ---------------------------------------------------------------------------

class _FlatAdjCarry(NamedTuple):
    c: _FlatCarry
    alt: LaneSampler
    acc: GradAccum
    rp_dim: jnp.ndarray      # (n,) u32 replay counter
    rp_t: jnp.ndarray        # (n,)
    rp_tr: jnp.ndarray       # (n,)
    sh_dim0: jnp.ndarray     # (n,) u32 counter snapshot at shadow-walk start
    sh_adj: jnp.ndarray      # (n,3) dL * completed NEE contribution
    dL: jnp.ndarray          # (n,3) per-lane adjoint radiance
    res: object              # _Reservoir

    @property
    def it(self):
        return self.c.it


def sample_adjoint(cfg: VolpathConfig, scene: Scene, o, d, seed, dL,
                   state_in, max_iters: int = None, schedule=None):
    """Flat path-replay adjoint (same estimator set and algebra as
    volpathsimple.sample_adjoint). Returns MediumParams gradients.
    ``schedule`` (as in :func:`sample_primal_compact`) enables in-graph
    compaction rounds."""
    m = scene.medium
    n = o.shape[0]
    if max_iters is None:
        # the adjoint interleaves MAIN + SHADOW + REPLAY walks, so its total
        # event count per lane can exceed the primal's ~max_steps bound
        max_iters = 3 * cfg.max_steps
    smp = make_lane_sampler(seed, n_lanes=n)
    carry = _init_carry(scene, o, d, smp, None)
    carry = carry._replace(result=jnp.asarray(state_in))
    z1 = carry.maxt * 0.0
    zu = z1.astype(jnp.uint32)
    ac = _FlatAdjCarry(
        c=carry, alt=lane_fork(smp, 0x9E3779B9),
        acc=init_accum(m, vary=jnp.sum(z1), need_emission=False),
        rp_dim=zu, rp_t=z1, rp_tr=z1, sh_dim0=zu,
        sh_adj=carry.o_l * 0.0, dL=jnp.asarray(dL),
        res=_reservoir_init(carry.o_l * 0.0))

    def cond(a: _FlatAdjCarry):
        return jnp.any(a.c.mode != DONE) & (a.c.it < max_iters)

    def body(a: _FlatAdjCarry) -> _FlatAdjCarry:
        c = a.c
        dL = a.dL            # per-lane (compaction-safe)
        out, ev = _flat_step(cfg, scene, c, rp_dim=a.rp_dim, rp_t=a.rp_t)
        acc, alt = a.acc, a.alt
        p, sig, alb = ev.p, ev.sig, ev.alb

        # ---- free-flight/MIS in-scattering gradients (volpathsimple.py:152-171)
        if (not cfg.use_drt) or cfg.use_drt_mis:
            if cfg.use_drt and cfg.use_drt_mis:
                wf = sig / (1.0 + sig * sig)     # mis_w * 1/sigma_t, stable
            else:
                wf = 1.0 / jnp.maximum(sig, 1e-8)
            Li = c.result / jnp.maximum(alb, 1e-8)
            base = dL * Li * wf[:, None]
            acc = scatter_sigma_albedo(acc, m, p,
                                       jnp.sum(base * alb, -1),
                                       base * sig[:, None], ev.real)

        # ---- DRT reservoir update (subsampling; volpathsimple.py:507-539).
        # In-scattering gradients apply along every traversed SEGMENT,
        # including escape segments (reference passes the pre-collision
        # active mask at volpathsimple.py:147-149).
        res = a.res
        seg_end = ev.real | ev.m_escape
        if cfg.use_drt:
            if cfg.use_drt_subsampling:
                u_res, alt = lane_next_1d(alt, consume=seg_end)
                res = _reservoir_update(
                    res, jax.lax.stop_gradient(ev.thr_pre), u_res, seg_end,
                    c.depth, c.o_l, c.d_l, c.d_w, c.maxt)
            # (quadratic DRT variant is only provided by the nested engine)

        # ---- transmittance gradients (volpathsimple.py:181-189,584-607)
        interval = jnp.where(ev.m_escape, c.maxt, ev.t_cand)
        adj_w = jnp.sum(dL * c.result, axis=-1)
        inv_pdf = interval / cfg.trans_grad_samples
        for _ in range(cfg.trans_grad_samples):
            u_t, alt = lane_next_1d(alt, consume=seg_end)
            p_s = c.o_l + (u_t * interval)[:, None] * c.d_l
            acc = scatter_sigma(acc, m, p_s, -adj_w * inv_pdf, seg_end)

        # ---- shadow walk completed: PRB subtract + schedule REPLAY
        # (zero-contribution walks — e.g. shadow-RR kills — carry no
        # cotangent, so they skip the replay re-walk entirely)
        mode = out.mode
        result = out.result - jnp.where(ev.sh_done[:, None], ev.contrib, 0.0)
        sh_adj = jnp.where(ev.sh_done[:, None], dL * ev.contrib, a.sh_adj)
        do_rp = ev.sh_done & (jnp.sum(jnp.abs(ev.contrib), axis=-1) > 0.0)
        rp_dim = jnp.where(do_rp, a.sh_dim0, a.rp_dim)
        rp_t = a.rp_t
        rp_tr = a.rp_tr
        rp_t = jnp.where(do_rp, 0.0, rp_t)
        rp_tr = jnp.where(do_rp, 1.0, rp_tr)
        mode = jnp.where(ev.sh_done,
                         jnp.where(do_rp, REPLAY, out.post_mode), mode)

        # ---- REPLAY walk updates: scatter -sum(adj)/sigma_n per collision
        is_rp = ev.is_rp
        rp_coll = is_rp & ev.collided
        sigma_n = jnp.maximum(ev.sigma_maj - sig, 1e-8)
        cot = -jnp.sum(a.sh_adj, axis=-1) / sigma_n
        acc = scatter_sigma(acc, m, p, cot, rp_coll & (ev.ratio > 0.0))
        rp_tr = jnp.where(rp_coll, rp_tr * ev.ratio, rp_tr)
        if cfg.shadow_rr > 0.0:
            # mirror the primal shadow-RR decision (same u_evt realization)
            tail = rp_coll & (rp_tr < cfg.shadow_rr) & (rp_tr > 0.0)
            q_sh = rp_tr * (1.0 / cfg.shadow_rr)
            rp_tr = jnp.where(tail,
                              jnp.where(ev.u_evt < q_sh,
                                        jnp.float32(cfg.shadow_rr), 0.0),
                              rp_tr)
        rp_t = jnp.where(is_rp, ev.t_next, rp_t)
        rp_dim = jnp.where(is_rp, rp_dim + jnp.uint32(2), rp_dim)
        rp_fin = is_rp & (ev.fin_seg | (rp_tr <= 0.0))
        mode = jnp.where(rp_fin, c.post_mode, mode)

        # ---- snapshot the primary counter at shadow-walk start
        sh_dim0 = jnp.where(ev.scat, out.smp.dim, a.sh_dim0)

        out = out._replace(mode=mode, result=result)
        return _FlatAdjCarry(c=out, alt=alt, acc=acc, rp_dim=rp_dim,
                             rp_t=rp_t, rp_tr=rp_tr, sh_dim0=sh_dim0,
                             sh_adj=sh_adj, dL=a.dL, res=res)

    if schedule is None:
        ac = jax.lax.while_loop(cond, body, ac)
    else:
        n_l = o.shape[0]
        sched = [schedule[0]]
        defaults = [(max(n_l // 8, 8192), 256), (max(n_l // 32, 8192), None)]
        for i, st in enumerate(schedule[1:]):
            sched.append(st if st is not None else
                         defaults[i] if i < len(defaults) else (n_l, None))
        ac = _run_rounds(body, _adj_take, _adj_put,
                         lambda a: a.c.mode != DONE, ac, sched, n_l,
                         max_iters=max_iters)

    # ---- delayed DRT on reservoir vertices (volpathsimple.py:248-259)
    if cfg.use_drt and cfg.use_drt_subsampling:
        res = ac.res
        w_sub = _reservoir_get(res)
        adjoint = w_sub * dL
        acc = _drt_backward_flat(cfg, scene, seed, res, adjoint, ac.acc)
        ac = ac._replace(acc=acc)
    return finalize_accum(ac.acc, m)


def _drt_backward_flat(cfg: VolpathConfig, scene: Scene, seed, res, adjoint,
                       acc: GradAccum, engine: str = "flat") -> GradAccum:
    """Delayed DRT: transmittance-proportional distance + recursive
    primal Li + sigma/albedo cotangents (volpathsimple.py:507-581).  This
    phase is wavefront-synchronized, so the global-counter Sampler is used
    for its auxiliary draws.  ``engine='pallas'`` routes the recursive
    detached Li through the fused-step kernel (same estimator; the caller
    guarantees a pallas-supported scene and a 1024-multiple wavefront)."""
    m = scene.medium
    n = res.o_l.shape[0]
    drt_seed, _ = sample_tea_32(jnp.asarray(seed, jnp.uint32), 0x5151)
    gs = make_sampler(drt_seed, n_lanes=n)

    t_sub, w_drt, found, gs = drt_distance(
        m, res.o_l, res.d_l, res.maxt, gs, res.active,
        max_steps=cfg.max_steps)
    active = res.active & found
    t_safe = jnp.where(found, t_sub, 0.0)
    p = res.o_l + t_safe[:, None] * res.d_l

    Li = jnp.zeros_like(adjoint)
    if cfg.use_nee:
        nee, _, gs = _nee_primal(cfg, scene, p, res.d_w,
                                 jnp.ones_like(adjoint), gs, active)
        Li = Li + nee
    u1, gs = next_1d(gs)
    u2, gs = next_2d(gs)
    wo, ph_pdf = phase_sample(m.phase_g, res.d_w, u1, u2[:, 1])
    rec_dl = aabb.transform_dirs(m.world_to_local, wo)
    rec_maxt = _exit_dist(p, rec_dl)
    next_depth = jnp.where(active, res.depth + 1, res.depth)
    ps = PathState(
        active=active & (next_depth < cfg.max_depth) & (rec_maxt > 1e-7),
        depth=next_depth, o_l=p, d_l=rec_dl, d_w=wo, maxt=rec_maxt,
        last_pdf=jnp.where(active, ph_pdf, 1.0))
    rec_seed, _ = sample_tea_32(jnp.asarray(seed, jnp.uint32), 0x7177)
    if engine == "pallas":
        from ..ops.volpath_step import sample_primal_pallas
        # k_cand pinned to 1: the recursive Li is an independent detached
        # estimate (any k is unbiased), but pinning keeps the adjoint's
        # realization independent of the UIVR_KCAND env read at trace time
        # (render/batched.py resolves k_cand for the fwd pass explicitly)
        rec_Li, _ = sample_primal_pallas(cfg, scene, None, None, rec_seed,
                                         schedule=(64, None), path_state=ps,
                                         k_cand=1)
    else:
        rec_Li, _ = sample_primal_compact(cfg, scene, None, None, rec_seed,
                                          schedule=(64, None), path_state=ps)
    Li = Li + rec_Li

    sig = sigma_t_at(m, p)
    w_mis = 1.0 / (1.0 + sig * sig) if cfg.use_drt_mis else jnp.ones_like(sig)
    alb = albedo_at(m, p)
    factor = (w_mis * w_drt)[:, None] * adjoint * Li
    # one fused row scatter (sigma + albedo cotangents share the point p)
    acc = scatter_sigma_albedo(acc, m, p, jnp.sum(factor * alb, -1),
                               factor * sig[:, None], active)
    return acc
