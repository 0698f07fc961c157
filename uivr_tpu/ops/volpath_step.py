"""Pallas TPU fused step kernel for the flat volumetric path tracer (primal).

TPU-native acceleration of ``volpath_flat._flat_step``: everything except the
sigma/albedo trilinear lookup runs in ONE Pallas kernel per tracking step —
supercell majorant lookup (chunked 128-lane shuffles from VMEM), TEA counter
RNG (int32 VPU ops), free-flight sampling, event classification, Russian
roulette, phase sampling, NEE direction sampling and all state updates.  The
sigma/albedo corner-table row gather stays in XLA between kernel calls
(``sigma_albedo_at``): Mosaic's ``tpu.dynamic_gather`` on this toolchain is a
within-row 128-lane shuffle only (operand last dim 128, indices < 128 —
scripts/repro5_bisect.py), which cannot address a voxel grid, and gathers do
not lower inside in-kernel loops (scripts/repro3_loops.py), so the step loop
stays in XLA.

Step pipelining: the kernel fuses "post" of step i (event application, given
sig/albedo at the step-i candidate point) with "pre" of step i+1 (majorant +
free-flight candidate + collision point), so the loop body is exactly one
XLA row gather + one kernel dispatch.  A runtime ``do_post`` flag makes the
first call pre-only (no recompile).

Layout: per-lane state in 32 SoA planes (n/128, 128) — lanes in the last
(128-wide) dim, matching the shuffle primitive.  The TEA draw sequence is
bit-identical to the XLA flat engine (same draws, same consume masks), so
both engines sample the same paths modulo float-boundary event flips;
estimators are identical (reference volpathsimple.py:110-246 semantics).

The adjoint (sample_adjoint_pallas) runs the same fused kernel with extra
carried planes (ADJ_PLANES): the PRB cotangent algebra, DRT reservoir and
replay bookkeeping happen in-kernel; per-step scatter-adds into the gradient
tables are emitted as output planes and applied by the XLA wrapper in one
fused row scatter per dispatch.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.rng import LaneSampler, make_lane_sampler
from ..integrators.volpath_flat import (DONE, MAIN, REPLAY, SHADOW,
                                        _FlatCarry, _finish, _init_carry,
                                        _run_rounds)
from ..integrators.volpathsimple import VolpathConfig
from ..scene.emitters import ConstantEmitter, EnvmapEmitter, _INV_FOUR_PI
from ..scene.scene import Scene

_BIG = np.float32(1e30)     # python scalar: kernels may not capture arrays

# TEA constants as int32 bit patterns (Mosaic lacks uint32->f32 casts; int32
# two's-complement +, <<, ^ are bit-identical; >> via shift_right_logical).
_TEA_D = np.int32(np.uint32(0x9E3779B9))
_TEA_K = [np.int32(np.uint32(k)) for k in
          (0xA341316C, 0xC8013EA4, 0xAD90777D, 0x7E95761E)]


# Per-draw TEA rounds for the in-kernel streams; MUST match core.rng's
# _DRAW_ROUNDS (lane_next_1d) for flat/pallas bit-parity, so it is imported
# from the ONE place that reads the UIVR_TEA_DRAW_ROUNDS override — two
# independent env reads could silently diverge if the var is mutated between
# module imports (advisor round-2 finding).
from ..core.rng import _DRAW_ROUNDS


def tea_i32(v0, v1, rounds: int = 8):
    """Bit-exact int32 port of core.rng.tea (verified scripts/repro4)."""
    shr = jax.lax.shift_right_logical
    s = jnp.int32(0)
    for _ in range(rounds):
        s = s + _TEA_D
        v0 = v0 + (((v1 << 4) + _TEA_K[0]) ^ (v1 + s) ^ (shr(v1, 5) + _TEA_K[1]))
        v1 = v1 + (((v0 << 4) + _TEA_K[2]) ^ (v0 + s) ^ (shr(v0, 5) + _TEA_K[3]))
    return v0, v1


def _unit_float(bits):
    return jax.lax.shift_right_logical(bits, 8).astype(jnp.float32) \
        * jnp.float32(1.0 / 16777216.0)


# State planes: 27 f32 + 5 i32; pre-planes: 7 f32 (the step-i candidate the
# XLA gather consumes).  flags bits: 1=escaped, 2=has_scattered, 4=post_main.
F32_PLANES = ("ox", "oy", "oz", "dlx", "dly", "dlz", "dwx", "dwy", "dwz",
              "t", "maxt", "thr0", "thr1", "thr2", "res0", "res1", "res2",
              "lpdf", "shdx", "shdy", "shdz", "sht", "shtmax", "shtr",
              "shb0", "shb1", "shb2")
I32_PLANES = ("mode", "depth", "flags", "h", "dim", "shtex")
PRE_PLANES = ("px", "py", "pz", "tcand", "texit", "smaj", "uevt")
ALL_PLANES = F32_PLANES + I32_PLANES + PRE_PLANES
N_STATE = len(F32_PLANES) + len(I32_PLANES)
N_ALL = N_STATE + len(PRE_PLANES)


def _pre_names(k_cand: int):
    """Candidate planes.  k_cand == 1 keeps the legacy unsuffixed names (and
    no `kind` plane — POST reclassifies); K-candidate batching adds a packed
    per-candidate event kind from pass A (0=invalid, 1=collision, 2=segment
    end, 3=supercell crossing beyond the unroll budget)."""
    if k_cand == 1:
        return PRE_PLANES
    return tuple(f"{nm}{j}" for j in range(k_cand)
                 for nm in ("px", "py", "pz", "tcand", "texit", "smaj",
                            "uevt", "kind"))


def _state_names(spec: "StepSpec"):
    return (F32_PLANES + I32_PLANES + _pre_names(spec.k_cand)
            + (ADJ_PLANES if spec.adjoint else ()))

# Adjoint-only carried planes (volpath_flat._FlatAdjCarry as SoA planes;
# the DRT reservoir is inlined, `rvact` holds its active bit).
ADJ_F32 = ("rpt", "rptr", "sha0", "sha1", "sha2", "adj0", "adj1", "adj2",
           "rw0", "rw1", "rw2", "rc0", "rc1", "rc2",
           "rvo0", "rvo1", "rvo2", "rvl0", "rvl1", "rvl2",
           "rvw0", "rvw1", "rvw2", "rvmaxt")
ADJ_I32 = ("alth", "altd", "rpdim", "shdim0", "rvdepth", "rvact")
ADJ_PLANES = ADJ_F32 + ADJ_I32
N_ADJ = N_ALL + len(ADJ_PLANES)


def _scatter_outs(tgs: int):
    """Output-only planes: per-step cotangents/positions the XLA side
    scatter-adds into the gradient tables (replay cot is folded into
    sc_sig — same point p as the in-scattering scatter)."""
    names = ["sc_sig", "sc_a0", "sc_a1", "sc_a2"]
    for k in range(tgs):
        names += [f"tc{k}", f"tsx{k}", f"tsy{k}", f"tsz{k}"]
    return tuple(names)


FL_ESC, FL_SCAT, FL_POST = 1, 2, 4


@dataclass(frozen=True)
class StepSpec:
    """Static kernel configuration."""
    Dc: int; Hc: int; Wc: int       # majorant supergrid dims
    R: int                          # n // 128
    max_depth: int
    rr_depth: int
    use_nee: bool
    phase_iso: bool
    emitter_kind: str = "const"     # 'const' | 'envmap'
    em_h: int = 0                   # envmap SAMPLING dims (the in-VMEM alias
    em_w_: int = 0                  #   table; texels = em_h * em_w_)
    # Deferred-radiance mode for large envmaps: > 0 means the kernel samples
    # NEE directions from a COARSE (em_h, em_w_) alias table (the emitter's
    # `nee` proxy) and emits the FULL-RES (em_fh, em_fw) texel index in the
    # `shtex` plane; the XLA step wrapper then multiplies the full-res
    # radiance row into shb (one row gather per step).  Unbiased: the pdf
    # divided out is exactly the coarse sampling pdf, whose support covers
    # the radiance (1e-12 pmf floor), and escape MIS uses the same coarse
    # pdf (volpath_flat._finish nee_emitter).
    em_fh: int = 0
    em_fw: int = 0
    adjoint: bool = False
    tgs: int = 0                    # trans_grad_samples (adjoint only)
    shadow_rr: float = 0.0          # VolpathConfig.shadow_rr (0 = off)
    use_drt: bool = False
    use_drt_mis: bool = False
    use_drt_sub: bool = False
    # In-kernel supercell-crossing unroll: a step that only crosses into the
    # next supercell (no collision candidate) costs a full loop iteration —
    # i.e. an XLA sigma row-gather it never uses.  The PRE phase therefore
    # retries up to `cross_steps` crossings in straight-line code (Mosaic
    # cannot loop over gathers), consuming the identical TEA draws the flat
    # engine would, so the realization is unchanged.
    # Overridable for bisection/tuning via UIVR_CROSS_STEPS (1 disables).
    cross_steps: int = int(os.environ.get("UIVR_CROSS_STEPS", 4))
    # K-candidate event batching (PLAN.md): pass A (PRE) emits up to k_cand
    # candidate collision events per dispatch by walking the majorant field
    # null-assumed (valid: null events change nothing about the walk); the
    # XLA side does ONE (k_cand*n)-row sigma gather; POST resolves the
    # candidates in order, discarding those past the first terminal event
    # (real scatter / segment end / RR kill).  Unbiased: the discarded TEA
    # draws are consumed deterministically and never used.  Primal only.
    k_cand: int = 1
    # In-kernel collision classification (PLAN round 3): a per-subcell
    # conservative sigma upper bound (Ds, Hs, Ws cells over [0,1]^3, chunk
    # rows in VMEM) resolves most NULL events without the XLA sigma row
    # gather: a MAIN candidate with u*sigma_maj >= hi(p) is null (hi >=
    # sigma(p) implies the flat engine decides the same — realization-
    # identical), and a SHADOW collision in an hi == 0 cell multiplies the
    # transmittance by exactly 1.  Classified events continue inside the
    # crossing unroll instead of burning a dispatch + row gather; measured
    # 81% of MAIN nulls at subcell factor 4 on the bench scene
    # (scripts/dev_classify_probe.py).  0 = classification off.
    Ds: int = 0; Hs: int = 0; Ws: int = 0
    # primal in-kernel MAIN escape; part of the spec (not an env read at
    # kernel-trace time) so _make_call's lru_cache cannot serve a stale
    # kernel after the UIVR_ESC env changes in-process
    esc: bool = True
    interpret: bool = False

    @property
    def n_planes(self) -> int:
        if self.adjoint:
            return N_ADJ
        return N_STATE + len(_pre_names(self.k_cand))

    @property
    def n_chunks(self) -> int:
        return -(-self.Dc * self.Hc * self.Wc // 128)

    @property
    def em_chunks(self) -> int:
        return -(-self.em_h * self.em_w_ // 128)

    @property
    def cls_chunks(self) -> int:
        return -(-self.Ds * self.Hs * self.Ws // 128)


class StepTables(NamedTuple):
    maj: jnp.ndarray     # (n_chunks, 128) majorant supergrid, scale folded
    em: jnp.ndarray      # (7*em_chunks, 128): [a_p, a_idx, pmf_s, pmf_a,
    #                      rad_r, rad_g, rad_b] chunk-rows; (1,128) zeros if
    #                      constant emitter
    scal: jnp.ndarray    # (1, 24) SMEM: w2l[0:9], phase_g[9], em_w[10:13],
    #                      do_post[13], em_to_world[14:23]
    sub: jnp.ndarray     # (cls_chunks, 128) per-subcell sigma upper bound
    #                      (scale folded, detached); (1,128) zeros if off


def build_tables(scene: Scene, em_nee=None,
                 cls_dims: Tuple[int, int, int] = None) -> StepTables:
    """``em_nee``: coarse sampling emitter for deferred-radiance NEE — its
    alias channels (4 rows/chunk, NO radiance) become the kernel table.
    ``cls_dims``: subcell classification grid dims (StepSpec.Ds/Hs/Ws)."""
    m = scene.medium
    Tm = int(np.prod(m.majorant_grid.shape))
    nc = -(-Tm // 128)
    maj = jnp.pad(m.majorant_grid.reshape(-1),
                  (0, nc * 128 - Tm)).reshape(nc, 128)
    if cls_dims and int(np.prod(cls_dims)) > 0:
        from ..core.grids import build_bound_grid
        # detached like the majorant (a sampling bound, not differentiated);
        # |.| so hi == 0 certifies sigma(p) == 0 exactly, and a 1e-6 margin
        # keeps hi >= trilinear(sigma) under fp rounding of the interpolant
        # margin must dominate worst-case f32 rounding of the trilinear
        # evaluation (8-term dot product gamma_8 ~ 9.5e-7 plus the weight
        # products): 1e-5 leaves ~6x headroom at negligible classification
        # loss, keeping hi >= computed sigma(p) so a real collision can
        # never classify null
        hi = build_bound_grid(
            jnp.abs(jax.lax.stop_gradient(m.params.sigma_t)), cls_dims)
        hi = hi * (m.scale * jnp.float32(1.00001))
        Ts = int(np.prod(cls_dims))
        sc_ = -(-Ts // 128)
        sub = jnp.pad(hi.reshape(-1), (0, sc_ * 128 - Ts)).reshape(sc_, 128)
    else:
        sub = jnp.zeros((1, 128), jnp.float32)
    w2l = m.world_to_local[:3, :3].reshape(9)
    if isinstance(scene.emitter, EnvmapEmitter):
        e = em_nee if em_nee is not None else scene.emitter
        N = e.flat_data.shape[0]
        enc = -(-N // 128)

        def ch(x):
            return jnp.pad(x, (0, enc * 128 - N)).reshape(enc, 128)

        chans = [ch(e.alias_tab[:, 0]), ch(e.alias_tab[:, 1]),
                 ch(e.alias_tab[:, 2]), ch(e.alias_tab[:, 3])]
        if em_nee is None:
            chans += [ch(e.flat_data[:, 0]), ch(e.flat_data[:, 1]),
                      ch(e.flat_data[:, 2])]
        em = jnp.concatenate(chans, axis=0)
        em_const = jnp.zeros(3, jnp.float32)
        em2w = e.to_world.reshape(9)
    else:
        em = jnp.zeros((1, 128), jnp.float32)
        em_const = scene.emitter.radiance / _INV_FOUR_PI
        em2w = jnp.zeros(9, jnp.float32)
    scal = jnp.concatenate([
        w2l, m.phase_g[None], em_const, jnp.zeros(1, jnp.float32),
        em2w, jnp.zeros(1, jnp.float32)]).reshape(1, 24)
    return StepTables(maj=maj, em=em, scal=scal, sub=sub)


def _chunk_shuffle(ref, idx, base: int = 0, n_chunks: int = None):
    """Gather table[idx] for idx (R, 128) in [0, 128*n_chunks), the table
    stored as chunk rows ``ref[base : base+n_chunks]``: one 128-lane shuffle
    + select per chunk row (the only gather Mosaic lowers here)."""
    if n_chunks is None:
        n_chunks = ref.shape[0]
    local = idx & 127
    chunk = idx >> 7
    out = jnp.zeros(idx.shape, jnp.float32)
    for c in range(n_chunks):
        g = jnp.take_along_axis(
            jnp.broadcast_to(ref[base + c:base + c + 1, :], idx.shape),
            local, axis=1)
        out = jnp.where(chunk == c, g, out)
    return out


def _step_kernel(spec: StepSpec, scal_ref, maj_ref, em_ref, sub_ref, *refs):
    KC = spec.k_cand
    sig_refs = refs[:4 * KC]
    refs = refs[4 * KC:]
    planes = _state_names(spec)
    out_names = planes + (_scatter_outs(spec.tgs) if spec.adjoint else ())
    np_ = spec.n_planes
    v = {k: r[...] for k, r in zip(planes, refs[:np_])}
    outs = dict(zip(out_names, refs[np_:]))

    g = scal_ref[0, 9]
    em_w = (scal_ref[0, 10], scal_ref[0, 11], scal_ref[0, 12])
    do_post = scal_ref[0, 13] > 0.5

    def w2l_mul(x, y, z):
        return (scal_ref[0, 0] * x + scal_ref[0, 1] * y + scal_ref[0, 2] * z,
                scal_ref[0, 3] * x + scal_ref[0, 4] * y + scal_ref[0, 5] * z,
                scal_ref[0, 6] * x + scal_ref[0, 7] * y + scal_ref[0, 8] * z)

    h = v["h"]
    dim = v["dim"]

    def draw(consume):
        nonlocal dim
        bits, _ = tea_i32(h, dim, _DRAW_ROUNDS)
        dim = dim + consume.astype(jnp.int32)
        return _unit_float(bits)

    def exit_dist(ox_, oy_, oz_, dx_, dy_, dz_):
        """volpathsimple._exit_dist (slab far-plane from inside [0,1]^3)."""
        def ax(o, dd):
            sd = jnp.where(jnp.abs(dd) < 1e-20,
                           jnp.where(dd >= 0, 1e-20, -1e-20), dd)
            inv = 1.0 / sd
            return jnp.maximum((0.0 - o) * inv, (1.0 - o) * inv)
        return jnp.minimum(jnp.minimum(ax(ox_, dx_), ax(oy_, dy_)),
                           ax(oz_, dz_))

    # =================== POST: apply events of step i ======================
    mode = v["mode"]
    is_main = mode == MAIN
    is_sh = mode == SHADOW
    if spec.adjoint:
        is_rp = mode == REPLAY
        walking = is_main | is_sh | is_rp
    else:
        is_rp = jnp.zeros_like(is_main)
        walking = is_main | is_sh
    wmax = jnp.where(is_main, v["maxt"], v["shtmax"])
    wt = jnp.where(is_main, v["t"], v["sht"])
    if spec.adjoint:
        wt = jnp.where(is_rp, v["rpt"], wt)

    post = jnp.broadcast_to(do_post, mode.shape)
    if KC == 1:
        t_cand, t_exit = v["tcand"], v["texit"]
        sigma_maj, u_evt = v["smaj"], v["uevt"]
        sig = sig_refs[0][...]
        alb0 = sig_refs[1][...]
        alb1 = sig_refs[2][...]
        alb2 = sig_refs[3][...]
        px, py, pz = v["px"], v["py"], v["pz"]
        shtr_in = v["shtr"]
    else:
        # ---- phase 0: resolve the K-candidate batch to ONE presented event.
        # MAIN null collisions are no-ops (t advance only) and SHADOW null
        # collisions only multiply the transmittance, so the batch reduces
        # to: apply intermediate shadow multiplies (+ shadow RR) here, then
        # present the TERMINAL candidate (first real scatter / segment end /
        # crossing / RR kill — else the last null) to the unchanged
        # single-event code below.  Candidates past the terminal are
        # discarded (their TEA draws were consumed deterministically in
        # pass A and never used — unbiased).
        alive_m = post & is_main
        alive_s = post & is_sh
        shtr_run = v["shtr"]
        z0 = jnp.zeros_like(v["t"])
        p_px = p_py = p_pz = p_tc = p_tx = p_sm = p_ue = z0
        p_sig = p_a0 = p_a1 = p_a2 = z0
        found_sel = jnp.zeros_like(is_main)
        for j in range(KC):
            kind_j = v[f"kind{j}"]
            coll = kind_j == 1.0
            term_j = (kind_j == 2.0) | (kind_j == 3.0)
            sig_j = sig_refs[4 * j][...]
            sm_j = v[f"smaj{j}"]
            ue_j = v[f"uevt{j}"]
            r_j = jnp.where(sm_j > 0.0,
                            sig_j / jnp.maximum(sm_j, 1e-20), 0.0)
            ratio_j = jnp.maximum(1.0 - r_j, 0.0)
            real_j = alive_m & coll & (ue_j < r_j)
            sc = alive_s & coll
            shtr_new = jnp.where(sc, shtr_run * ratio_j, shtr_run)
            if spec.shadow_rr > 0.0:
                sh_tail = sc & (shtr_new < spec.shadow_rr) & (shtr_new > 0.0)
                q_sh = shtr_new * jnp.float32(1.0 / spec.shadow_rr)
                shtr_new = jnp.where(
                    sh_tail,
                    jnp.where(ue_j < q_sh,
                              jnp.float32(spec.shadow_rr), 0.0),
                    shtr_new)
            killed_j = sc & (shtr_new <= 0.0)
            shtr_run = shtr_new
            take_j = (alive_m | alive_s) & (coll | term_j) & ~found_sel
            is_term = (real_j | killed_j
                       | ((alive_m | alive_s) & term_j))

            def selp(nm, cur, _j=j, _t=take_j):
                return jnp.where(_t, v[f"{nm}{_j}"], cur)

            p_px, p_py, p_pz = (selp("px", p_px), selp("py", p_py),
                                selp("pz", p_pz))
            p_tc, p_tx = selp("tcand", p_tc), selp("texit", p_tx)
            p_sm, p_ue = selp("smaj", p_sm), selp("uevt", p_ue)
            p_sig = jnp.where(take_j, sig_j, p_sig)
            p_a0 = jnp.where(take_j, sig_refs[4 * j + 1][...], p_a0)
            p_a1 = jnp.where(take_j, sig_refs[4 * j + 2][...], p_a1)
            p_a2 = jnp.where(take_j, sig_refs[4 * j + 3][...], p_a2)
            found_sel = found_sel | (take_j & is_term)
            alive_m = alive_m & ~(real_j | term_j)
            alive_s = alive_s & ~(term_j | killed_j)
        t_cand, t_exit = p_tc, p_tx
        sigma_maj, u_evt = p_sm, p_ue
        # shadow multiplies are pre-applied: zero sigma makes the legacy
        # ratio multiply a no-op, and shtr_in < rr-threshold can't re-fire
        # the RR branch (survivors sit exactly AT the threshold)
        sig = jnp.where(is_sh, 0.0, p_sig)
        alb0, alb1, alb2 = p_a0, p_a1, p_a2
        px, py, pz = p_px, p_py, p_pz
        shtr_in = shtr_run
    bound = jnp.minimum(t_exit, wmax)
    collided = post & walking & (t_cand < bound)
    fin_seg = post & walking & (~(t_cand < bound)) & (t_exit >= wmax)
    crossed = post & walking & (~(t_cand < bound)) & (t_exit < wmax)
    t_next = jnp.where(collided, t_cand, jnp.where(crossed, t_exit, wt))

    r = jnp.where(sigma_maj > 0.0, sig / jnp.maximum(sigma_maj, 1e-20), 0.0)
    ratio = jnp.maximum(1.0 - r, 0.0)

    # ---- SHADOW walk (volpath_flat.py:209-218) ---------------------------
    sh_coll = is_sh & collided
    shtr = jnp.where(sh_coll, shtr_in * ratio, shtr_in)
    if spec.shadow_rr > 0.0:
        # RR on low-transmittance walks (VolpathConfig.shadow_rr); reuses
        # the shadow-lane u_evt draw, q detached — same as the flat engine
        sh_tail = sh_coll & (shtr < spec.shadow_rr) & (shtr > 0.0)
        q_sh = shtr * jnp.float32(1.0 / spec.shadow_rr)
        shtr = jnp.where(sh_tail,
                         jnp.where(u_evt < q_sh,
                                   jnp.float32(spec.shadow_rr), 0.0), shtr)
    sht = jnp.where(post & is_sh, t_next, v["sht"])
    sh_done = post & is_sh & (fin_seg | (shtr <= 0.0))
    post_main = (v["flags"] & FL_POST) != 0
    if spec.adjoint:
        # PRB: subtract the completed NEE contribution and schedule its
        # REPLAY transmittance re-walk (volpath_flat.py:582-591); walks
        # with zero contribution (shadow-RR kills) carry no cotangent and
        # skip the replay entirely
        res0 = v["res0"] - jnp.where(sh_done, v["shb0"] * shtr, 0.0)
        res1 = v["res1"] - jnp.where(sh_done, v["shb1"] * shtr, 0.0)
        res2 = v["res2"] - jnp.where(sh_done, v["shb2"] * shtr, 0.0)
        contrib_nz = (jnp.abs(v["shb0"] * shtr) + jnp.abs(v["shb1"] * shtr)
                      + jnp.abs(v["shb2"] * shtr)) > 0.0
        mode = jnp.where(sh_done,
                         jnp.where(contrib_nz, REPLAY,
                                   jnp.where(post_main, MAIN, DONE)), mode)
    else:
        res0 = v["res0"] + jnp.where(sh_done, v["shb0"] * shtr, 0.0)
        res1 = v["res1"] + jnp.where(sh_done, v["shb1"] * shtr, 0.0)
        res2 = v["res2"] + jnp.where(sh_done, v["shb2"] * shtr, 0.0)
        mode = jnp.where(sh_done, jnp.where(post_main, MAIN, DONE), mode)

    # ---- MAIN walk (volpath_flat.py:221-246) -----------------------------
    real = is_main & collided & (u_evt < r)
    m_escape = post & is_main & fin_seg
    t = jnp.where(post & is_main, t_next, v["t"])
    flags = v["flags"] | jnp.where(m_escape, FL_ESC, 0)
    mode = jnp.where(m_escape, DONE, mode)

    thr0 = jnp.where(real, v["thr0"] * alb0, v["thr0"])
    thr1 = jnp.where(real, v["thr1"] * alb1, v["thr1"])
    thr2 = jnp.where(real, v["thr2"] * alb2, v["thr2"])
    depth = jnp.where(real, v["depth"] + 1, v["depth"])
    die_depth = real & (depth >= spec.max_depth)
    mode = jnp.where(die_depth, DONE, mode)
    scat = real & ~die_depth

    u_rr = draw(real)
    perform_rr = scat & (depth > spec.rr_depth)
    q = jnp.minimum(jnp.maximum(jnp.maximum(thr0, thr1), thr2), 0.99)
    rr_dead = perform_rr & (u_rr >= q)
    qs = jnp.maximum(q, 1e-8)
    thr0 = jnp.where(perform_rr, thr0 / qs, thr0)
    thr1 = jnp.where(perform_rr, thr1 / qs, thr1)
    thr2 = jnp.where(perform_rr, thr2 / qs, thr2)
    mode = jnp.where(rr_dead, DONE, mode)
    scat = scat & ~rr_dead

    # ---- phase sampling (scene/phase.py port, pre-update incident dir) ---
    u_p1 = draw(scat)
    u_p2 = draw(scat)
    dwx, dwy, dwz = v["dwx"], v["dwy"], v["dwz"]

    if spec.phase_iso:
        cos_theta = 1.0 - 2.0 * u_p1
        ph_pdf = jnp.full_like(u_p1, _INV_FOUR_PI)
    else:
        # guarded HG (phase.py:phase_sample): g may be a TRACED zero (scene
        # finalized in-jit), so the 1/(2g) division must be masked or it
        # poisons every scattered lane with NaN directions
        iso_g = jnp.abs(g) < 1e-4
        g_s = jnp.where(iso_g, jnp.float32(0.5), g)
        g2s = g_s * g_s
        sqr = (1.0 - g2s) / (1.0 - g_s + 2.0 * g_s * u_p1)
        cos_theta = jnp.where(
            iso_g, 1.0 - 2.0 * u_p1,
            jnp.clip((1.0 + g2s - sqr * sqr) / (2.0 * g_s), -1.0, 1.0))
        g2 = g * g
        den = 1.0 + g2 - 2.0 * g * cos_theta
        ph_pdf = jnp.where(
            iso_g, jnp.full_like(u_p1, _INV_FOUR_PI),
            jnp.float32(_INV_FOUR_PI) * (1.0 - g2) / jnp.maximum(
                den * jnp.sqrt(jnp.maximum(den, 1e-12)), 1e-12))
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = jnp.float32(2.0 * np.pi) * u_p2
    sign = jnp.where(dwz >= 0.0, jnp.float32(1.0), jnp.float32(-1.0))
    a_ = -1.0 / (sign + dwz)
    b_ = dwx * dwy * a_
    cp = sin_theta * jnp.cos(phi)
    sp = sin_theta * jnp.sin(phi)
    wox = cp * (1.0 + sign * dwx * dwx * a_) + sp * b_ + cos_theta * dwx
    woy = cp * (sign * b_) + sp * (sign + dwy * dwy * a_) + cos_theta * dwy
    woz = cp * (-sign * dwx) + sp * (-dwy) + cos_theta * dwz
    # exact-match normalization (scene/phase.py uses norm-then-divide)
    nrm = jnp.sqrt(wox * wox + woy * woy + woz * woz)
    wox, woy, woz = wox / nrm, woy / nrm, woz / nrm

    dwx_n = jnp.where(scat, wox, dwx)
    dwy_n = jnp.where(scat, woy, dwy)
    dwz_n = jnp.where(scat, woz, dwz)
    nlx, nly, nlz = w2l_mul(wox, woy, woz)
    dlx = jnp.where(scat, nlx, v["dlx"])
    dly = jnp.where(scat, nly, v["dly"])
    dlz = jnp.where(scat, nlz, v["dlz"])
    lpdf = jnp.where(scat, ph_pdf, v["lpdf"])
    flags = flags | jnp.where(scat, FL_SCAT, 0)

    ox = jnp.where(scat, px, v["ox"])
    oy = jnp.where(scat, py, v["oy"])
    oz = jnp.where(scat, pz, v["oz"])
    cont_maxt = exit_dist(ox, oy, oz, dlx, dly, dlz)
    maxt = jnp.where(scat, cont_maxt, v["maxt"])
    t = jnp.where(scat, 0.0, t)
    acc_escape = scat & (cont_maxt <= 1e-7)
    resume_main = ~acc_escape

    # ---- NEE direction sampling (emitters.py sample_direction port) ------
    # shtex < 0 = no pending deferred-radiance multiply (see StepSpec.em_fh)
    shtex_n = jnp.full_like(v["shtex"], -1)
    if spec.use_nee:
        u_e1 = draw(scat)
        u_e2 = draw(scat)
        if spec.emitter_kind == "envmap":
            # Walker alias sampling (emitters.py:119-147): 7 chunk-shuffled
            # table reads (4 alias channels at `slot`, radiance at `texel`).
            He, We = spec.em_h, spec.em_w_
            N = He * We
            nc = spec.em_chunks
            scaled = u_e1 * N
            slot = jnp.clip(scaled.astype(jnp.int32), 0, N - 1)
            frac = scaled - slot.astype(jnp.float32)
            a_p = _chunk_shuffle(em_ref, slot, 0 * nc, nc)
            a_idx = _chunk_shuffle(em_ref, slot, 1 * nc, nc)
            pmf_s = _chunk_shuffle(em_ref, slot, 2 * nc, nc)
            pmf_a = _chunk_shuffle(em_ref, slot, 3 * nc, nc)
            keep = frac < a_p
            texel = jnp.where(keep, slot, a_idx.astype(jnp.int32))
            pmf = jnp.where(keep, pmf_s, pmf_a)
            row = texel // We
            col = texel - row * We
            ue = (col.astype(jnp.float32) + u_e2) / We
            dv = jnp.where(keep, frac / jnp.maximum(a_p, 1e-20),
                           (frac - a_p) / jnp.maximum(1.0 - a_p, 1e-20))
            ve = (row.astype(jnp.float32)
                  + jnp.clip(dv, 0.0, 1.0 - 1e-6)) / He
            phie = ue * jnp.float32(2.0 * np.pi)
            thetae = ve * jnp.float32(np.pi)
            st_ = jnp.sin(thetae)
            dlx_e = st_ * jnp.cos(phie)
            dly_e = jnp.cos(thetae)
            dlz_e = st_ * jnp.sin(phie)
            # world dir = em_to_world @ dl
            dsx = (scal_ref[0, 14] * dlx_e + scal_ref[0, 15] * dly_e
                   + scal_ref[0, 16] * dlz_e)
            dsy = (scal_ref[0, 17] * dlx_e + scal_ref[0, 18] * dly_e
                   + scal_ref[0, 19] * dlz_e)
            dsz = (scal_ref[0, 20] * dlx_e + scal_ref[0, 21] * dly_e
                   + scal_ref[0, 22] * dlz_e)
            sin_t = jnp.sin(jnp.clip(ve, 1e-4, 1.0 - 1e-4)
                            * jnp.float32(np.pi))
            ds_pdf = (pmf * N) / (jnp.float32(2.0 * np.pi * np.pi) * sin_t)
            inv_pdf = jnp.where(ds_pdf > 0.0,
                                1.0 / jnp.maximum(ds_pdf, 1e-20), 0.0)
            nee_ok = scat & (ds_pdf > 0.0)
            if spec.em_fh:
                # deferred radiance: emit the FULL-RES texel under (ue, ve);
                # the step wrapper multiplies flat_data[texel] into shb
                colf = jnp.minimum((ue * spec.em_fw).astype(jnp.int32),
                                   spec.em_fw - 1)
                rowf = jnp.minimum((ve * spec.em_fh).astype(jnp.int32),
                                   spec.em_fh - 1)
                shtex_n = jnp.where(nee_ok, rowf * spec.em_fw + colf, -1)
                ew0 = ew1 = ew2 = inv_pdf
            else:
                val0 = _chunk_shuffle(em_ref, texel, 4 * nc, nc)
                val1 = _chunk_shuffle(em_ref, texel, 5 * nc, nc)
                val2 = _chunk_shuffle(em_ref, texel, 6 * nc, nc)
                ew0 = val0 * inv_pdf
                ew1 = val1 * inv_pdf
                ew2 = val2 * inv_pdf
        else:
            zdir = 1.0 - 2.0 * u_e1
            rr_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - zdir * zdir))
            phie = jnp.float32(2.0 * np.pi) * u_e2
            dsx = rr_ * jnp.cos(phie)
            dsy = zdir
            dsz = rr_ * jnp.sin(phie)
            ds_pdf = jnp.full_like(u_e1, _INV_FOUR_PI)
            ew0 = jnp.full_like(u_e1, 1.0) * em_w[0]
            ew1 = jnp.full_like(u_e1, 1.0) * em_w[1]
            ew2 = jnp.full_like(u_e1, 1.0) * em_w[2]
            nee_ok = scat                   # constant-emitter pdf > 0
        cth = dwx * dsx + dwy * dsy + dwz * dsz
        if spec.phase_iso:
            phv = jnp.full_like(cth, _INV_FOUR_PI)
        else:
            g2 = g * g
            den = 1.0 + g2 - 2.0 * g * cth
            phv = jnp.where(                       # phase.py:phase_eval guard
                jnp.abs(g) < 1e-4, jnp.full_like(cth, _INV_FOUR_PI),
                jnp.float32(_INV_FOUR_PI) * (1.0 - g2) / jnp.maximum(
                    den * jnp.sqrt(jnp.maximum(den, 1e-12)), 1e-12))
        a2 = ds_pdf * ds_pdf
        wmis = jnp.where(ds_pdf > 0.0,
                         a2 / jnp.maximum(a2 + phv * phv, 1e-30), 0.0)
        sdx, sdy, sdz = w2l_mul(dsx, dsy, dsz)
        base = phv * wmis

        shdx = jnp.where(nee_ok, sdx, v["shdx"])
        shdy = jnp.where(nee_ok, sdy, v["shdy"])
        shdz = jnp.where(nee_ok, sdz, v["shdz"])
        shtmax = jnp.where(nee_ok, exit_dist(ox, oy, oz, sdx, sdy, sdz),
                           v["shtmax"])
        shb0 = jnp.where(nee_ok, thr0 * base * ew0, v["shb0"])
        shb1 = jnp.where(nee_ok, thr1 * base * ew1, v["shb1"])
        shb2 = jnp.where(nee_ok, thr2 * base * ew2, v["shb2"])
        sht = jnp.where(nee_ok, 0.0, sht)
        shtr = jnp.where(nee_ok, 1.0, shtr)
        flags = jnp.where(scat,
                          jnp.where(resume_main, flags | FL_POST,
                                    flags & ~FL_POST), flags)
        mode = jnp.where(nee_ok, SHADOW,
                         jnp.where(scat & ~nee_ok,
                                   jnp.where(resume_main, MAIN, DONE), mode))
    else:
        shdx, shdy, shdz = v["shdx"], v["shdy"], v["shdz"]
        shtmax = v["shtmax"]
        shb0, shb1, shb2 = v["shb0"], v["shb1"], v["shb2"]
        mode = jnp.where(scat, jnp.where(resume_main, MAIN, DONE), mode)

    # ============ ADJOINT: cotangents + replay bookkeeping ================
    # (volpath_flat.sample_adjoint body, lines 540-611; scatter-adds are
    # emitted as output planes and applied by the XLA side)
    if spec.adjoint:
        adj0, adj1, adj2 = v["adj0"], v["adj1"], v["adj2"]
        alth = v["alth"]
        altd = v["altd"]

        def draw_alt(consume):
            nonlocal altd
            bits, _ = tea_i32(alth, altd, _DRAW_ROUNDS)
            altd = altd + consume.astype(jnp.int32)
            return _unit_float(bits)

        # ---- free-flight/MIS in-scattering gradients ----------------------
        if (not spec.use_drt) or spec.use_drt_mis:
            if spec.use_drt and spec.use_drt_mis:
                wf = sig / (1.0 + sig * sig)
            else:
                wf = 1.0 / jnp.maximum(sig, 1e-8)
            b0_ = adj0 * (v["res0"] / jnp.maximum(alb0, 1e-8)) * wf
            b1_ = adj1 * (v["res1"] / jnp.maximum(alb1, 1e-8)) * wf
            b2_ = adj2 * (v["res2"] / jnp.maximum(alb2, 1e-8)) * wf

            def msk(x):
                return jnp.where(real, x, 0.0)

            sc_sig = msk(b0_ * alb0 + b1_ * alb1 + b2_ * alb2)
            sc_a0 = msk(b0_ * sig)
            sc_a1 = msk(b1_ * sig)
            sc_a2 = msk(b2_ * sig)
        else:
            sc_sig = jnp.zeros_like(sig)
            sc_a0 = sc_a1 = sc_a2 = sc_sig

        seg_end = real | m_escape

        # ---- DRT reservoir update (volpathsimple._reservoir_update) -------
        if spec.use_drt and spec.use_drt_sub:
            u_res = draw_alt(seg_end)
            w0 = jnp.where(seg_end, v["thr0"], 0.0)
            w1 = jnp.where(seg_end, v["thr1"], 0.0)
            w2 = jnp.where(seg_end, v["thr2"], 0.0)
            rw0 = v["rw0"] + w0
            rw1 = v["rw1"] + w1
            rw2 = v["rw2"] + w2

            def rshare(wc, wsc):
                return jnp.where(wsc > 0, wc / jnp.maximum(wsc, 1e-30), 0.0)

            rratio = (rshare(w0, rw0) + rshare(w1, rw1)
                      + rshare(w2, rw2)) * jnp.float32(1.0 / 3.0)
            change = seg_end & (u_res <= rratio)

            def rsel(new, old):
                return jnp.where(change, new, old)

            rc0 = rsel(w0, v["rc0"])
            rc1 = rsel(w1, v["rc1"])
            rc2 = rsel(w2, v["rc2"])
            rvdepth = rsel(v["depth"], v["rvdepth"])
            rvo0 = rsel(v["ox"], v["rvo0"])
            rvo1 = rsel(v["oy"], v["rvo1"])
            rvo2 = rsel(v["oz"], v["rvo2"])
            rvl0 = rsel(v["dlx"], v["rvl0"])
            rvl1 = rsel(v["dly"], v["rvl1"])
            rvl2 = rsel(v["dlz"], v["rvl2"])
            rvw0 = rsel(v["dwx"], v["rvw0"])
            rvw1 = rsel(v["dwy"], v["rvw1"])
            rvw2 = rsel(v["dwz"], v["rvw2"])
            rvmaxt = rsel(v["maxt"], v["rvmaxt"])
            rvact = v["rvact"] | change.astype(jnp.int32)
        else:
            rw0, rw1, rw2 = v["rw0"], v["rw1"], v["rw2"]
            rc0, rc1, rc2 = v["rc0"], v["rc1"], v["rc2"]
            rvdepth, rvmaxt, rvact = v["rvdepth"], v["rvmaxt"], v["rvact"]
            rvo0, rvo1, rvo2 = v["rvo0"], v["rvo1"], v["rvo2"]
            rvl0, rvl1, rvl2 = v["rvl0"], v["rvl1"], v["rvl2"]
            rvw0, rvw1, rvw2 = v["rvw0"], v["rvw1"], v["rvw2"]

        # ---- transmittance gradients (volpath_flat.py:573-580) ------------
        interval = jnp.where(m_escape, v["maxt"], t_cand)
        adj_w = adj0 * v["res0"] + adj1 * v["res1"] + adj2 * v["res2"]
        inv_pdf = interval * jnp.float32(1.0 / max(spec.tgs, 1))
        trans_rec = []
        for _k in range(spec.tgs):
            u_t = draw_alt(seg_end)
            ut_i = u_t * interval
            trans_rec.append((
                jnp.where(seg_end, -adj_w * inv_pdf, 0.0),
                v["ox"] + ut_i * v["dlx"],
                v["oy"] + ut_i * v["dly"],
                v["oz"] + ut_i * v["dlz"]))

        # ---- shadow completion -> replay scheduling -----------------------
        contrib0 = v["shb0"] * shtr
        contrib1 = v["shb1"] * shtr
        contrib2 = v["shb2"] * shtr
        sha0 = jnp.where(sh_done, adj0 * contrib0, v["sha0"])
        sha1 = jnp.where(sh_done, adj1 * contrib1, v["sha1"])
        sha2 = jnp.where(sh_done, adj2 * contrib2, v["sha2"])
        rpdim = jnp.where(sh_done, v["shdim0"], v["rpdim"])
        rpt = jnp.where(sh_done, 0.0, v["rpt"])
        rptr = jnp.where(sh_done, 1.0, v["rptr"])

        # ---- REPLAY walk: transmittance cotangent at each null collision --
        rp_coll = is_rp & collided
        sigma_n = jnp.maximum(sigma_maj - sig, 1e-8)
        rp_cot = jnp.where(rp_coll & (ratio > 0.0),
                           -(v["sha0"] + v["sha1"] + v["sha2"]) / sigma_n,
                           0.0)
        sc_sig = sc_sig + rp_cot        # same point p: fused row scatter
        rptr = jnp.where(rp_coll, rptr * ratio, rptr)
        if spec.shadow_rr > 0.0:
            # mirror the primal shadow-RR decision (same u_evt realization)
            rp_tail = rp_coll & (rptr < spec.shadow_rr) & (rptr > 0.0)
            q_rp = rptr * jnp.float32(1.0 / spec.shadow_rr)
            rptr = jnp.where(rp_tail,
                             jnp.where(u_evt < q_rp,
                                       jnp.float32(spec.shadow_rr), 0.0),
                             rptr)
        rpt = jnp.where(is_rp, t_next, rpt)
        rpdim = jnp.where(is_rp, rpdim + 2, rpdim)
        rp_fin = is_rp & (fin_seg | (rptr <= 0.0))
        mode = jnp.where(rp_fin, jnp.where(post_main, MAIN, DONE), mode)

        # ---- snapshot primary counter at shadow-walk start ----------------
        shdim0 = jnp.where(scat, dim, v["shdim0"])

    # =================== PRE: candidate for step i+1 =======================
    n_main = mode == MAIN
    n_sh = mode == SHADOW
    n_walk = n_main | n_sh
    if spec.adjoint:
        n_rp = mode == REPLAY
        n_walk = n_walk | n_rp
    wdx = jnp.where(n_main, dlx, shdx)
    wdy = jnp.where(n_main, dly, shdy)
    wdz = jnp.where(n_main, dlz, shdz)
    nwt = jnp.where(n_main, t, sht)
    if spec.adjoint:
        nwt = jnp.where(n_rp, rpt, nwt)
    n_wmax = jnp.where(n_main, maxt, shtmax)

    def cell_axis(o, dd, nres, te_):
        pw = o + te_ * dd
        return jnp.clip(jnp.floor(jnp.clip(pw, 0.0, 1.0 - 1e-7) * nres),
                        0.0, nres - 1.0)

    def exit_axis(c, nres, o, dd):
        lo = c / nres
        hi = (c + 1.0) / nres
        sd = jnp.where(jnp.abs(dd) < 1e-20,
                       jnp.where(dd >= 0, 1e-20, -1e-20), dd)
        return jnp.maximum((lo - o) / sd, (hi - o) / sd)

    # Crossing unroll (see StepSpec.cross_steps): each sub-iteration mirrors
    # exactly one flat-engine step; lanes that found a candidate (or a
    # terminal segment end) stop, crossers advance to the supercell exit.
    # With k_cand > 1 (StepSpec.k_cand) the whole unroll repeats per
    # candidate, walking forward null-assumed: a candidate collision does
    # not change the walk unless it turns out real, which POST resolves
    # next dispatch.  Emission stops at a segment end / crossing budget.
    #
    # Classification (StepSpec.Ds): candidate collisions whose event is
    # decided by the per-subcell sigma bound alone (MAIN null via
    # u*smaj >= hi; SHADOW ratio factor exactly 1 via hi == 0) CONTINUE in
    # the unroll like crossings, consuming the identical draws — the flat
    # engine reaches the same decision from sigma(p) <= hi, so the
    # realization is unchanged but the event costs no dispatch/row-gather.
    # Primal MAIN segment ends (escape) also resolve in-kernel: POST's only
    # action for them is flags|=ESC, mode=DONE (the adjoint keeps them in
    # POST for reservoir/transmittance-gradient processing).
    use_cls = spec.Ds > 0 and KC == 1
    use_esc = spec.esc and (not spec.adjoint) and KC == 1
    stopped = ~n_walk
    zf = jnp.zeros_like(nwt)
    esc_acc = jnp.zeros_like(n_walk)
    cand_rec = []
    CS = max(spec.cross_steps, 1)
    for kc in range(KC):
        found = stopped
        n_smaj, n_texit, n_tcand, n_uevt = zf, zf, zf, zf
        n_kind = zf
        for k in range(CS):
            last = k == CS - 1
            active = n_walk & ~found
            eps = jnp.float32(1e-5) * (1.0 + jnp.abs(nwt))
            te = nwt + eps
            cx = cell_axis(ox, wdx, float(spec.Wc), te)
            cy = cell_axis(oy, wdy, float(spec.Hc), te)
            cz = cell_axis(oz, wdz, float(spec.Dc), te)
            midx = ((cz.astype(jnp.int32) * spec.Hc + cy.astype(jnp.int32))
                    * spec.Wc + cx.astype(jnp.int32))
            smaj_k = _chunk_shuffle(maj_ref, midx)
            texit_k = jnp.maximum(jnp.minimum(
                jnp.minimum(exit_axis(cx, float(spec.Wc), ox, wdx),
                            exit_axis(cy, float(spec.Hc), oy, wdy)),
                exit_axis(cz, float(spec.Dc), oz, wdz)), te)

            if spec.adjoint:
                consume = active & (n_main | n_sh)
                u_step = draw(consume)
                uevt_k = draw(consume)
                rb1, _ = tea_i32(h, rpdim, _DRAW_ROUNDS)
                rb2, _ = tea_i32(h, rpdim + 1, _DRAW_ROUNDS)
                u_step = jnp.where(n_rp, _unit_float(rb1), u_step)
                uevt_k = jnp.where(n_rp, _unit_float(rb2), uevt_k)
            else:
                consume = active
                u_step = draw(consume)
                uevt_k = draw(consume)
            stp = jnp.where(smaj_k > 0.0,
                            -jnp.log1p(-u_step) / jnp.maximum(smaj_k, 1e-20),
                            _BIG)
            tcand_k = nwt + stp
            bound = jnp.minimum(texit_k, n_wmax)
            hit = tcand_k < bound
            cross = (~hit) & (texit_k < n_wmax)
            if use_cls and not last:
                # subcell sigma bound at the candidate point: one chunk
                # shuffle (cls_chunks rounds); classified events continue
                # like crossings but advance to the candidate position
                pcx = jnp.clip(ox + tcand_k * wdx, 0.0, 1.0 - 1e-7)
                pcy = jnp.clip(oy + tcand_k * wdy, 0.0, 1.0 - 1e-7)
                pcz = jnp.clip(oz + tcand_k * wdz, 0.0, 1.0 - 1e-7)
                scx = (pcx * float(spec.Ws)).astype(jnp.int32)
                scy = (pcy * float(spec.Hs)).astype(jnp.int32)
                scz = (pcz * float(spec.Ds)).astype(jnp.int32)
                sidx = (scz * spec.Hs + scy) * spec.Ws + scx
                hi_k = _chunk_shuffle(sub_ref, sidx, 0, spec.cls_chunks)
                cls = hit & ((n_main & (uevt_k * smaj_k >= hi_k))
                             | (n_sh & (hi_k <= 0.0)))
            else:
                cls = jnp.zeros_like(hit)
            if use_esc:
                esc_now = active & (~hit) & (~cross) & n_main
                esc_acc = esc_acc | esc_now
            else:
                esc_now = jnp.zeros_like(hit)
            stop_now = ((active & ~esc_now) if last
                        else (active & ~cross & ~cls & ~esc_now))
            n_smaj = jnp.where(stop_now, smaj_k, n_smaj)
            n_texit = jnp.where(stop_now, texit_k, n_texit)
            n_tcand = jnp.where(stop_now, tcand_k, n_tcand)
            n_uevt = jnp.where(stop_now, uevt_k, n_uevt)
            n_kind = jnp.where(
                stop_now,
                jnp.where(hit, 1.0, jnp.where(cross, 3.0, 2.0)), n_kind)
            if not last:
                adv = active & cross & ~esc_now
                adv_cls = active & cls & ~esc_now
                nwt = jnp.where(adv_cls, tcand_k,
                                jnp.where(adv, texit_k, nwt))
                if spec.adjoint:
                    rpdim = jnp.where((adv | adv_cls) & n_rp, rpdim + 2,
                                      rpdim)
            found = found | stop_now | esc_now
        cand_rec.append(dict(
            px=ox + n_tcand * wdx, py=oy + n_tcand * wdy,
            pz=oz + n_tcand * wdz, tcand=n_tcand, texit=n_texit,
            smaj=n_smaj, uevt=n_uevt, kind=n_kind))
        if kc < KC - 1:
            # null-assumed continuation for emitted collisions; segment
            # ends and unresolved crossings stop the batch for this lane
            nwt = jnp.where((n_kind == 1.0) & ~stopped, n_tcand, nwt)
            stopped = stopped | (n_kind >= 2.0)

    # commit the crossing advances to the per-walk positions so POST's
    # recomputed wt agrees with the recorded candidate
    t = jnp.where(n_main, nwt, t)
    sht = jnp.where(n_sh, nwt, sht)
    if spec.adjoint:
        rpt = jnp.where(n_rp, nwt, rpt)
    if use_esc:
        # primal MAIN escapes resolved in-kernel (POST's m_escape action)
        mode = jnp.where(esc_acc, DONE, mode)
        flags = flags | jnp.where(esc_acc, FL_ESC, 0)

    out_vals = dict(
        ox=ox, oy=oy, oz=oz, dlx=dlx, dly=dly, dlz=dlz,
        dwx=dwx_n, dwy=dwy_n, dwz=dwz_n, t=t, maxt=maxt,
        thr0=thr0, thr1=thr1, thr2=thr2, res0=res0, res1=res1, res2=res2,
        lpdf=lpdf, shdx=shdx, shdy=shdy, shdz=shdz, sht=sht,
        shtmax=shtmax, shtr=shtr, shb0=shb0, shb1=shb1, shb2=shb2,
        mode=mode, depth=depth, flags=flags, h=h, dim=dim, shtex=shtex_n)
    if KC == 1:
        c0 = cand_rec[0]
        out_vals.update(px=c0["px"], py=c0["py"], pz=c0["pz"],
                        tcand=c0["tcand"], texit=c0["texit"],
                        smaj=c0["smaj"], uevt=c0["uevt"])
    else:
        for j, cj in enumerate(cand_rec):
            for nm, val in cj.items():
                out_vals[f"{nm}{j}"] = val
    if spec.adjoint:
        out_vals.update(
            rpt=rpt, rptr=rptr, sha0=sha0, sha1=sha1, sha2=sha2,
            adj0=adj0, adj1=adj1, adj2=adj2,
            rw0=rw0, rw1=rw1, rw2=rw2, rc0=rc0, rc1=rc1, rc2=rc2,
            rvo0=rvo0, rvo1=rvo1, rvo2=rvo2,
            rvl0=rvl0, rvl1=rvl1, rvl2=rvl2,
            rvw0=rvw0, rvw1=rvw1, rvw2=rvw2, rvmaxt=rvmaxt,
            alth=alth, altd=altd, rpdim=rpdim, shdim0=shdim0,
            rvdepth=rvdepth, rvact=rvact,
            sc_sig=sc_sig, sc_a0=sc_a0, sc_a1=sc_a1, sc_a2=sc_a2)
        for _k, (tc, tx, ty, tz) in enumerate(trans_rec):
            out_vals[f"tc{_k}"] = tc
            out_vals[f"tsx{_k}"] = tx
            out_vals[f"tsy{_k}"] = ty
            out_vals[f"tsz{_k}"] = tz
    for k in out_names:
        outs[k][...] = out_vals[k]


@functools.lru_cache(maxsize=64)
def _make_call(spec: StepSpec):
    assert not (spec.adjoint and spec.k_cand != 1), \
        "K-candidate batching is primal-only (adjoint scatter outs are 1-K)"
    # Row-slab grid: the state (39+ planes x R x 128 f32) exceeds the
    # scoped-VMEM window budget at full wavefront width, so each grid step
    # processes an Rb-row slab while the tables stay resident (index_map
    # (0, 0)).  Window cost ~= n_buffers * Rb * 1KB * 2 (double-buffered);
    # vmem_limit_bytes raises Mosaic's default 16MB scoped budget.
    Rb = min(spec.R,
             128 if (spec.adjoint or spec.k_cand > 1) else 256)
    while spec.R % Rb:
        Rb //= 2
    if Rb % 8:
        # Mosaic block rows must be a multiple of 8 OR the full array; odd
        # R (e.g. scaled batch sizes) falls back to one full-width block
        Rb = spec.R

    def slab(r):
        return (r, 0)

    def fixed(r):
        return (0, 0)

    state = pl.BlockSpec((Rb, 128), slab, memory_space=pltpu.VMEM)
    nc = max(spec.n_chunks, 1)
    emr = max((4 if spec.em_fh else 7) * spec.em_chunks, 1)
    subr = max(spec.cls_chunks, 1)
    n_planes = spec.n_planes
    in_specs = [
        pl.BlockSpec((1, 24), fixed, memory_space=pltpu.SMEM),
        pl.BlockSpec((nc, 128), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((emr, 128), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((subr, 128), fixed, memory_space=pltpu.VMEM),
    ] + [state] * (4 * spec.k_cand) + [state] * n_planes   # sig/albedo x K
    dtypes = ([jnp.float32] * len(F32_PLANES) + [jnp.int32] * len(I32_PLANES)
              + [jnp.float32] * len(_pre_names(spec.k_cand)))
    if spec.adjoint:
        dtypes += ([jnp.float32] * len(ADJ_F32) + [jnp.int32] * len(ADJ_I32)
                   + [jnp.float32] * len(_scatter_outs(spec.tgs)))
    out_shape = [jax.ShapeDtypeStruct((spec.R, 128), dt) for dt in dtypes]
    n_pre_in = 4 + 4 * spec.k_cand
    aliases = {n_pre_in + i: i for i in range(n_planes)}
    return pl.pallas_call(
        functools.partial(_step_kernel, spec),
        out_shape=out_shape,
        grid=(spec.R // Rb,),
        in_specs=in_specs,
        out_specs=[state] * len(dtypes),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=spec.interpret,
    )


class PlanesCarry(NamedTuple):
    planes: Tuple[jnp.ndarray, ...]     # N_ALL planes (R, 128)
    it: jnp.ndarray

    @property
    def mode_plane(self):
        return self.planes[N_STATE - len(I32_PLANES)]


def pack_carry(c: _FlatCarry, R: int, k_cand: int = 1) -> PlanesCarry:
    def p(x):
        return x.reshape(R, 128)

    flags = (jnp.where(c.escaped, FL_ESC, 0)
             | jnp.where(c.has_scattered, FL_SCAT, 0)
             | jnp.where(c.post_mode == MAIN, FL_POST, 0))
    z = jnp.zeros((R, 128), jnp.float32)
    planes = (
        p(c.o_l[:, 0]), p(c.o_l[:, 1]), p(c.o_l[:, 2]),
        p(c.d_l[:, 0]), p(c.d_l[:, 1]), p(c.d_l[:, 2]),
        p(c.d_w[:, 0]), p(c.d_w[:, 1]), p(c.d_w[:, 2]),
        p(c.t), p(c.maxt),
        p(c.throughput[:, 0]), p(c.throughput[:, 1]), p(c.throughput[:, 2]),
        p(c.result[:, 0]), p(c.result[:, 1]), p(c.result[:, 2]),
        p(c.last_pdf),
        p(c.sh_d[:, 0]), p(c.sh_d[:, 1]), p(c.sh_d[:, 2]),
        p(c.sh_t), p(c.sh_tmax), p(c.sh_tr),
        p(c.sh_base[:, 0]), p(c.sh_base[:, 1]), p(c.sh_base[:, 2]),
        p(c.mode).astype(jnp.int32), p(c.depth).astype(jnp.int32),
        p(flags).astype(jnp.int32),
        p(c.smp.h).view(jnp.int32), p(c.smp.dim).view(jnp.int32),
        jnp.full((R, 128), -1, jnp.int32),      # shtex: no pending NEE
        ) + (z,) * len(_pre_names(k_cand))
    return PlanesCarry(planes=planes, it=c.it)


def unpack_carry(pc: PlanesCarry, n: int, k_cand: int = 1) -> _FlatCarry:
    d = dict(zip(F32_PLANES + I32_PLANES + _pre_names(k_cand), pc.planes))

    def u(k):
        return d[k].reshape(n)

    def v3(k0, k1, k2):
        return jnp.stack([u(k0), u(k1), u(k2)], axis=-1)

    flags = u("flags")
    return _FlatCarry(
        mode=u("mode"), o_l=v3("ox", "oy", "oz"),
        d_l=v3("dlx", "dly", "dlz"), d_w=v3("dwx", "dwy", "dwz"),
        t=u("t"), maxt=u("maxt"), depth=u("depth"),
        throughput=v3("thr0", "thr1", "thr2"),
        result=v3("res0", "res1", "res2"),
        escaped=(flags & FL_ESC) != 0,
        has_scattered=(flags & FL_SCAT) != 0,
        last_pdf=u("lpdf"),
        post_mode=jnp.where((flags & FL_POST) != 0, MAIN, DONE)
        .astype(jnp.int32),
        sh_d=v3("shdx", "shdy", "shdz"), sh_t=u("sht"),
        sh_tmax=u("shtmax"), sh_tr=u("shtr"),
        sh_base=v3("shb0", "shb1", "shb2"),
        smp=LaneSampler(h=u("h").view(jnp.uint32),
                        dim=u("dim").view(jnp.uint32)),
        it=pc.it)


def _pad_rays(o, d, n_req: int):
    """Pad a wavefront to a multiple of 1024 lanes (so R = n/128 is a
    multiple of 8, satisfying Mosaic's block-row rule at every compaction
    stage width).  Pad lanes repeat ray 0 with their own RNG streams; their
    radiance is sliced away and (in the adjoint) their dL is zero so they
    contribute no gradient."""
    n = ((n_req + 1023) // 1024) * 1024
    if n != n_req:
        pad = n - n_req
        o = jnp.concatenate([o, jnp.broadcast_to(o[:1], (pad, 3))], axis=0)
        d = jnp.concatenate([d, jnp.broadcast_to(d[:1], (pad, 3))], axis=0)
    return o, d, n


def _round_stage(sz: int) -> int:
    return ((sz + 1023) // 1024) * 1024


def pallas_supported(scene: Scene, n: int, cfg: VolpathConfig = None) -> bool:
    """Static gate for the kernel engine (fallback: XLA flat engine)."""
    m = scene.medium
    Tm = int(np.prod(m.majorant_grid.shape))
    if isinstance(scene.emitter, EnvmapEmitter):
        # any size: > _EM_MAX_TEXELS uses the coarse nee proxy + deferred
        # full-res radiance (make_envmap builds nee for all large maps)
        em_ok = (scene.emitter.flat_data.shape[0] <= _EM_MAX_TEXELS
                 or scene.emitter.nee is not None)
    else:
        em_ok = isinstance(scene.emitter, ConstantEmitter)
    return (em_ok and m.combined_ct is not None
            and Tm <= int(os.environ.get("UIVR_KERNEL_TM", 2048))
            and n >= 1024)       # any size: _pad_rays rounds up to 1024s


def _planes_take(pc: PlanesCarry, idx: jnp.ndarray) -> PlanesCarry:
    R2 = idx.shape[0] // 128
    return PlanesCarry(
        planes=tuple(x.reshape(-1)[idx].reshape(R2, 128)
                     for x in pc.planes),
        it=pc.it)


def _planes_put(full: PlanesCarry, sub: PlanesCarry,
                idx: jnp.ndarray) -> PlanesCarry:
    shp = full.planes[0].shape
    return PlanesCarry(
        planes=tuple(f.reshape(-1).at[idx].set(s.reshape(-1)).reshape(shp)
                     for f, s in zip(full.planes, sub.planes)),
        it=sub.it)


def _sigma_albedo_planes(m, px, py, pz):
    """Planes-native trilinear sigma/albedo: numerically identical to
    medium.sigma_albedo_at / grids.trilinear_sample_ct, without the
    (n, 3) stack round-trip.  The ONE XLA row gather of the hybrid loop."""
    D, H, W, _ = m.params.sigma_t.shape

    def axis(p, nodes):
        res = jnp.float32(nodes - 1)
        x = jnp.clip(p, 0.0, 1.0) * res
        i0 = jnp.clip(jnp.floor(x), 0.0, jnp.maximum(res - 1.0, 0.0))
        f = x - i0
        return i0.astype(jnp.int32), (f if nodes > 1 else jnp.zeros_like(f))

    ix, fx = axis(px, W)
    iy, fy = axis(py, H)
    iz, fz = axis(pz, D)
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    cell = (iz * (H - 1) + iy) * (W - 1) + ix
    rows = m.combined_ct[cell]                       # (..., 32) row gather
    vals = rows.reshape(rows.shape[:-1] + (8, 4))
    w = jnp.stack([gz * gy * gx, gz * gy * fx, gz * fy * gx, gz * fy * fx,
                   fz * gy * gx, fz * gy * fx, fz * fy * gx, fz * fy * fx],
                  axis=-1)
    out = jnp.sum(vals * w[..., None], axis=-2)      # (..., 4)
    return out[..., 0] * m.scale, out[..., 1], out[..., 2], out[..., 3]


_EM_MAX_TEXELS = 8192     # largest alias table kept at full res in VMEM


def _cls_dims(shape) -> Tuple[int, int, int]:
    """Subcell classification grid dims: the smallest power-of-2 factor
    whose uniform-p cell grid fits the UIVR_CLASS_CELLS budget (default
    8192; a 64-chunk lookup costs ~0.27 ns/lane per unroll iteration —
    measured 4.3 ps/lane per 128-entry shuffle round; 0 disables).

    This is also the two-level answer to the reference's factor-8 majorant
    on 264^3 XML assets (scene_config.py:110): the WALKING supergrid is
    auto-coarsened to the kernel's Tm budget (factor 32 -> 9^3 cells), and
    the extra null collisions a loose majorant produces are resolved
    in-kernel by this FINE bound grid (factor 16 -> 17^3 = 4913 cells)
    without the sigma row gather, so the effective per-fetch collision
    rate tracks the fine grid, not the coarse one."""
    budget = int(os.environ.get("UIVR_CLASS_CELLS", 8192))
    if budget <= 0:
        return (0, 0, 0)
    from ..core.grids import majorant_dims
    fs = 1
    while True:
        dims = majorant_dims(shape, fs)
        if int(np.prod(dims)) <= budget:
            return tuple(int(x) for x in dims)
        fs *= 2


def _em_dims(scene: Scene):
    """Kernel emitter geometry: (kind, sampling H, W, fine fh, fw, em_nee).

    Envmaps above _EM_MAX_TEXELS sample from the coarse ``nee`` proxy with
    deferred full-res radiance (fh, fw > 0)."""
    e = scene.emitter
    if not isinstance(e, EnvmapEmitter):
        return "const", 0, 0, 0, 0, None
    H, W, _ = e.data.shape
    if H * W <= _EM_MAX_TEXELS or e.nee is None:
        return "envmap", H, W, 0, 0, None
    Hc, Wc, _ = e.nee.data.shape
    return "envmap", Hc, Wc, H, W, e.nee


def _deferred_nee_fixup(names, emitter):
    """Per-step XLA fix-up for deferred-radiance NEE: one full-res row
    gather (flat_data[shtex]) multiplied into the shadow-ray base weights of
    lanes that just created a shadow walk (shtex >= 0), then cleared.  Runs
    before the next kernel call, so the in-kernel shb consumers (commit,
    adjoint sha) always see radiance-complete weights."""
    i_tex = names.index("shtex")
    i_b = [names.index(f"shb{c}") for c in range(3)]
    flat = emitter.flat_data

    def fix(planes):
        tex = planes[i_tex]
        mask = tex >= 0
        rad = flat[jnp.maximum(tex, 0).reshape(-1)]
        planes = list(planes)
        for c in range(3):
            rc = rad[:, c].reshape(tex.shape)
            planes[i_b[c]] = jnp.where(mask, planes[i_b[c]] * rc,
                                       planes[i_b[c]])
        planes[i_tex] = jnp.where(mask, -1, tex)
        return tuple(planes)
    return fix


def _make_step(cfg: VolpathConfig, scene: Scene, R: int, interpret: bool,
               k_cand: int = 1):
    m = scene.medium
    Dc, Hc, Wc = (int(s) for s in m.majorant_grid.shape)
    ek, He, We, fh, fw, em_nee = _em_dims(scene)
    Ds, Hs, Ws = ((0, 0, 0) if k_cand > 1
                  else _cls_dims(m.params.sigma_t.shape))
    spec = StepSpec(Dc=Dc, Hc=Hc, Wc=Wc, R=R,
                    max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
                    use_nee=cfg.use_nee, phase_iso=_static_iso(m.phase_g),
                    emitter_kind=ek, em_h=He, em_w_=We, em_fh=fh, em_fw=fw,
                    shadow_rr=cfg.shadow_rr, k_cand=k_cand,
                    Ds=Ds, Hs=Hs, Ws=Ws,
                    esc=os.environ.get("UIVR_ESC", "1") == "1",
                    interpret=interpret)
    call = _make_call(spec)
    tables = build_tables(scene, em_nee, cls_dims=(Ds, Hs, Ws))
    names = F32_PLANES + I32_PLANES + _pre_names(k_cand)
    fix = _deferred_nee_fixup(names, scene.emitter) if fh else None

    def step(pc: PlanesCarry, do_post: bool) -> PlanesCarry:
        d = dict(zip(names, pc.planes))
        if do_post:
            if k_cand == 1:
                sig_alb = _sigma_albedo_planes(m, d["px"], d["py"], d["pz"])
            else:
                # ONE (k_cand*R)-row gather for all candidates — the whole
                # point of the batching (per-row cost amortizes with width)
                px = jnp.concatenate([d[f"px{j}"] for j in range(k_cand)])
                py = jnp.concatenate([d[f"py{j}"] for j in range(k_cand)])
                pz = jnp.concatenate([d[f"pz{j}"] for j in range(k_cand)])
                sg, b0, b1, b2 = _sigma_albedo_planes(m, px, py, pz)
                sig_alb = []
                for j in range(k_cand):
                    sl = slice(j * R, (j + 1) * R)
                    sig_alb += [sg[sl], b0[sl], b1[sl], b2[sl]]
        else:
            z = jnp.zeros((R, 128), jnp.float32)
            sig_alb = [z] * (4 * k_cand)
        scal = tables.scal.at[0, 13].set(1.0 if do_post else 0.0)
        planes = tuple(call(scal, tables.maj, tables.em, tables.sub,
                            *sig_alb, *pc.planes))
        if fix is not None and do_post:
            planes = fix(planes)
        return PlanesCarry(planes=planes,
                           it=pc.it + (1 if do_post else 0))
    return step


# Default compaction schedule knob: stage-0 full-width dispatch budget
# (env-tunable for on-hardware sweeps; schedule=None still means "no
# compaction, plain while_loop").  48 measured +5.6% over 96 on the bench
# scene at batch 16384 (earlier compaction of the post-mean-event tail).
_SCHED0 = int(os.environ.get("UIVR_SCHED0", 48))

# Default-schedule sentinel: the persistent-wavefront fast path only
# replaces the staged scheduler when the caller did NOT ask for a specific
# schedule (advisor r3: dev/bisect scripts passing explicit staged
# schedules must measure the schedule they claim) and no UIVR_SCHED
# override is in force.
_DEFAULT_SCHEDULE = (_SCHED0, None, None)


def _build_sched(schedule, n):
    """Resolve a compaction schedule into [stage0_dispatches, (size, iters),
    ...].  The UIVR_SCHED env (e.g. "32,/4:64,/8:256,/32") overrides the
    per-call tuple for on-hardware sweeps: first token = stage-0 dispatch
    budget at full width; each later token is a stage "SIZE[:ITERS]" where
    "/k" sizes mean n//k (floored at 8192 lanes) and a missing ITERS means
    "run to completion"."""
    env = os.environ.get("UIVR_SCHED")
    if env:
        toks = env.split(",")
        sched = [int(toks[0])]
        for t in toks[1:]:
            sz_s, _, it_s = t.partition(":")
            sz = (max(n // int(sz_s[1:]), 8192) if sz_s.startswith("/")
                  else int(sz_s))
            sched.append((_round_stage(sz), int(it_s) if it_s else None))
        return sched
    sched = [schedule[0]]
    defaults = [(_round_stage(max(n // 8, 8192)), 256),
                (_round_stage(max(n // 32, 8192)), None)]
    for i, st in enumerate(schedule[1:]):
        sched.append(st if st is not None else
                     defaults[i] if i < len(defaults) else (n, None))
    return sched



def _stage_steps(make, n: int, sched, steps):
    """Compile step closures for each valid compaction-stage size and remap
    unsupported sizes to full width (shared by the aligned primal, the
    adjoint, and the persistent straggler phase)."""
    for sz, _ in sched[1:]:
        if sz < n and sz % 128 == 0 and sz >= 256 and sz not in steps:
            steps[sz] = make(sz // 128)
    return [sched[0]] + [(sz if sz in steps else n, it)
                         for sz, it in sched[1:]]


def sample_primal_pallas(cfg: VolpathConfig, scene: Scene, o, d, seed,
                         schedule=_DEFAULT_SCHEDULE, path_state=None,
                         interpret: bool = None, return_state: bool = False,
                         k_cand: int = None):
    """Drop-in for volpath_flat.sample_primal_compact on supported scenes
    (same estimator; Pallas fused step kernel).  With ``k_cand == 1``
    (default) the TEA draw sequence is bit-identical to the XLA flat
    engine; ``k_cand > 1`` batches K candidate events per dispatch (PLAN.md
    K-candidate batching) — same estimator, different deterministic draw
    schedule, statistically identical and unbiased.
    ``interpret=None``: compile on TPU, interpret elsewhere (CPU tests)."""
    if interpret is None:
        # compile for real TPU backends (incl. the axon relay plugin);
        # interpret elsewhere (CPU test backend)
        interpret = jax.default_backend() == "cpu"
    if k_cand is None:
        k_cand = int(os.environ.get("UIVR_KCAND", 1))
    n_req = (o if path_state is None else path_state.o_l).shape[0]
    if (path_state is None and not return_state
            and schedule == _DEFAULT_SCHEDULE
            and not os.environ.get("UIVR_SCHED")
            and os.environ.get("UIVR_PERSIST", "1") == "1"
            and n_req > int(os.environ.get("UIVR_PERSIST_W", 1 << 16))):
        # persistent-wavefront scheduler (see sample_primal_persistent):
        # pays off only when the pool exceeds the buffer width.  DEFAULT ON
        # since the round-3 on-TPU sweep (PLAN.md): W 65536 measured best
        # (bench iters=4: staged 1.047 -> W 512k 1.425, 256k 1.559,
        # 128k 1.633, 64k 1.668, 32k 1.667 Mrays/s) — eviction waste
        # dominates the narrow-gather penalty down to ~64k lanes.  Only
        # taken for the DEFAULT schedule: explicit staged schedules (dev
        # bisects, sweeps) and UIVR_SCHED overrides measure what they name.
        return sample_primal_persistent(cfg, scene, o, d, seed,
                                        interpret=interpret, k_cand=k_cand)
    if path_state is None:
        o, d, n = _pad_rays(o, d, n_req)
    else:
        n = n_req
        assert n % 128 == 0, n
    R = n // 128

    smp = make_lane_sampler(seed, n_lanes=n)
    full = _init_carry(scene, o, d, smp, path_state)
    pc = pack_carry(full, R, k_cand)

    steps = {n: _make_step(cfg, scene, R, interpret, k_cand)}
    pc = steps[n](pc, do_post=False)        # prime the first candidates

    def active_of(c: PlanesCarry):
        # flat (n,): _run_rounds argsorts this for compaction
        return (c.mode_plane != DONE).reshape(-1)

    def step_dispatch(c: PlanesCarry) -> PlanesCarry:
        sz = c.planes[0].shape[0] * 128
        return steps[sz](c, do_post=True)

    if schedule is None:
        def cond(c):
            return jnp.any(active_of(c)) & (c.it < cfg.max_steps)
        pc = jax.lax.while_loop(cond, step_dispatch, pc)
    else:
        sched = _build_sched(schedule, n)
        if k_cand > 1:
            # each dispatch covers ~k_cand events: compact correspondingly
            # earlier (stage iteration counts are in dispatches)
            sched = [max(1, sched[0] // k_cand)] + [
                (sz, it if it is None else max(1, it // k_cand))
                for sz, it in sched[1:]]
        sched = _stage_steps(
            lambda r: _make_step(cfg, scene, r, interpret, k_cand),
            n, sched, steps)
        pc = _run_rounds(step_dispatch, _planes_take, _planes_put,
                         active_of, pc, sched, n, max_iters=cfg.max_steps)

    carry = unpack_carry(pc, n, k_cand)
    L = _finish(cfg, scene, carry, nee_emitter=_em_dims(scene)[5])[:n_req]
    if return_state:
        return L, carry.escaped[:n_req], pc
    return L, carry.escaped[:n_req]


# ---------------------------------------------------------------------------
# Persistent wavefront scheduler (round 3)
# ---------------------------------------------------------------------------
# Staged compaction leaves throughput on the table in two ways: (a) the
# stage-0 full-width budget dispatches every lane for as long as the
# SLOWEST lane of the stage needs, and (b) late narrow stages pay the
# XLA row gather's latency-bound regime (~105 ns/row at 32k rows vs ~13 at
# 1M).  The persistent scheduler instead keeps ONE dense buffer of WIDTH
# lanes (sized where the gather is amortized) and, every `refill_every`
# dispatches, evicts DONE lanes (applying their _finish contribution into a
# per-ray output buffer) and installs fresh rays from the pending pool via
# a cumsum-rank assignment — all static shapes, in-graph.  Realization is
# IDENTICAL per ray to the aligned engines: lane RNG streams are derived
# from the RAY id, not the slot, and a refilled lane's first dispatch
# consumes exactly the priming draws (zero candidate planes make POST a
# position-preserving no-op).  Remaining stragglers after pool exhaustion
# finish under the existing staged compaction.


def sample_primal_persistent(cfg: VolpathConfig, scene: Scene, o, d, seed,
                             width: int = None, refill_every: int = None,
                             interpret: bool = None, k_cand: int = None):
    """Persistent-wavefront primal sampler (same estimator/realization as
    sample_primal_pallas; different dispatch schedule).  ``k_cand > 1``
    composes K-candidate event batching with the persistent buffer: each
    dispatch's POST consumes up to K pre-gathered sigma candidates and PRE
    emits the next K, so the per-dispatch XLA sigma gather covers K*W
    rows.  MEASURED A REGRESSION (PLAN.md round 4: the gather is
    descriptor-rate-bound, ~10 ns/row FLAT from 64k to 1M rows, so K
    cannot amortize it and only adds VPU + plane traffic) — kept for
    completeness/sweeps, default off.  Refilled lanes enter with
    zeroed candidate planes (kind=0 = invalid), so their first POST is a
    position-preserving no-op and their PRE consumes exactly the priming
    draws — per-ray realization is unchanged for k_cand=1 and
    statistically identical (different deterministic draw schedule) for
    k_cand>1, same as in the staged scheduler."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if k_cand is None:
        k_cand = int(os.environ.get("UIVR_KCAND", 1))
    n_req = o.shape[0]
    o, d, n = _pad_rays(o, d, n_req)
    W = width or int(os.environ.get("UIVR_PERSIST_W", 1 << 16))
    W = min(_round_stage(W), n)
    Rw = W // 128
    Rf = refill_every or int(os.environ.get("UIVR_PERSIST_R", 4))

    smp_all = make_lane_sampler(seed, n_lanes=n)
    h_pool = smp_all.h                                 # (n,) per-RAY streams
    em_nee = _em_dims(scene)[5]
    step = _make_step(cfg, scene, Rw, interpret, k_cand)

    smp0 = LaneSampler(h=h_pool[:W], dim=jnp.zeros((W,), jnp.uint32))
    pc = pack_carry(_init_carry(scene, o[:W], d[:W], smp0, None), Rw,
                    k_cand)
    pc = step(pc, do_post=False)
    rid0 = jnp.arange(W, dtype=jnp.int32)
    out0 = jnp.zeros((n + 1, 3), jnp.float32)          # slot n = dropped
    esc0 = jnp.zeros((n + 1,), bool)

    def flush(pc, rid, out, esc, force=False):
        """Apply _finish to DONE lanes not yet flushed; mark them empty.
        ``force=True`` (final flush only) also flushes still-active lanes
        with their truncated contribution — matching what the staged
        scheduler's _finish does when max_iters truncates a walk (advisor
        r3: the it_cap safety bound must not silently zero lanes)."""
        carry = unpack_carry(pc, W, k_cand)
        fin = (rid >= 0) if force else ((carry.mode == DONE) & (rid >= 0))
        L = _finish(cfg, scene, carry, nee_emitter=em_nee)
        idx = jnp.where(fin, rid, n)
        out = out.at[idx].set(L)
        esc = esc.at[idx].set(carry.escaped)
        return jnp.where(fin, -1, rid), out, esc

    def refill(pc, rid, head, out, esc):
        rid, out, esc = flush(pc, rid, out, esc)
        done = (unpack_carry(pc, W, k_cand).mode == DONE)
        rank = jnp.cumsum(done.astype(jnp.int32)) - 1
        src = head + rank
        take = done & (src < n)
        srcc = jnp.clip(src, 0, n - 1)
        smp_f = LaneSampler(h=h_pool[srcc],
                            dim=jnp.zeros((W,), jnp.uint32))
        fresh = pack_carry(_init_carry(scene, o[srcc], d[srcc], smp_f,
                                       None), Rw, k_cand)
        tk = take.reshape(Rw, 128)
        planes = tuple(jnp.where(tk, f, p)
                       for f, p in zip(fresh.planes, pc.planes))
        rid = jnp.where(take, src, rid)
        head = jnp.minimum(head + jnp.sum(done.astype(jnp.int32)),
                           jnp.int32(n))
        return PlanesCarry(planes=planes, it=pc.it), rid, head, out, esc

    # Each dispatch covers ~k_cand events, so the dispatch-count safety
    # bound shrinks accordingly (it counts dispatches, not events).
    it_cap = -(-cfg.max_steps // k_cand) * (n // W + 2)

    def cond(st):
        pc, rid, head, out, esc = st
        return (head < n) & (pc.it < it_cap)

    def body(st):
        pc, rid, head, out, esc = st
        pc = jax.lax.fori_loop(
            0, Rf, lambda i, p: step(p, do_post=True), pc)
        return refill(pc, rid, head, out, esc)

    pc, rid, head, out, esc = jax.lax.while_loop(
        cond, body, (pc, rid0, jnp.int32(W), out0, esc0))

    # stragglers: staged compaction on the final W-wide buffer (slots are
    # restored in place by _run_rounds, so rid stays valid)
    steps = {W: step}
    sched = _build_sched((0, None, None), W)
    if k_cand > 1:
        sched = [sched[0]] + [(sz, it if it is None else
                               max(1, it // k_cand))
                              for sz, it in sched[1:]]
    sched = _stage_steps(
        lambda r: _make_step(cfg, scene, r, interpret, k_cand),
        W, sched, steps)

    def step_dispatch(c: PlanesCarry) -> PlanesCarry:
        return steps[c.planes[0].shape[0] * 128](c, do_post=True)

    pc = _run_rounds(step_dispatch, _planes_take, _planes_put,
                     lambda c: (c.mode_plane != DONE).reshape(-1),
                     pc, sched, W, max_iters=it_cap)
    rid, out, esc = flush(pc, rid, out, esc, force=True)
    return out[:n_req], esc[:n_req]


def _static_iso(phase_g) -> bool:
    try:
        return bool(abs(float(jax.device_get(phase_g))) < 1e-4)
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Adjoint driver
# ---------------------------------------------------------------------------

class AdjCarry(NamedTuple):
    planes: Tuple[jnp.ndarray, ...]     # N_ADJ planes (R, 128)
    acc: object                          # GradAccum (global)
    it: jnp.ndarray

    @property
    def mode_plane(self):
        return self.planes[N_STATE - len(I32_PLANES)]


def _adj_take(c: AdjCarry, idx: jnp.ndarray) -> AdjCarry:
    R2 = idx.shape[0] // 128
    return AdjCarry(
        planes=tuple(x.reshape(-1)[idx].reshape(R2, 128) for x in c.planes),
        acc=c.acc, it=c.it)


def _adj_put(full: AdjCarry, sub: AdjCarry, idx: jnp.ndarray) -> AdjCarry:
    shp = full.planes[0].shape
    return AdjCarry(
        planes=tuple(f.reshape(-1).at[idx].set(s.reshape(-1)).reshape(shp)
                     for f, s in zip(full.planes, sub.planes)),
        acc=sub.acc, it=sub.it)


def _make_adj_step(cfg: VolpathConfig, scene: Scene, R: int, interpret: bool,
                   defer_tc: bool = False):
    """``defer_tc=True`` (persistent scheduler only): the step does NOT
    scatter the tgs transmittance-gradient rows; it returns them as
    ``(AdjCarry, (tc, tsx, tsy, tsz))`` lists so the caller can merge them
    into per-lane pending slots and batch the scatter (round-4 split:
    scatter-add cost is per ROW, and the tc rows are zero on the large
    majority of dispatches — deferring turns 4*W rows/dispatch into
    ~4 rows per SEGMENT EVENT).  The in-scattering/replay row (sc_sig,
    nonzero on most collision dispatches) still scatters eagerly."""
    from ..scene.gradients import scatter_sigma, scatter_sigma_albedo
    m = scene.medium
    Dc, Hc, Wc = (int(s) for s in m.majorant_grid.shape)
    ek, He, We, fh, fw, em_nee = _em_dims(scene)
    Ds, Hs, Ws = _cls_dims(m.params.sigma_t.shape)
    spec = StepSpec(Dc=Dc, Hc=Hc, Wc=Wc, R=R,
                    max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
                    use_nee=cfg.use_nee, phase_iso=_static_iso(m.phase_g),
                    emitter_kind=ek, em_h=He, em_w_=We, em_fh=fh, em_fw=fw,
                    shadow_rr=cfg.shadow_rr,
                    adjoint=True, tgs=cfg.trans_grad_samples,
                    use_drt=cfg.use_drt, use_drt_mis=cfg.use_drt_mis,
                    use_drt_sub=cfg.use_drt_subsampling,
                    Ds=Ds, Hs=Hs, Ws=Ws,
                    interpret=interpret)
    call = _make_call(spec)
    tables = build_tables(scene, em_nee, cls_dims=(Ds, Hs, Ws))
    fix = (_deferred_nee_fixup(ALL_PLANES + ADJ_PLANES, scene.emitter)
           if fh else None)
    n = R * 128
    sout = _scatter_outs(spec.tgs)

    def step(c: AdjCarry, do_post: bool):
        d_ = dict(zip(ALL_PLANES + ADJ_PLANES, c.planes))
        if do_post:
            sig, a0, a1, a2 = _sigma_albedo_planes(m, d_["px"], d_["py"],
                                                   d_["pz"])
        else:
            sig = jnp.zeros((R, 128), jnp.float32)
            a0 = a1 = a2 = sig
        scal = tables.scal.at[0, 13].set(1.0 if do_post else 0.0)
        out = call(scal, tables.maj, tables.em, tables.sub,
                   sig, a0, a1, a2, *c.planes)
        planes = tuple(out[:N_ADJ])
        if fix is not None and do_post:
            planes = fix(planes)
        acc = c.acc
        tc_out = None
        if do_post:
            sc = dict(zip(sout, out[N_ADJ:]))

            def flat3(x, y, z):
                return jnp.stack([x.reshape(n), y.reshape(n),
                                  z.reshape(n)], axis=-1)

            p_in = flat3(d_["px"], d_["py"], d_["pz"])
            if defer_tc:
                acc = scatter_sigma_albedo(
                    acc, m, p_in, sc["sc_sig"].reshape(n),
                    flat3(sc["sc_a0"], sc["sc_a1"], sc["sc_a2"]), None)
                tc_out = ([sc[f"tc{k}"] for k in range(spec.tgs)],
                          [sc[f"tsx{k}"] for k in range(spec.tgs)],
                          [sc[f"tsy{k}"] for k in range(spec.tgs)],
                          [sc[f"tsz{k}"] for k in range(spec.tgs)])
            elif m.sigma_ct is not None:
                # corner-table mode: ONE fused row scatter per dispatch —
                # the in-scattering/replay row plus the tgs transmittance
                # rows (zero albedo cotangent) concatenated; per-row
                # scatter cost amortizes with total rows like gathers do
                ps = [p_in]
                cs = [sc["sc_sig"].reshape(n)]
                for k in range(spec.tgs):
                    ps.append(flat3(sc[f"tsx{k}"], sc[f"tsy{k}"],
                                    sc[f"tsz{k}"]))
                    cs.append(sc[f"tc{k}"].reshape(n))
                ca = jnp.concatenate(
                    [flat3(sc["sc_a0"], sc["sc_a1"], sc["sc_a2"]),
                     jnp.zeros((spec.tgs * n, 3), jnp.float32)])
                acc = scatter_sigma_albedo(acc, m, jnp.concatenate(ps),
                                           jnp.concatenate(cs), ca, None)
            else:
                acc = scatter_sigma_albedo(
                    acc, m, p_in, sc["sc_sig"].reshape(n),
                    flat3(sc["sc_a0"], sc["sc_a1"], sc["sc_a2"]), None)
                for k in range(spec.tgs):
                    ps = flat3(sc[f"tsx{k}"], sc[f"tsy{k}"], sc[f"tsz{k}"])
                    acc = scatter_sigma(acc, m, ps, sc[f"tc{k}"].reshape(n),
                                        None)
        nc = AdjCarry(planes=planes, acc=acc,
                      it=c.it + (1 if do_post else 0))
        if defer_tc:
            return nc, tc_out
        return nc
    return step


def sample_adjoint_pallas(cfg: VolpathConfig, scene: Scene, o, d, seed, dL,
                          state_in, schedule=_DEFAULT_SCHEDULE,
                          interpret: bool = None, return_state: bool = False):
    """Drop-in for volpath_flat.sample_adjoint on supported scenes: Pallas
    fused step/cotangent kernel + XLA row gather and 1+tgs row scatter-adds
    per step (the in-scattering and replay cotangents share one scatter).
    Same estimator set, same primary/alt TEA streams."""
    from ..core.rng import lane_fork
    from ..integrators.volpath_flat import _drt_backward_flat
    from ..integrators.volpathsimple import _Reservoir, _reservoir_get
    from ..scene.gradients import finalize_accum, init_accum

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if (schedule == _DEFAULT_SCHEDULE and not return_state
            and not os.environ.get("UIVR_SCHED")
            and os.environ.get("UIVR_PERSIST", "1") == "1"
            and o.shape[0] > int(os.environ.get("UIVR_PERSIST_W", 1 << 16))):
        # persistent-wavefront scheduler for the 3-walk adjoint state
        # machine (round 4): same rationale and gating as the primal's.
        return sample_adjoint_persistent(cfg, scene, o, d, seed, dL,
                                         state_in, interpret=interpret)
    m = scene.medium
    n_req = o.shape[0]
    o, d, n = _pad_rays(o, d, n_req)
    if n != n_req:
        pad = n - n_req
        zpad = jnp.zeros((pad, 3), jnp.float32)
        dL = jnp.concatenate([jnp.asarray(dL), zpad], axis=0)
        state_in = jnp.concatenate([jnp.asarray(state_in), zpad], axis=0)
    R = n // 128

    smp = make_lane_sampler(seed, n_lanes=n)
    carry = _init_carry(scene, o, d, smp, None)
    carry = carry._replace(result=jnp.asarray(state_in))
    base = pack_carry(carry, R)
    alt = lane_fork(smp, 0x9E3779B9)

    def p(x):
        return jnp.asarray(x).reshape(R, 128)

    z = jnp.zeros((R, 128), jnp.float32)
    zi = jnp.zeros((R, 128), jnp.int32)
    dL = jnp.asarray(dL)
    adj_planes = (
        z, z, z, z, z,                       # rpt, rptr, sha0..2
        p(dL[:, 0]), p(dL[:, 1]), p(dL[:, 2]),
        z, z, z, z, z, z,                    # rw0..2, rc0..2
        z, z, z, z, z, z, z, z, z, z,        # rvo, rvl, rvw, rvmaxt
        p(alt.h).view(jnp.int32), zi,        # alth, altd
        zi, zi, zi - 1, zi)                  # rpdim, shdim0, rvdepth, rvact
    ac = AdjCarry(planes=base.planes + adj_planes,
                  acc=init_accum(m, vary=jnp.float32(0.0),
                                 need_emission=False), it=base.it)

    steps = {n: _make_adj_step(cfg, scene, R, interpret)}
    ac = steps[n](ac, do_post=False)

    def active_of(c: AdjCarry):
        return (c.mode_plane != DONE).reshape(-1)

    def step_dispatch(c: AdjCarry) -> AdjCarry:
        sz = c.planes[0].shape[0] * 128
        return steps[sz](c, do_post=True)

    max_iters = 3 * cfg.max_steps        # MAIN + SHADOW + REPLAY walks
    if schedule is None:
        def cond(c):
            return jnp.any(active_of(c)) & (c.it < max_iters)
        ac = jax.lax.while_loop(cond, step_dispatch, ac)
    else:
        sched = _stage_steps(
            lambda r: _make_adj_step(cfg, scene, r, interpret),
            n, _build_sched(schedule, n), steps)
        ac = _run_rounds(step_dispatch, _adj_take, _adj_put,
                         active_of, ac, sched, n, max_iters=max_iters)

    acc = ac.acc
    if cfg.use_drt and cfg.use_drt_subsampling:
        dd = dict(zip(ALL_PLANES + ADJ_PLANES, ac.planes))

        def u(k):
            return dd[k].reshape(n)

        def v3(a, b, c):
            return jnp.stack([u(a), u(b), u(c)], axis=-1)

        res = _Reservoir(wsum=v3("rw0", "rw1", "rw2"),
                         cur_w=v3("rc0", "rc1", "rc2"),
                         depth=u("rvdepth"),
                         o_l=v3("rvo0", "rvo1", "rvo2"),
                         d_l=v3("rvl0", "rvl1", "rvl2"),
                         d_w=v3("rvw0", "rvw1", "rvw2"),
                         maxt=u("rvmaxt"),
                         active=u("rvact") != 0)
        w_sub = _reservoir_get(res)
        acc = _drt_backward_flat(cfg, scene, seed, res, w_sub * dL, acc,
                                 engine="pallas")
    if return_state:
        return finalize_accum(acc, m), ac
    return finalize_accum(acc, m)


# Reservoir planes that must be COLLECTED per ray at eviction: the staged
# adjoint reads them from the final buffer for every lane at once, but the
# persistent scheduler recycles slots, so a ray's reservoir is scattered
# into (n,) buffers when its lane is flushed (DRT subsampling only).
_RES_NAMES = ("rw0", "rw1", "rw2", "rc0", "rc1", "rc2",
              "rvo0", "rvo1", "rvo2", "rvl0", "rvl1", "rvl2",
              "rvw0", "rvw1", "rvw2", "rvmaxt", "rvdepth", "rvact")


def sample_adjoint_persistent(cfg: VolpathConfig, scene: Scene, o, d, seed,
                              dL, state_in, width: int = None,
                              refill_every: int = None,
                              interpret: bool = None):
    """Persistent-wavefront scheduler for the adjoint's 3-walk
    (MAIN/SHADOW/REPLAY) state machine — same gradient estimator and
    per-ray realization as sample_adjoint_pallas, different dispatch
    schedule.  The adjoint is where eviction waste is worst: walk lengths
    are up to 3*max_steps with high divergence, so the staged scheduler's
    full-width stage-0 budget runs every lane for as long as the slowest
    3-walk needs.  Gradients are scatter-added per dispatch, so eviction
    only has to collect the DRT reservoir (if subsampling is on); the
    global accumulator rides the loop carry untouched by refills."""
    from ..core.rng import lane_fork
    from ..integrators.volpath_flat import _drt_backward_flat
    from ..integrators.volpathsimple import _Reservoir, _reservoir_get
    from ..scene.gradients import finalize_accum, init_accum
    from ..scene.gradients import scatter_sigma as _scatter_sig

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m = scene.medium
    n_req = o.shape[0]
    o, d, n = _pad_rays(o, d, n_req)
    dL = jnp.asarray(dL)
    state_in = jnp.asarray(state_in)
    if n != n_req:
        zpad = jnp.zeros((n - n_req, 3), jnp.float32)
        dL = jnp.concatenate([dL, zpad], axis=0)
        state_in = jnp.concatenate([state_in, zpad], axis=0)
    W = width or int(os.environ.get("UIVR_PERSIST_W", 1 << 16))
    W = min(_round_stage(W), n)
    Rw = W // 128
    Rf = refill_every or int(os.environ.get("UIVR_PERSIST_R", 4))

    smp_all = make_lane_sampler(seed, n_lanes=n)
    h_pool = smp_all.h                                 # (n,) per-RAY streams
    alt_pool = lane_fork(smp_all, 0x9E3779B9).h
    # Deferred transmittance-gradient scatters (UIVR_DEFER_TC=1): tc rows
    # go into per-lane pending slots, collected per ray at eviction and
    # scattered ONCE at the end — turning 4*W scatter rows per dispatch
    # into ~4 rows per segment event (gradient identical up to summation
    # order; see _make_adj_step docstring).
    defer = (cfg.trans_grad_samples > 0
             and os.environ.get("UIVR_DEFER_TC", "0") == "1")
    tgs = cfg.trans_grad_samples
    P = int(os.environ.get("UIVR_DEFER_P", 2 * max(tgs, 1)))
    step_d = _make_adj_step(cfg, scene, Rw, interpret, defer_tc=defer)
    if defer:
        def _flat3(sx, sy, sz):
            return jnp.stack([sx.reshape(-1), sy.reshape(-1),
                              sz.reshape(-1)], axis=-1)

        def step(c, do_post):
            # eager wrapper (priming + straggler stages): same kernel,
            # tc rows scattered immediately like the non-deferred step
            nc, tc_out = step_d(c, do_post)
            if tc_out is not None:
                acc = nc.acc
                tcs, sxs, sys_, szs = tc_out
                for k in range(tgs):
                    acc = _scatter_sig(acc, scene.medium,
                                       _flat3(sxs[k], sys_[k], szs[k]),
                                       tcs[k].reshape(-1), None)
                nc = AdjCarry(planes=nc.planes, acc=acc, it=nc.it)
            return nc
    else:
        step = step_d
    names = ALL_PLANES + ADJ_PLANES
    res_on = bool(cfg.use_drt and cfg.use_drt_subsampling)
    # reservoir planes split by dtype; collected as TWO wide .set scatters
    # per flush (scatter cost is per ROW, ~flat in row width — PLAN.md
    # round-4 split — so 18 narrow writes collapse into 2)
    res_f32 = [nm for nm in _RES_NAMES if nm not in ("rvdepth", "rvact")]
    res_idx_f = [names.index(nm) for nm in res_f32]
    res_idx_i = [names.index(nm) for nm in ("rvdepth", "rvact")]

    z = jnp.zeros((Rw, 128), jnp.float32)
    zi = jnp.zeros((Rw, 128), jnp.int32)

    def fresh_planes(srcc):
        """N_ADJ planes for rays `srcc` — exactly the init of
        sample_adjoint_pallas, gathered per source ray (lane RNG streams
        derive from the RAY id, so realization matches the aligned
        engine; a refilled lane's first POST is a no-op on its zeroed
        candidate planes and its PRE consumes the priming draws)."""
        smp_f = LaneSampler(h=h_pool[srcc],
                            dim=jnp.zeros((W,), jnp.uint32))
        carry = _init_carry(scene, o[srcc], d[srcc], smp_f, None)
        carry = carry._replace(result=state_in[srcc])
        base = pack_carry(carry, Rw)

        def p(x):
            return x.reshape(Rw, 128)

        dLs = dL[srcc]
        return base.planes + (
            z, z, z, z, z,                       # rpt, rptr, sha0..2
            p(dLs[:, 0]), p(dLs[:, 1]), p(dLs[:, 2]),
            z, z, z, z, z, z,                    # rw0..2, rc0..2
            z, z, z, z, z, z, z, z, z, z,        # rvo, rvl, rvw, rvmaxt
            p(alt_pool[srcc]).view(jnp.int32), zi,   # alth, altd
            zi, zi, zi - 1, zi)                  # rpdim, shdim0, rvdepth, rvact

    ac = AdjCarry(planes=fresh_planes(jnp.arange(W, dtype=jnp.int32)),
                  acc=init_accum(m, vary=jnp.float32(0.0),
                                 need_emission=False),
                  it=jnp.int32(0))
    ac = step(ac, do_post=False)
    rid0 = jnp.arange(W, dtype=jnp.int32)
    if res_on:
        buf_i0 = jnp.zeros((n + 1, 2), jnp.int32).at[:, 0].set(-1)
        bufs0 = (jnp.zeros((n + 1, len(res_f32)), jnp.float32), buf_i0)
    else:
        bufs0 = ()

    if defer:
        zP = jnp.zeros((P, Rw, 128), jnp.float32)
        dst0 = ((zP, zP, zP, zP), jnp.zeros((Rw, 128), jnp.int32),
                jnp.zeros((n + 1, 4 * P), jnp.float32))
    else:
        dst0 = ()

    def merge_pending(acc, dst, tc_out):
        """Append this dispatch's nonzero tc samples to per-lane pending
        slots; if any lane could overflow on the NEXT dispatch, flush all
        pending rows into the accumulator now (rare)."""
        pend, cnt, tbuf = dst
        tcs, sxs, sys_, szs = tc_out
        valid, off = [], []
        run = jnp.zeros_like(cnt)
        for t in tcs:
            valid.append(t != 0)
            off.append(run)
            run = run + (t != 0).astype(jnp.int32)
        new = list(pend)
        for j in range(tgs):
            slot = cnt + off[j]
            vals = (tcs[j], sxs[j], sys_[j], szs[j])
            for s in range(P):
                msel = valid[j] & (slot == s)
                new = [a.at[s].set(jnp.where(msel, v, a[s]))
                       for a, v in zip(new, vals)]
        cnt = cnt + run

        def do_flush(args):
            acc, pend, cnt = args
            pc_, px_, py_, pz_ = pend
            pos = jnp.stack([px_.reshape(-1), py_.reshape(-1),
                             pz_.reshape(-1)], axis=-1)
            acc = _scatter_sig(acc, m, pos, pc_.reshape(-1), None)
            return acc, (zP, zP, zP, zP), jnp.zeros_like(cnt)

        acc, pend2, cnt = jax.lax.cond(
            jnp.any(cnt > P - tgs), do_flush, lambda a: a,
            (acc, tuple(new), cnt))
        return acc, (pend2, cnt, tbuf)

    def flush(ac, rid, bufs, dst, force=False):
        mode = ac.mode_plane.reshape(-1)
        fin = (rid >= 0) if force else ((mode == DONE) & (rid >= 0))
        idx = jnp.where(fin, rid, n)
        if res_on:
            vf = jnp.stack([ac.planes[i].reshape(-1) for i in res_idx_f],
                           axis=-1)
            vi = jnp.stack([ac.planes[i].reshape(-1) for i in res_idx_i],
                           axis=-1)
            bufs = (bufs[0].at[idx].set(vf), bufs[1].at[idx].set(vi))
        if defer:
            # collect evicted lanes' pending tc rows into the per-ray wide
            # buffer (ONE W-row set) and clear their slots for reuse
            pend, cnt, tbuf = dst
            cols = jnp.concatenate(
                [a.reshape(P, -1).T for a in pend], axis=-1)   # (W, 4P)
            tbuf = tbuf.at[idx].set(cols)
            keep = (~fin).reshape(Rw, 128)
            pend = tuple(jnp.where(keep[None], a, 0.0) for a in pend)
            cnt = jnp.where(keep, cnt, 0)
            dst = (pend, cnt, tbuf)
        return jnp.where(fin, -1, rid), bufs, dst

    def refill(ac, rid, head, bufs, dst):
        rid, bufs, dst = flush(ac, rid, bufs, dst)
        done = ac.mode_plane.reshape(-1) == DONE
        rank = jnp.cumsum(done.astype(jnp.int32)) - 1
        src = head + rank
        take = done & (src < n)
        srcc = jnp.clip(src, 0, n - 1)
        fresh = fresh_planes(srcc)
        tk = take.reshape(Rw, 128)
        planes = tuple(jnp.where(tk, f, p)
                       for f, p in zip(fresh, ac.planes))
        rid = jnp.where(take, src, rid)
        head = jnp.minimum(head + jnp.sum(done.astype(jnp.int32)),
                           jnp.int32(n))
        return (AdjCarry(planes=planes, acc=ac.acc, it=ac.it), rid, head,
                bufs, dst)

    it_cap = 3 * cfg.max_steps * (n // W + 2)

    def cond(st):
        ac, rid, head, bufs, dst = st
        return (head < n) & (ac.it < it_cap)

    def body(st):
        ac, rid, head, bufs, dst = st
        if defer:
            def inner(i, st2):
                ac, dst = st2
                ac, tc_out = step_d(ac, do_post=True)
                acc, dst = merge_pending(ac.acc, dst, tc_out)
                return AdjCarry(planes=ac.planes, acc=acc, it=ac.it), dst
            ac, dst = jax.lax.fori_loop(0, Rf, inner, (ac, dst))
        else:
            ac = jax.lax.fori_loop(
                0, Rf, lambda i, a: step(a, do_post=True), ac)
        return refill(ac, rid, head, bufs, dst)

    ac, rid, head, bufs, dst = jax.lax.while_loop(
        cond, body, (ac, rid0, jnp.int32(W), bufs0, dst0))

    # stragglers: staged compaction on the final W-wide buffer (eager tc
    # scatters — `step` wraps the same kernel when defer is on)
    steps = {W: step}
    sched = _stage_steps(
        lambda r: _make_adj_step(cfg, scene, r, interpret),
        W, _build_sched((0, None, None), W), steps)

    def step_dispatch(c: AdjCarry) -> AdjCarry:
        return steps[c.planes[0].shape[0] * 128](c, do_post=True)

    ac = _run_rounds(step_dispatch, _adj_take, _adj_put,
                     lambda c: (c.mode_plane != DONE).reshape(-1),
                     ac, sched, W, max_iters=it_cap)
    rid, bufs, dst = flush(ac, rid, bufs, dst, force=True)

    acc = ac.acc
    if defer:
        # ONE batched scatter of every ray's collected pending tc rows
        pend, cnt, tbuf = dst
        cot = tbuf[:, :P].reshape(-1)
        pos = jnp.stack([tbuf[:, P:2 * P].reshape(-1),
                         tbuf[:, 2 * P:3 * P].reshape(-1),
                         tbuf[:, 3 * P:].reshape(-1)], axis=-1)
        acc = _scatter_sig(acc, m, pos, cot, None)
    if res_on:
        dd = {nm: bufs[0][:, j] for j, nm in enumerate(res_f32)}
        dd["rvdepth"] = bufs[1][:, 0]
        dd["rvact"] = bufs[1][:, 1]

        def u(k):
            return dd[k][:n]

        def v3(a, b, c):
            return jnp.stack([u(a), u(b), u(c)], axis=-1)

        res = _Reservoir(wsum=v3("rw0", "rw1", "rw2"),
                         cur_w=v3("rc0", "rc1", "rc2"),
                         depth=u("rvdepth"),
                         o_l=v3("rvo0", "rvo1", "rvo2"),
                         d_l=v3("rvl0", "rvl1", "rvl2"),
                         d_w=v3("rvw0", "rvw1", "rvw2"),
                         maxt=u("rvmaxt"),
                         active=u("rvact") != 0)
        w_sub = _reservoir_get(res)
        acc = _drt_backward_flat(cfg, scene, seed, res, w_sub * dL, acc,
                                 engine="pallas")
    return finalize_accum(acc, m)
