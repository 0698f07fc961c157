"""Measure the per-step cost split of the hybrid engine on the TPU:
(a) XLA corner-table row gather alone, (b) fused kernel alone,
(c) both chained, at the bench shapes.  Also the gather at 8-float rows.
Run ON THE TPU."""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from uivr_tpu.config import smoke_scene
from uivr_tpu.integrators import VolpathConfig
from uivr_tpu.ops import volpath_step as vk
from uivr_tpu.scene import Scene, finalize_medium


def timeit(name, f, *args, reps=20):
    out = f(*args)
    s = float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    s = float(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.3f} ms  (sum {s:.1f})", flush=True)
    return dt


def main():
    import os
    n = int(os.environ.get("N", 262144))
    R = n // 128
    b = smoke_scene(res=64, resx=128, resy=128, n_sensors=4)
    m = finalize_medium(b.params, b.medium_cfg, b.to_world)
    sc = Scene(medium=m, emitter=b.emitter, cameras=b.cameras)
    rng = np.random.RandomState(0)
    px = jnp.asarray(rng.rand(R, 128), jnp.float32)
    py = jnp.asarray(rng.rand(R, 128), jnp.float32)
    pz = jnp.asarray(rng.rand(R, 128), jnp.float32)

    # (a) XLA row gather (combined 32-float rows)
    @jax.jit
    def ga(px, py, pz):
        return vk._sigma_albedo_planes(m, px, py, pz)
    timeit("a xla sigma_albedo rows (32f)", ga, px, py, pz)

    # (a2) sigma-only corner rows (8 floats)
    @jax.jit
    def ga2(px, py, pz):
        from uivr_tpu.core.grids import trilinear_sample_ct
        p = jnp.stack([px.reshape(n), py.reshape(n), pz.reshape(n)], -1)
        return trilinear_sample_ct(m.sigma_ct, m.params.sigma_t.shape, p)
    timeit("a2 xla sigma-only rows (8f)", ga2, px, py, pz)

    # (a3) raw row gather without trilinear math
    tab = m.combined_ct

    @jax.jit
    def ga3(px):
        idx = jnp.clip((px * tab.shape[0]).astype(jnp.int32), 0,
                       tab.shape[0] - 1)
        return tab[idx].sum(-1)
    timeit("a3 raw row gather (n,32)", ga3, px)

    # (b) kernel alone (priming call, do_post False->True toggle irrelevant)
    cfg = VolpathConfig(max_depth=32, rr_depth=8, engine="pallas")
    step = vk._make_step(cfg, sc, R, interpret=False)
    smp0 = vk.make_lane_sampler(jnp.uint32(1), n_lanes=n)
    o = jnp.stack([px.reshape(n), py.reshape(n), pz.reshape(n)], -1) * 0.0
    d = jnp.concatenate([jnp.ones((n, 1)), jnp.full((n, 1), 0.3),
                         jnp.full((n, 1), 0.2)], axis=-1)
    carry = vk._init_carry(sc, o, d, smp0, None)
    pc = vk.pack_carry(carry, R)

    @jax.jit
    def kern_only(pc):
        return step(pc, do_post=True)
    timeit("c gather+kernel step", kern_only, pc)

    @jax.jit
    def kern_pre(pc):
        return step(pc, do_post=False)
    timeit("b kernel (pre-only path, incl zero-gather)", kern_pre, pc)

    # ---- IN-GRAPH loops: the relay host round-trip (~ms) contaminates
    # the standalone numbers above at narrow widths; loop L dispatches
    # inside one program and divide.
    L = 64

    @jax.jit
    def g_loop(px, py, pz):
        def body(i, c):
            px, py, pz = c
            s, a0, a1, a2 = vk._sigma_albedo_planes(m, px, py, pz)
            # data dependency chains iterations; keeps values in [0,1)
            px = (px + s * 1e-7) % 1.0
            py = (py + a0 * 1e-7) % 1.0
            pz = (pz + a1 * 1e-7) % 1.0
            return (px, py, pz)
        return jax.lax.fori_loop(0, L, body, (px, py, pz))
    dg = timeit("d in-graph gather loop", g_loop, px, py, pz, reps=5)

    @jax.jit
    def s_loop(pc):
        return jax.lax.fori_loop(
            0, L, lambda i, c: step(c, do_post=True), pc)
    ds = timeit("e in-graph step loop", s_loop, pc, reps=5)
    print(f"per-dispatch: gather {dg/L*1e3:.3f} ms "
          f"({dg/L/n*1e9:.1f} ns/lane), full step {ds/L*1e3:.3f} ms "
          f"({ds/L/n*1e9:.1f} ns/lane), kernel-part "
          f"{(ds-dg)/L*1e3:.3f} ms", flush=True)

    # ---- g: ADJOINT in-graph step loop + isolated scatter cost (the
    # parity bench's bwd share is 73%: is it the 1+tgs scatter ROWS per
    # dispatch, the gather, or the 3-walk kernel?)
    from uivr_tpu.core.rng import lane_fork
    from uivr_tpu.scene.gradients import init_accum, scatter_sigma_albedo
    cfg_a = VolpathConfig(max_depth=32, rr_depth=1064, engine="pallas",
                          trans_grad_samples=4)
    astep = vk._make_adj_step(cfg_a, sc, R, interpret=False)
    smp = vk.make_lane_sampler(jnp.uint32(3), n_lanes=n)
    carry0 = vk._init_carry(sc, o, d, smp, None)
    carry0 = carry0._replace(result=jnp.zeros((n, 3), jnp.float32))
    base = vk.pack_carry(carry0, R)
    alt = lane_fork(smp, 0x9E3779B9)
    z = jnp.zeros((R, 128), jnp.float32)
    zi = jnp.zeros((R, 128), jnp.int32)

    def p2(x):
        return x.reshape(R, 128)

    dL = jnp.full((n, 3), 1e-4, jnp.float32)
    adj_planes = (
        z, z, z, z, z,
        p2(dL[:, 0]), p2(dL[:, 1]), p2(dL[:, 2]),
        z, z, z, z, z, z,
        z, z, z, z, z, z, z, z, z, z,
        p2(alt.h).view(jnp.int32), zi,
        zi, zi, zi - 1, zi)
    ac0 = vk.AdjCarry(planes=base.planes + adj_planes,
                      acc=init_accum(m, vary=jnp.float32(0.0),
                                     need_emission=False),
                      it=jnp.int32(0))

    @jax.jit
    def a_loop(ac):
        ac = astep(ac, do_post=False)
        return jax.lax.fori_loop(
            0, L, lambda i, c: astep(c, do_post=True), ac)
    da = timeit("g in-graph ADJOINT step loop", a_loop, ac0, reps=3)
    print(f"   -> {da/L*1e3:.3f} ms/dispatch ({da/L/n*1e9:.1f} ns/lane)",
          flush=True)

    # isolated (1+tgs)-row scatter-add at dispatch width
    ps5 = jnp.concatenate([jnp.stack([px.reshape(n), py.reshape(n),
                                      pz.reshape(n)], -1)] * 5)
    cs5 = jnp.concatenate([px.reshape(n)] * 5) * 1e-6
    ca5 = jnp.zeros((5 * n, 3), jnp.float32)

    @jax.jit
    def sc_loop(ps):
        def body(i, st):
            ps, acc = st
            acc = scatter_sigma_albedo(acc, m, ps, cs5, ca5, None)
            return (ps + 1e-9, acc)
        return jax.lax.fori_loop(
            0, L, body, (ps, init_accum(m, vary=jnp.float32(0.0),
                                        need_emission=False)))
    dsc = timeit("h in-graph 5-row scatter loop", sc_loop, ps5, reps=3)
    print(f"   -> {dsc/L*1e3:.3f} ms/dispatch "
          f"({dsc/L/n*1e9:.1f} ns/lane over {5}x rows)", flush=True)

    # ---- i: scatter/set row costs vs width (validates the round-4
    # reservoir-collection consolidation and the deferred-tc design):
    # .at[idx].add of (n, w) rows and .at[idx].set of (n, w) rows.
    for w, op in ((1, "add"), (8, "add"), (32, "add"),
                  (1, "set"), (16, "set")):
        dst = jnp.zeros((262144 + 1, w), jnp.float32)
        vals = jnp.asarray(np.random.RandomState(3).rand(n, w), jnp.float32)
        ix0 = jnp.asarray(
            np.random.RandomState(4).randint(0, 262144, n), jnp.int32)

        @jax.jit
        def i_loop(ix, dst, vals, _op=op):
            def body(i, st):
                ix, dst = st
                if _op == "add":
                    dst = dst.at[ix].add(vals, mode="drop")
                else:
                    dst = dst.at[ix].set(vals, mode="drop")
                ix = (ix + dst[0, 0].astype(jnp.int32) + 7) % 262144
                return (ix, dst)
            return jax.lax.fori_loop(0, L, body, (ix, dst))
        dwi = timeit(f"i in-graph row {op} w={w}", i_loop, ix0, dst, vals,
                     reps=5)
        print(f"   -> {dwi/L*1e3:.3f} ms/dispatch, "
              f"{dwi/L/n*1e9:.2f} ns/row", flush=True)

    # ---- f: raw row gather cost vs ROW WIDTH, in-graph (does fetching a
    # 128-float block-row cost more than an 8-float row?  If not, fetching
    # per-supercell corner BLOCKS on entry instead of per-event rows pays
    # whenever entries/lane < events/lane).
    for w in (8, 32, 128):
        tabw = jnp.asarray(
            np.random.RandomState(1).rand(262144, w), jnp.float32)

        @jax.jit
        def w_loop(ix):
            def body(i, ix):
                rows = tabw[ix]                       # (n, w) row gather
                return (ix + rows[:, :1].astype(jnp.int32)[:, 0]
                        + 1) % tabw.shape[0]
            return jax.lax.fori_loop(
                0, L, body, ix)
        ix0 = jnp.asarray(
            np.random.RandomState(2).randint(0, 262144, n), jnp.int32)
        dw = timeit(f"f in-graph raw row gather w={w}", w_loop, ix0,
                    reps=5)
        print(f"   -> {dw/L*1e3:.3f} ms/dispatch, "
              f"{dw/L/n*1e9:.2f} ns/row", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    main()
