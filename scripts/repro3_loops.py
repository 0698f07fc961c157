"""Probe 3: loops + gathers + integer ops inside Pallas kernels (megakernel
shape).  Run ON THE TPU: python -u scripts/repro3_loops.py"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = pl.BlockSpec(memory_space=pltpu.VMEM)


def probe(name, fn):
    try:
        ok = fn()
        print(f"{name}: {'PASS' if ok else 'WRONG-RESULT'}", flush=True)
        return ok
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL ({type(e).__name__}: {msg})", flush=True)
        return False


# --- 1) gather inside fori_loop, static idx --------------------------------
def probe_loop_gather_static():
    T = 512
    tab = jnp.asarray(np.random.rand(128, T), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, T, (128, T)), jnp.int32)

    def k(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            return acc + jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
        out_ref[:] = jax.lax.fori_loop(0, 4, body,
                                       jnp.zeros((128, T), jnp.float32))

    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, T), jnp.float32),
        in_specs=[V, V], out_specs=V))(tab, idx)
    return bool(jnp.allclose(out, 4 * jnp.take_along_axis(tab, idx, axis=1)))


# --- 2) gather inside fori_loop, loop-dependent idx ------------------------
def probe_loop_gather_dynamic():
    T = 512
    tab = jnp.asarray(np.random.rand(128, T), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, T, (128, T)), jnp.int32)

    def k(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            ix = jnp.remainder(idx_ref[:] + i, T)
            return acc + jnp.take_along_axis(tab_ref[:], ix, axis=1)
        out_ref[:] = jax.lax.fori_loop(0, 4, body,
                                       jnp.zeros((128, T), jnp.float32))

    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, T), jnp.float32),
        in_specs=[V, V], out_specs=V))(tab, idx)
    exp = sum(jnp.take_along_axis(tab, (idx + i) % T, axis=1) for i in range(4))
    return bool(jnp.allclose(out, exp))


# --- 3) while_loop: vector carry + any() cond + gather ---------------------
def probe_while_vec():
    T = 512
    tab = jnp.asarray(np.random.rand(128, T), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, T, (128, T)), jnp.int32)

    def k(tab_ref, idx_ref, out_ref):
        def cond(c):
            i, acc = c
            return (i < 7) & jnp.any(acc < 2.0)

        def body(c):
            i, acc = c
            g = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
            return i + 1, acc + g
        i, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((128, T), jnp.float32)))
        out_ref[:] = acc

    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, T), jnp.float32),
        in_specs=[V, V], out_specs=V))(tab, idx)
    g = jnp.take_along_axis(tab, idx, axis=1)
    # replicate host-side
    acc = jnp.zeros_like(g)
    i = 0
    while i < 7 and bool(jnp.any(acc < 2.0)):
        acc = acc + g
        i += 1
    return bool(jnp.allclose(out, acc))


# --- 4) uint32 TEA round ---------------------------------------------------
def probe_tea():
    x = jnp.asarray(np.random.randint(0, 2**31, (128, 256)), jnp.uint32)
    s = jnp.asarray(np.random.randint(0, 2**31, (128, 256)), jnp.uint32)

    def tea_mix(v0, v1):
        ssum = jnp.uint32(0)
        for _ in range(4):
            ssum = (ssum + jnp.uint32(0x9E3779B9)).astype(jnp.uint32)
            v0 = (v0 + (((v1 << 4) + jnp.uint32(0xA341316C)) ^ (v1 + ssum)
                        ^ ((v1 >> 5) + jnp.uint32(0xC8013EA4)))).astype(jnp.uint32)
            v1 = (v1 + (((v0 << 4) + jnp.uint32(0xAD90777D)) ^ (v0 + ssum)
                        ^ ((v0 >> 5) + jnp.uint32(0x7E95761E)))).astype(jnp.uint32)
        return v0

    def k(x_ref, s_ref, out_ref):
        bits = tea_mix(x_ref[:], s_ref[:])
        out_ref[:] = (bits >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / 16777216.0)

    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
        in_specs=[V, V], out_specs=V))(x, s)
    exp = (tea_mix(x, s) >> jnp.uint32(8)).astype(jnp.float32) / 16777216.0
    return bool(jnp.allclose(out, exp))


# --- 5) timing: gathers in fori_loop ---------------------------------------
def bench_gather():
    T, REPS = 2048, 512
    tab = jnp.asarray(np.random.rand(128, T), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, T, (128, T)), jnp.int32)

    def k(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            return acc + jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
        out_ref[:] = jax.lax.fori_loop(0, REPS, body,
                                       jnp.zeros((128, T), jnp.float32))

    f = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, T), jnp.float32),
        in_specs=[V, V], out_specs=V))
    _ = float(f(tab, idx).sum())
    t0 = time.time()
    s = float(f(tab, idx).sum())
    dt = time.time() - t0
    print(f"gather: {dt / REPS * 1e9:.0f} ns per (128,{T}); "
          f"{dt / (REPS * 128 * T) * 1e12:.2f} ps/elem (sum {s:.0f})",
          flush=True)
    return True


# --- 6) timing: elementwise FMA passes for calibration ---------------------
def bench_fma():
    T, REPS = 2048, 2048
    a = jnp.asarray(np.random.rand(128, T), jnp.float32)

    def k(a_ref, out_ref):
        def body(i, acc):
            return acc * 1.000001 + a_ref[:]
        out_ref[:] = jax.lax.fori_loop(0, REPS, body,
                                       jnp.zeros((128, T), jnp.float32))

    f = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, T), jnp.float32),
        in_specs=[V], out_specs=V))
    _ = float(f(a).sum())
    t0 = time.time()
    s = float(f(a).sum())
    dt = time.time() - t0
    print(f"fma: {dt / REPS * 1e9:.1f} ns per (128,{T}) pass; "
          f"{dt / (REPS * 128 * T) * 1e12:.2f} ps/elem (sum {s:.0f})",
          flush=True)
    return True


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    ok1 = probe("1 fori_loop gather static", probe_loop_gather_static)
    probe("2 fori_loop gather dynamic idx", probe_loop_gather_dynamic)
    probe("3 while_loop vec carry + gather", probe_while_vec)
    probe("4 uint32 TEA", probe_tea)
    if ok1:
        probe("5 gather timing", bench_gather)
    probe("6 fma timing", bench_fma)
