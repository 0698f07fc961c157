"""Probe 2: Mosaic primitives needed for the fused tracking megakernel.

Each probe compiles a tiny kernel and prints PASS/FAIL; failures are caught
so later probes still run.  Run ON THE TPU: python -u scripts/repro2_primitives.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        ok = fn()
        print(f"{name}: {'PASS' if ok else 'WRONG-RESULT'}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL ({type(e).__name__}: {msg})", flush=True)


def vmem(shape, dtype=jnp.float32):
    return pl.BlockSpec(memory_space=pltpu.VMEM)


# --- a) axis-1 gather with operand (128, T) and idx (128, K), T != K -------
def probe_mixed_shapes():
    T, K = 4096, 256
    tab = jnp.asarray(np.random.rand(128, T), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, T, (128, K)), jnp.int32)

    def k(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, K), jnp.float32),
        in_specs=[vmem(None), vmem(None)], out_specs=vmem(None)))(tab, idx)
    return bool(jnp.allclose(out, jnp.take_along_axis(tab, idx, axis=1)))


# --- b) bf16 operand gather ------------------------------------------------
def probe_bf16_gather():
    T = 512
    tab = jnp.asarray(np.random.rand(128, T), jnp.bfloat16)
    idx = jnp.asarray(np.random.randint(0, T, (128, T)), jnp.int32)

    def k(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, T), jnp.bfloat16),
        in_specs=[vmem(None), vmem(None)], out_specs=vmem(None)))(tab, idx)
    return bool((out == jnp.take_along_axis(tab, idx, axis=1)).all())


# --- c) in-kernel transpose (128, K) -> (K, 128) ---------------------------
def probe_transpose():
    K = 256
    x = jnp.asarray(np.random.rand(128, K), jnp.float32)

    def k(x_ref, out_ref):
        out_ref[:] = x_ref[:].T

    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((K, 128), jnp.float32),
        in_specs=[vmem(None)], out_specs=vmem(None)))(x)
    return bool(jnp.allclose(out, x.T))


# --- d) in-kernel reshape (8,128) -> (1,1024) ------------------------------
def probe_flatten():
    x = jnp.asarray(np.random.rand(8, 128), jnp.float32)

    def k(x_ref, out_ref):
        out_ref[:] = x_ref[:].reshape(1, 1024)

    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.float32),
        in_specs=[vmem(None)], out_specs=vmem(None)))(x)
    return bool(jnp.allclose(out, x.reshape(1, 1024)))


# --- e) broadcast column (128,1) -> (128,128) row-replicated ---------------
def probe_col_to_rows():
    x = jnp.asarray(np.random.rand(128, 4), jnp.float32)

    def k(x_ref, out_ref):
        col = x_ref[:, 0:1]            # (128,1)
        out_ref[:] = jnp.broadcast_to(col.T, (128, 128))  # row s = x[s,0]? no: out[i,j]=x[j,0]

    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[vmem(None)], out_specs=vmem(None)))(x)
    return bool(jnp.allclose(out, jnp.broadcast_to(x[:, 0:1].T, (128, 128))))


# --- f) hardware PRNG ------------------------------------------------------
def probe_prng():
    def k(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.prng_random_bits((128, 256))
        out_ref[:] = (bits >> 8).astype(jnp.float32) * (1.0 / 16777216.0)

    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=vmem(None)))(jnp.array([7], jnp.int32))
    m = float(out.mean())
    return 0.45 < m < 0.55


# --- g) while_loop with scalar carry + early exit inside kernel ------------
def probe_while():
    def k(x_ref, out_ref):
        def cond(c):
            i, acc = c
            return (i < 50) & (acc < 100.0)

        def body(c):
            i, acc = c
            return i + 1, acc + x_ref[0, 0]

        i, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0)))
        out_ref[0, 0] = acc

    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[vmem(None)], out_specs=vmem(None)))(
            jnp.full((8, 128), 3.0, jnp.float32))
    return abs(float(out[0, 0]) - 102.0) < 1e-5


# --- h) VMEM capacity probe ------------------------------------------------
def probe_vmem(mb):
    n = mb * 1024 * 1024 // (128 * 4)

    def k(x_ref, out_ref):
        out_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((n, 128), jnp.float32)
    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        in_specs=[vmem(None)], out_specs=vmem(None),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * mb * 1024 * 1024 + (1 << 20))))(x)
    return bool(out[0, 0] == 2.0)


# --- i) gather throughput --------------------------------------------------
def bench_gather():
    T, K, REPS = 2048, 2048, 256
    tab = jnp.asarray(np.random.rand(128, T), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, T, (128, K)), jnp.int32)

    def k(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            g = jnp.take_along_axis(tab_ref[:], idx_ref[:] ^ i, axis=1)
            return acc + g
        out_ref[:] = jax.lax.fori_loop(0, REPS, body,
                                       jnp.zeros((128, K), jnp.float32))

    f = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, K), jnp.float32),
        in_specs=[vmem(None), vmem(None)], out_specs=vmem(None)))
    out = f(tab, idx)
    _ = float(out.sum())
    t0 = time.time()
    out = f(tab, idx)
    s = float(out.sum())
    dt = time.time() - t0
    per_gather_ns = dt / REPS * 1e9
    per_elem_ps = dt / (REPS * 128 * K) * 1e12
    print(f"gather timing: {per_gather_ns:.0f} ns per (128,{K}) gather, "
          f"{per_elem_ps:.1f} ps/elem  (checksum {s:.1f})", flush=True)
    return True


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    probe("a mixed-shape axis1 gather (T=4096,K=256)", probe_mixed_shapes)
    probe("b bf16 gather", probe_bf16_gather)
    probe("c transpose (128,256)", probe_transpose)
    probe("d reshape (8,128)->(1,1024)", probe_flatten)
    probe("e col->rows broadcast", probe_col_to_rows)
    probe("f prng_random_bits", probe_prng)
    probe("g while_loop scalar carry", probe_while)
    for mb in (8, 16, 32, 64):
        probe(f"h vmem {mb} MB in+out", lambda mb=mb: probe_vmem(mb))
    probe("i gather timing", bench_gather)
