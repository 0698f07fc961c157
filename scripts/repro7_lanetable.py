"""Probe: per-lane small-table lookup inside a Pallas TPU kernel.

Goal: let each lane carry its current supercell's sigma voxel block
(L = (factor+1)^3 floats, e.g. 27 or 125) in VMEM planes and resolve every
tracking arrival in-kernel, so the XLA row gather is paid per SUPERCELL
ENTRY instead of per collision event.

Three lowerings probed (the first that compiles + is correct + is fast
wins):
  A. native     out[i,j] = tab[i, j, idx[i,j]]   (take_along_axis axis=2)
  B. onehot     sum_l tab[..., l] * (l == idx)   (elementwise+reduce, no
                gather support needed; cost O(L) VPU ops)
  C. loop       in-kernel fori_loop over 8 one-hot lookups with REF-based
                accumulation (the shape the real tracking loop needs)

Also times B at L in {32, 128} against the XLA row-gather baseline.

Run ON THE TPU:  python -u scripts/repro7_lanetable.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 2048            # 262144 lanes


def make(L, kernel, n_out=1):
    return pl.pallas_call(
        functools.partial(kernel, L),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def kernel_native(L, tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(
        tab_ref[:], idx_ref[:][:, :, None], axis=2)[:, :, 0]


def kernel_onehot(L, tab_ref, idx_ref, out_ref):
    idx = idx_ref[:]
    acc = jnp.zeros((R, 128), jnp.float32)
    tab = tab_ref[:]
    for l in range(L):
        acc = acc + jnp.where(idx == l, tab[:, :, l], 0.0)
    out_ref[:] = acc


def kernel_onehot_bcast(L, tab_ref, idx_ref, out_ref):
    # single broadcasted select+reduce (lets Mosaic pick the schedule)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128, L), 2)
    sel = (lane == idx_ref[:][:, :, None]).astype(jnp.float32)
    out_ref[:] = jnp.sum(tab_ref[:] * sel, axis=2)


def kernel_loop_refs(L, tab_ref, idx_ref, out_ref):
    # 8 dependent one-hot lookups, state in the output ref (scratch shape):
    # lookup -> new index = (value-derived), mimicking a tracking walk
    out_ref[:] = jnp.zeros((R, 128), jnp.float32)

    def body(k, idx):
        tab = tab_ref[:]
        acc = jnp.zeros((R, 128), jnp.float32)
        for l in range(L):
            acc = acc + jnp.where(idx == l, tab[:, :, l], 0.0)
        out_ref[:] += acc
        return (idx + acc.astype(jnp.int32) + 1) % L

    jax.lax.fori_loop(0, 8, body, idx_ref[:])


def expect_lookup(tab, idx):
    return np.take_along_axis(np.asarray(tab),
                              np.asarray(idx)[:, :, None], axis=2)[:, :, 0]


def run(name, fn, tab, idx, expect, reps=0):
    try:
        out = jax.jit(fn)(tab, idx)
        ok = (True if expect is None
              else bool(np.allclose(np.asarray(out), expect)))
        msg = f"{name}: COMPILED, correct={ok}"
        if ok and reps:
            t0 = time.time()
            for _ in range(reps):
                out = jax.jit(fn)(tab, idx)
            s = float(out.sum())     # data-dependent fetch (axon timing)
            dt = (time.time() - t0) / reps
            msg += f", {dt*1e3:.2f} ms/call ({dt/ (R*128) * 1e9:.2f} ns/lane) sum={s:.0f}"
        print(msg, flush=True)
        return ok
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]})", flush=True)
        return False


def xla_baseline(L, reps=5):
    # the op being replaced: one row gather of a 32-wide row per event
    tabL = jnp.asarray(np.random.rand(200000, 32), jnp.float32)
    idxL = jnp.asarray(np.random.randint(0, 200000, (R * 128,)), jnp.int32)

    @jax.jit
    def f(t, i):
        return t[i].sum(axis=-1)

    f(tabL, idxL).block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = f(tabL, idxL)
    s = float(out.sum())
    dt = (time.time() - t0) / reps
    print(f"XLA row-gather baseline (200k x 32): {dt*1e3:.2f} ms/call "
          f"({dt/(R*128)*1e9:.2f} ns/lane) sum={s:.0f}", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for L in (32, 128):
        tab = jnp.asarray(np.random.rand(R, 128, L), jnp.float32)
        idx = jnp.asarray(np.random.randint(0, L, (R, 128)), jnp.int32)
        expect = expect_lookup(tab, idx)
        if which in ("all", "native"):
            run(f"native axis=2 (L={L})", make(L, kernel_native), tab, idx,
                expect, reps=3)
        if which in ("all", "onehot"):
            run(f"onehot unrolled (L={L})", make(L, kernel_onehot), tab, idx,
                expect, reps=3)
            run(f"onehot broadcast (L={L})", make(L, kernel_onehot_bcast),
                tab, idx, expect, reps=3)
        if which in ("all", "loop"):
            run(f"fori+refs 8 lookups (L={L})", make(L, kernel_loop_refs),
                tab, idx, expect=None, reps=3)
    if which in ("all", "baseline"):
        xla_baseline(32)
