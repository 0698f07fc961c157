"""Probe: per-lane small-table lookup via PLANES layout (L, R, 128).

repro7's (R, 128, L) last-dim-sliced operands hang the Mosaic compile
service (>10 min, no diagnostic).  Here the table is stored as L separate
(R, 128) planes — every op is 2-D, slicing is on the LEADING dim, which
this toolchain is known to handle.

  out[i,j] = tab[idx[i,j], i, j]  via  sum_l where(idx==l, tab[l], 0)

Variants:
  onehot  : L-term unrolled select+accumulate (VPU cost O(L))
  tree    : same but pairwise-tree reduction of the selected planes
  loop8   : 8 dependent lookups (mimics a tracking walk), fori_loop outside
            the unrolled select — REF accumulation

Run ON THE TPU:  python -u scripts/repro8_planes.py [onehot|tree|loop8] [L]
Output is incremental (flush=True); redirect to a file, don't pipe to tail.
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


def make(L, kernel):
    return pl.pallas_call(
        functools.partial(kernel, L),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def kernel_onehot(L, tab_ref, idx_ref, out_ref):
    idx = idx_ref[:]
    acc = jnp.zeros((R, 128), jnp.float32)
    for l in range(L):
        acc = acc + jnp.where(idx == l, tab_ref[l], 0.0)
    out_ref[:] = acc


def kernel_tree(L, tab_ref, idx_ref, out_ref):
    idx = idx_ref[:]
    vals = [jnp.where(idx == l, tab_ref[l], 0.0) for l in range(L)]
    while len(vals) > 1:
        vals = [a + b for a, b in zip(vals[::2], vals[1::2])] \
            + ([vals[-1]] if len(vals) % 2 else [])
    out_ref[:] = vals[0]


def kernel_loop8(L, tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.zeros((R, 128), jnp.float32)

    def body(k, idx):
        acc = jnp.zeros((R, 128), jnp.float32)
        for l in range(L):
            acc = acc + jnp.where(idx == l, tab_ref[l], 0.0)
        out_ref[:] += acc
        return (idx + 1 + (acc > 0.5).astype(jnp.int32)) % L

    jax.lax.fori_loop(0, 8, body, idx_ref[:])


KERNELS = {"onehot": kernel_onehot, "tree": kernel_tree,
           "loop8": kernel_loop8}


def run(name, fn, tab, idx, expect, reps=3):
    try:
        t0 = time.time()
        out = jax.jit(fn)(tab, idx)
        s = float(out.sum())
        print(f"{name}: COMPILED in {time.time()-t0:.0f}s", flush=True)
        ok = True if expect is None else bool(
            np.allclose(np.asarray(out), expect))
        print(f"{name}: correct={ok}", flush=True)
        if ok and reps:
            t0 = time.time()
            for _ in range(reps):
                out = jax.jit(fn)(tab, idx)
            s = float(out.sum())
            dt = (time.time() - t0) / reps
            print(f"{name}: {dt*1e3:.2f} ms/call "
                  f"({dt/(R*128)*1e9:.2f} ns/lane) sum={s:.0f}", flush=True)
        return ok
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]})", flush=True)
        return False


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "onehot"
    Ls = [int(sys.argv[2])] if len(sys.argv) > 2 else [27, 125]
    for L in Ls:
        tab = jnp.asarray(np.random.rand(L, R, 128), jnp.float32)
        idx = jnp.asarray(np.random.randint(0, L, (R, 128)), jnp.int32)
        expect = None if which == "loop8" else np.asarray(
            jnp.take_along_axis(jnp.moveaxis(tab, 0, -1),
                                idx[:, :, None], axis=2)[:, :, 0])
        run(f"{which} (L={L})", make(L, KERNELS[which]), tab, idx, expect)
