"""Probe 10 (PLAN item 5): per-lane minormost-dim gather in Mosaic —
does `jnp.take_along_axis(tab(R,128,L), idx(R,128,K), axis=2)` compile and
return correct values?  If yes, a lane can keep a private small table
(e.g. its current supercell's voxel corner block) in VMEM planes and
resolve arrivals in-kernel, cutting the per-event XLA row gather.

Variants:
  a. L=8,  K=1  (single value from an 8-entry private table)
  b. L=32, K=1
  c. L=128,K=1
  d. L=8,  K=8  (8 corner values at once)
  e. select-chain baseline for L=8 (known-good: pure jnp.where)

Each variant is compiled separately (the remote compile helper HTTP-500s
with no diagnostics, so one failure must not mask the rest), checked
against numpy, and timed.  Run ON THE TPU.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = pl.BlockSpec(memory_space=pltpu.VMEM)
R = 2048  # 262144 lanes


def make_axis2(L, K):
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]                       # (R,128,L)
        idx = idx_ref[:]                       # (R,128,K)
        out_ref[:] = jnp.take_along_axis(tab, idx, axis=2).sum(-1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[V, V], out_specs=V)


def make_select_chain(L):
    def kernel(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:][:, :, 0]              # (R,128)
        out = jnp.zeros(idx.shape, jnp.float32)
        for l in range(L):
            out = jnp.where(idx == l, tab_ref[:, :, l], out)
        out_ref[:] = out

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[V, V], out_specs=V)


def run(name, call, tab, idx, ref, reps=10):
    try:
        f = jax.jit(call)
        out = np.asarray(f(tab, idx))
        ok = np.allclose(out, ref, atol=1e-5)
        t0 = time.time()
        for _ in range(reps):
            out = f(tab, idx)
        _ = float(jnp.asarray(out).sum())
        dt = (time.time() - t0) / reps
        print(f"{name}: {'OK ' if ok else 'WRONG VALUES '}"
              f"{dt*1e3:7.3f} ms ({dt/(R*128)*1e9:5.2f} ns/lane)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)


def main():
    import os
    only = os.environ.get("PROBE_VARIANT", "")
    rng = np.random.RandomState(0)
    for name, L, K, mk in [
        ("a. axis2 L=8  K=1", 8, 1, make_axis2),
        ("b. axis2 L=32 K=1", 32, 1, make_axis2),
        ("c. axis2 L=128 K=1", 128, 1, make_axis2),
        ("d. axis2 L=8  K=8", 8, 8, make_axis2),
        ("e. select-chain L=8", 8, 1, lambda L, K: make_select_chain(L)),
    ]:
        if only and not name.startswith(only):
            continue
        tab = jnp.asarray(rng.rand(R, 128, L), jnp.float32)
        idx = jnp.asarray(rng.randint(0, L, (R, 128, K)), jnp.int32)
        ref = np.take_along_axis(np.asarray(tab), np.asarray(idx),
                                 axis=2).sum(-1)
        run(name, mk(L, K), tab, idx, ref)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    main()
