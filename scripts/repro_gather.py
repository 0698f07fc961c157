"""Minimal repro: dynamic gather inside a Pallas TPU kernel.

Round-1 status: every `jnp.take_along_axis` lowering inside a Pallas kernel
crashed the axon remote tpu_compile_helper (HTTP 500). Retry with several
lowering variants to find one the current toolchain accepts.

Run ON THE TPU (no env overrides):  python -u scripts/repro_gather.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 512, 128


def kernel_take_axis0(tab_ref, idx_ref, out_ref):
    # out[i, j] = tab[idx[i, j], j]
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)


def kernel_take_axis1(tab_ref, idx_ref, out_ref):
    # out[i, j] = tab[i, idx[i, j]]
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)


def kernel_onehot_matmul(tab_ref, idx_ref, out_ref):
    # Reference "gather without gather": one-hot matmul on the MXU.
    # out[i, j] = sum_k onehot[i, k] * tab[k, j]  with onehot from idx[:, 0]
    ids = idx_ref[:, 0:1]                            # (R, 1)
    k = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    onehot = (k == ids).astype(jnp.float32)          # (R, R)
    out_ref[:] = jnp.dot(onehot, tab_ref[:], preferred_element_type=jnp.float32)


def run(name, kernel, axis):
    tab = jnp.asarray(np.random.rand(R, C), jnp.float32)
    if axis == 0:
        idx = jnp.asarray(np.random.randint(0, R, (R, C)), jnp.int32)
        expect = jnp.take_along_axis(tab, idx, axis=0)
    elif axis == 1:
        idx = jnp.asarray(np.random.randint(0, C, (R, C)), jnp.int32)
        expect = jnp.take_along_axis(tab, idx, axis=1)
    else:  # onehot
        idx = jnp.asarray(np.random.randint(0, R, (R, C)), jnp.int32)
        expect = tab[idx[:, 0], :]
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = jax.jit(fn)(tab, idx)
        ok = bool(jnp.allclose(out, expect))
        print(f"{name}: COMPILED, correct={ok}", flush=True)
        return ok
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAILED ({type(e).__name__}: {msg})", flush=True)
        return False


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "axis1"):
        run("take_along_axis(axis=1)", kernel_take_axis1, 1)
    if which in ("all", "axis0"):
        run("take_along_axis(axis=0)", kernel_take_axis0, 0)
    if which in ("all", "onehot"):
        run("onehot_matmul", kernel_onehot_matmul, None)
