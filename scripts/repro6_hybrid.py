"""Probe 6: the plan-A fused-step construct set in ONE kernel:
(R,128) planes, chunked 128-lane table shuffle, TEA draws, transcendentals,
aliasing, driven from an XLA while_loop with an XLA gather in between.
Run ON THE TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from uivr_tpu.ops.volpath_step import tea_i32
def to_unit_i32(b):
    import jax
    return jax.lax.shift_right_logical(b, 8).astype("float32") * (1.0 / 16777216.0)

V = pl.BlockSpec(memory_space=pltpu.VMEM)
R = 2048          # 262144 lanes
Tm = 512          # majorant-table entries


def chunk_shuffle(tab_rows, idx):
    """tab_rows: tuple of (1,128) rows; idx (R,128) in [0, 128*len)."""
    local = idx & 127
    chunk = idx >> 7
    out = jnp.zeros(idx.shape, jnp.float32)
    for c, row in enumerate(tab_rows):
        g = jnp.take_along_axis(jnp.broadcast_to(row, idx.shape), local,
                                axis=1)
        out = jnp.where(chunk == c, g, out)
    return out


def kernel(maj_ref, x_ref, h_ref, d_ref, x_out, h_out, d_out):
    x = x_ref[:]
    h = h_ref[:]
    dim = d_ref[:]
    # TEA draw
    b0, _ = tea_i32(h, dim)
    u = to_unit_i32(b0)
    dim = dim + 1
    # majorant lookup via chunked lane shuffle
    idx = jnp.clip((x * Tm).astype(jnp.int32), 0, Tm - 1)
    rows = [maj_ref[c:c + 1, :] for c in range(Tm // 128)]
    m = chunk_shuffle(rows, idx)
    # transcendental mix (step sampling shape)
    step = -jnp.log1p(-u) / jnp.maximum(m, 1e-3)
    x = jnp.mod(x + step * 0.01 + jnp.sin(x) * 1e-3, 1.0)
    x_out[:] = x
    h_out[:] = h
    d_out[:] = dim


def main():
    maj = jnp.asarray(np.random.rand(4, 128) + 0.5, jnp.float32)
    table = jnp.asarray(np.random.rand(4096, 8), jnp.float32)

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.float32),
                   jax.ShapeDtypeStruct((R, 128), jnp.int32),
                   jax.ShapeDtypeStruct((R, 128), jnp.int32)],
        in_specs=[V] * 4, out_specs=[V] * 3,
        input_output_aliases={1: 0, 2: 1, 3: 2})

    @jax.jit
    def drive(x, h, d):
        def body(c):
            i, x, h, d = c
            # XLA row gather between kernel steps (the hybrid structure)
            cell = jnp.clip((x * 4096).astype(jnp.int32), 0, 4095)
            rows = table[cell]                     # (R,128,8) row gather
            sig = rows.mean(-1)
            x = jnp.mod(x + sig * 1e-3, 1.0)
            x, h, d = call(maj, x, h, d)
            return i + 1, x, h, d

        def cond(c):
            return c[0] < 8
        return jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), x, h, d))

    x0 = jnp.asarray(np.random.rand(R, 128), jnp.float32)
    h0 = jnp.arange(R * 128, dtype=jnp.int32).reshape(R, 128)
    d0 = jnp.zeros((R, 128), jnp.int32)
    i, x, h, d = drive(x0, h0, d0)
    _ = float(x.sum())
    print("compiled + ran; d[0,0] =", int(d[0, 0]), flush=True)

    # host check of one step
    from uivr_tpu.core.rng import tea as tea_u32, _to_unit_float
    xr, hr, dr = x0, h0, d0
    for _ in range(8):
        cell = jnp.clip((xr * 4096).astype(jnp.int32), 0, 4095)
        sig = table[cell].mean(-1)
        xr = jnp.mod(xr + sig * 1e-3, 1.0)
        b0, _ = tea_u32(hr.view(jnp.uint32), dr.view(jnp.uint32), rounds=8)
        u = _to_unit_float(b0)
        dr = dr + 1
        idx = jnp.clip((xr * Tm).astype(jnp.int32), 0, Tm - 1)
        m = maj.reshape(-1)[idx]
        step = -jnp.log1p(-u) / jnp.maximum(m, 1e-3)
        xr = jnp.mod(xr + step * 0.01 + jnp.sin(xr) * 1e-3, 1.0)
    err = float(jnp.max(jnp.abs(x - xr)))
    print(f"err vs host: {err:.2e} -> {'PASS' if err < 1e-5 else 'FAIL'}",
          flush=True)

    # timing
    t0 = time.time()
    for _ in range(10):
        i, x, h, d = drive(x0, h0, d0)
    _ = float(x.sum())
    dt = (time.time() - t0) / 10 / 8
    n = R * 128
    print(f"hybrid step: {dt * 1e3:.3f} ms for {n} rays "
          f"({dt / n * 1e9:.2f} ns/ray)", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    main()
