"""Probe 13 (round 4): can the kernel fetch table rows from HBM ITSELF?

Three mechanisms that would remove the per-event XLA sigma row gather
(PLAN.md: the wall is ~2/3 of step cost at wide wavefronts, worse at the
persistent scheduler's narrow widths):

  a. In-kernel dynamic `pltpu.make_async_copy(hbm.at[i], vmem, sem)` where
     `i` comes from SMEM — a scalar-indexed block gather under kernel
     control.  If this compiles, a grid-free kernel can DMA each
     supercell's corner block on entry and walk events from VMEM.
  b. `pltpu.PrefetchScalarGridSpec` with a data-dependent BlockSpec
     index_map (`lambda i, idx_ref: (idx_ref[i], 0)`) — the Pallas
     embedding-lookup pattern: grid step i fetches table row idx[i].
  c. One-hot MXU gather with the split-bf16 trick at T<=512: two exact
     bf16 planes (hi + residual) make the f32 one-hot matmul selection
     exact to ~16 mantissa bits; checked against numpy for EXACT equality
     of the hi+lo reconstruction vs a direct f32 gather.

Each probe compiles separately (the remote Mosaic helper HTTP-500s without
diagnostics; one failure must not mask the rest).  Run ON THE TPU.
"""
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = pl.BlockSpec(memory_space=pltpu.VMEM)
INTERP = "--interpret" in sys.argv


def timeit(f, *args, reps=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def probe(name, fn):
    try:
        dt, ok = fn()
        print(f"[{name}] OK correct={ok} t={dt*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"[{name}] FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        if "--trace" in sys.argv:
            traceback.print_exc()


# ---------------------------------------------------------------------- a
def probe_dma_dynamic_row():
    T, ROW = 4096, 128
    R = 64                                   # 64 sequential row fetches

    def kernel(idx_ref, tab_hbm, out_ref):
        def body(scratch, sem):
            def one(i, _):
                dma = pltpu.make_async_copy(
                    tab_hbm.at[idx_ref[i]], scratch.at[0], sem)
                dma.start()
                dma.wait()
                out_ref[i, :] = scratch[0]
                return 0
            jax.lax.fori_loop(0, R, one, 0)
        pl.run_scoped(body, scratch=pltpu.VMEM((1, ROW), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA(()))

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, ROW), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=V,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERP)

    tab = jnp.asarray(np.random.RandomState(0).rand(T, ROW), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, T, R), jnp.int32)
    f = jax.jit(lambda i, t: call(i, t))
    dt, out = timeit(f, idx, tab)
    ref = np.asarray(tab)[np.asarray(idx)]
    return dt, bool(np.array_equal(np.asarray(out), ref))


# ---------------------------------------------------------------------- b
def probe_scalar_prefetch_gather():
    T, ROW, G = 4096, 128, 512               # 512-row gather via grid

    def kernel(idx_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, ROW), lambda i, idx_ref: (idx_ref[i], 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ROW), lambda i, idx_ref: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, ROW), jnp.float32),
        grid_spec=grid_spec, interpret=INTERP)

    tab = jnp.asarray(np.random.RandomState(0).rand(T, ROW), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, T, G), jnp.int32)
    f = jax.jit(lambda i, t: call(i, t))
    dt, out = timeit(f, idx, tab)
    ref = np.asarray(tab)[np.asarray(idx)]
    return dt, bool(np.array_equal(np.asarray(out), ref))


# ---------------------------------------------------------------------- c
def probe_onehot_split_bf16():
    T, R = 512, 512                           # (R*128) lanes gather from T

    def kernel(idx_ref, hi_ref, lo_ref, out_ref):
        idx = idx_ref[:]                      # (R,128) int32
        # one-hot (R*128? no: per row-block) — process as (R,128)->(R,128)
        # via a (128, T) one-hot per sublane row is rank-3; instead flatten
        # rows: each kernel invocation handles one (8,128) tile is too
        # fine.  Simplest shape: treat lanes as rows of a (N, T) one-hot
        # with N = R*128 requires reshape; Mosaic reshapes (R,128)->(N,1)
        # are fine on the minormost axis only, so keep (R,128) and loop
        # sublane-tiles via dot over the T axis:
        # oh[r,l,t] = (idx[r,l]==t) ; out = sum_t oh * tab[t]
        # expressed as matmul: (R*128, T) @ (T, 1) per channel is awkward;
        # use the broadcast-select sum instead for correctness reference
        # and the MXU path as dot((R,128)->? ) — here we do the simple
        # contraction with dot_general over a T-chunked loop.
        acc_hi = jnp.zeros(idx.shape, jnp.float32)
        acc_lo = jnp.zeros(idx.shape, jnp.float32)
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        for c in range(T // 128):             # unrolled chunks of 128
            sl = slice(c * 128, (c + 1) * 128)
            oh = (idx[..., None] == t_ids[0, sl][None, None, :]
                  ).astype(jnp.bfloat16)      # (R,128,128)
            hi = hi_ref[sl].astype(jnp.bfloat16)   # (128,)? needs 2D
            acc_hi += jax.lax.dot_general(
                oh.reshape(-1, 128), hi_ref[sl, :1].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(idx.shape)
            acc_lo += jax.lax.dot_general(
                oh.reshape(-1, 128), lo_ref[sl, :1].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(idx.shape)
        out_ref[:] = acc_hi + acc_lo

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[V, V, V], out_specs=V, interpret=INTERP)

    rs = np.random.RandomState(0)
    tab = rs.rand(T, 1).astype(np.float32) * 7.3
    # two-term split: hi = bf16(tab), lo = bf16(tab - hi); the kernel can
    # reconstruct hi+lo exactly (one-hot rows select single bf16 values),
    # so correctness = out == hi+lo BIT-EXACTLY; the ~2^-17 relative
    # distance of hi+lo to the true f32 is reported for the record
    hi16 = jnp.asarray(tab, jnp.bfloat16).astype(jnp.float32)
    lo16 = jnp.asarray(tab - np.asarray(hi16),
                       jnp.bfloat16).astype(jnp.float32)
    idx = jnp.asarray(rs.randint(0, T, (R, 128)), jnp.int32)
    f = jax.jit(lambda i, h, l: call(i, h, l))
    dt, out = timeit(f, idx, hi16, lo16)
    recon = (np.asarray(hi16) + np.asarray(lo16))[np.asarray(idx), 0]
    f32err = np.abs(recon - tab[np.asarray(idx), 0]).max()
    print(f"    (hi+lo vs f32 max abs err: {f32err:.2e})")
    return dt, bool(np.array_equal(np.asarray(out), recon))


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    probe("a.dma_dynamic_row", probe_dma_dynamic_row)
    probe("b.scalar_prefetch_gather", probe_scalar_prefetch_gather)
    probe("c.onehot_split_bf16", probe_onehot_split_bf16)
