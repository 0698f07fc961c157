"""Probe: XLA row-gather formulations on TPU — is the 20 ns/lane cost of
`table[idx]` (the per-step sigma/albedo corner fetch) an artifact of one
lowering, or fundamental?

DMA-bound floor for 262k rows x 128 B is ~40 us; the measured baseline was
~2 ms (50x).  Variants:
  a. t[i]                       (advanced indexing)
  b. jnp.take(t, i, axis=0)
  c. jnp.take unique_indices    (claims no dedup pass)
  d. one_hot fp8-ish MXU        (i as one-hot (n, 256) @ slab — only for a
                                 256-row table: measures the MXU alternative
                                 scaling, not a drop-in)
  e. gather of 8 scalar corners (n, 8) idx into flat (Nv,) sigma — the
                                 pre-corner-table formulation
  f. t[i] at HALF row width 16
  g. t[i] from a BF16 table     (half the bytes)

Run ON THE TPU:  python -u scripts/repro9_gather.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 262144          # lanes
NV = 200000         # table rows


def bench(name, f, *args, reps=5):
    try:
        out = jax.jit(f)(*args)
        s = float(jnp.asarray(out).sum())
        t0 = time.time()
        for _ in range(reps):
            out = jax.jit(f)(*args)
        s = float(jnp.asarray(out).sum())
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:7.2f} ms/call ({dt/N*1e9:6.2f} ns/lane) "
              f"sum={s:.0f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    t32 = jnp.asarray(rng.rand(NV, 32), jnp.float32)
    t16 = jnp.asarray(rng.rand(NV, 16), jnp.float32)
    tb = t32.astype(jnp.bfloat16)
    i = jnp.asarray(rng.randint(0, NV, (N,)), jnp.int32)
    i8 = jnp.asarray(rng.randint(0, NV * 8, (N, 8)), jnp.int32)
    flat = jnp.asarray(rng.rand(NV * 8), jnp.float32)
    t256 = jnp.asarray(rng.rand(256, 32), jnp.float32)
    i256 = jnp.asarray(rng.randint(0, 256, (N,)), jnp.int32)

    bench("a. t[i] (NV,32)", lambda t, ii: t[ii].sum(-1), t32, i)
    bench("b. take axis=0", lambda t, ii: jnp.take(t, ii, axis=0).sum(-1),
          t32, i)
    bench("c. take unique", lambda t, ii: jnp.take(
        t, ii, axis=0, unique_indices=True, indices_are_sorted=False)
        .sum(-1), t32, i)
    bench("d. onehot MXU 256", lambda t, ii: (
        jax.nn.one_hot(ii, 256, dtype=jnp.bfloat16) @ t.astype(jnp.bfloat16))
        .astype(jnp.float32).sum(-1), t256, i256)
    bench("e. 8 scalar corners", lambda f_, ii: f_[ii].sum(-1), flat, i8)
    bench("f. t[i] width 16", lambda t, ii: t[ii].sum(-1), t16, i)
    bench("g. t[i] bf16", lambda t, ii: t[ii].astype(jnp.float32).sum(-1),
          tb, i)
    # sorted indices: does XLA exploit locality?
    isort = jnp.sort(i)
    bench("h. t[i] sorted idx", lambda t, ii: t[ii].sum(-1), t32, isort)
    bench("i. t[i] sorted+flag", lambda t, ii: jnp.take(
        t, ii, axis=0, indices_are_sorted=True).sum(-1), t32, isort)
