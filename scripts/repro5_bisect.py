"""Probe 5: bisect which construct crashes the Mosaic remote compiler.
Baseline that PASSES: same-shape (128,P) take_along_axis at kernel top level.
Run ON THE TPU."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = pl.BlockSpec(memory_space=pltpu.VMEM)
P = 512


def probe(name, fn):
    try:
        ok = fn()
        print(f"{name}: {'PASS' if ok else 'WRONG-RESULT'}", flush=True)
        return ok
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:120]
        print(f"{name}: FAIL ({type(e).__name__}: {msg})", flush=True)
        return False


def run_k(k, out_shape, *args, **kw):
    return jax.jit(pl.pallas_call(
        k, out_shape=out_shape,
        in_specs=[V] * len(args), out_specs=V, **kw))(*args)


def mk(shape=(128, P), dtype=jnp.float32, hi=None):
    if hi is None:
        return jnp.asarray(np.random.rand(*shape), dtype)
    return jnp.asarray(np.random.randint(0, hi, shape), jnp.int32)


# a) idx = broadcast of a (1,P) row
def a():
    tab, row = mk(), mk((1, P), hi=P)

    def k(t, r, o):
        idx = jnp.broadcast_to(r[:], (128, P))
        o[:] = jnp.take_along_axis(t[:], idx, axis=1)
    out = run_k(k, jax.ShapeDtypeStruct((128, P), jnp.float32), tab, row)
    return bool(jnp.allclose(out, jnp.take_along_axis(
        tab, jnp.broadcast_to(row, (128, P)), axis=1)))


# b) gather + sublane mask-reduce to (1,P)
def b():
    tab, idx = mk(), mk(hi=P)

    def k(t, i, o):
        g = jnp.take_along_axis(t[:], i[:], axis=1)
        s = jax.lax.broadcasted_iota(jnp.int32, (128, P), 0)
        m = (s == (i[:] % 128)).astype(jnp.float32)
        o[:] = jnp.sum(m * g, axis=0, keepdims=True)
    out = run_k(k, jax.ShapeDtypeStruct((1, P), jnp.float32), tab, idx)
    g = jnp.take_along_axis(tab, idx, axis=1)
    s = jax.lax.broadcasted_iota(jnp.int32, (128, P), 0)
    exp = jnp.sum((s == (idx % 128)) * g, axis=0, keepdims=True)
    return bool(jnp.allclose(out, exp, atol=1e-5))


# c) idx padded with jnp.pad then sliced back
def c():
    tab = mk((128, P))
    idx = mk((8, 64), hi=P)

    def k(t, i, o):
        ip = jnp.pad(i[:], ((0, 120), (0, P - 64)))
        g = jnp.take_along_axis(t[:], ip, axis=1)
        o[:] = g[:8, :64]
    out = run_k(k, jax.ShapeDtypeStruct((8, 64), jnp.float32), tab, idx)
    return bool(jnp.allclose(out, jnp.take_along_axis(
        tab, jnp.pad(idx, ((0, 120), (0, P - 64))), axis=1)[:8, :64]))


# d) grid over row-slabs + gather
def d():
    tab, idx = mk(), mk(hi=P)

    def k(t, i, o):
        o[:] = jnp.take_along_axis(t[:], jnp.broadcast_to(i[:], (128, P)),
                                   axis=1)[:32]
    gs = pl.GridSpec(
        grid=(4,),
        in_specs=[pl.BlockSpec((128, P), lambda r: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((32, P), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, P), lambda r: (r, 0),
                               memory_space=pltpu.VMEM))
    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, P), jnp.float32),
        grid_spec=gs))(tab, idx)
    exp = jnp.concatenate([
        jnp.take_along_axis(
            tab, jnp.broadcast_to(idx[32 * r:32 * r + 32], (128, P)),
            axis=1)[:32] for r in range(4)])
    return bool(jnp.allclose(out, exp))


# e) reshape (4,128)->(1,P) then broadcast then gather
def e():
    tab = mk()
    idx = mk((4, 128), hi=P)

    def k(t, i, o):
        row = i[:].reshape(1, P)
        g = jnp.take_along_axis(t[:], jnp.broadcast_to(row, (128, P)), axis=1)
        o[:] = g
    out = run_k(k, jax.ShapeDtypeStruct((128, P), jnp.float32), tab, idx)
    exp = jnp.take_along_axis(
        tab, jnp.broadcast_to(idx.reshape(1, P), (128, P)), axis=1)
    return bool(jnp.allclose(out, exp))


# f) input_output_aliases + gather
def f():
    tab, idx = mk(), mk(hi=P)

    def k(t, i, x, o):
        o[:] = x[:] + jnp.take_along_axis(t[:], i[:], axis=1)
    x = mk()
    out = jax.jit(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, P), jnp.float32),
        in_specs=[V, V, V], out_specs=V,
        input_output_aliases={2: 0}))(tab, idx, x)
    return bool(jnp.allclose(out, x + jnp.take_along_axis(tab, idx, axis=1)))


# g) TWO gathers chained through arithmetic
def g():
    tab, idx = mk(), mk(hi=P)

    def k(t, i, o):
        g1 = jnp.take_along_axis(t[:], i[:], axis=1)
        i2 = jnp.clip((g1 * P).astype(jnp.int32), 0, P - 1)
        o[:] = jnp.take_along_axis(t[:], i2, axis=1)
    out = run_k(k, jax.ShapeDtypeStruct((128, P), jnp.float32), tab, idx)
    g1 = jnp.take_along_axis(tab, idx, axis=1)
    i2 = jnp.clip((g1 * P).astype(jnp.int32), 0, P - 1)
    return bool(jnp.allclose(out, jnp.take_along_axis(tab, i2, axis=1)))


# h) gather on int32 operand (indices table)
def h():
    tab = mk(hi=1000)
    idx = mk(hi=P)

    def k(t, i, o):
        o[:] = jnp.take_along_axis(t[:], i[:], axis=1)
    out = run_k(k, jax.ShapeDtypeStruct((128, P), jnp.int32), tab, idx)
    return bool((out == jnp.take_along_axis(tab, idx, axis=1)).all())


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    for name, fn in [("a broadcast-idx gather", a),
                     ("b gather+mask-reduce", b),
                     ("c padded idx gather", c),
                     ("d grid slabs + gather", d),
                     ("e reshape+broadcast+gather", e),
                     ("f aliasing + gather", f),
                     ("g two chained gathers", g),
                     ("h int32 operand gather", h)]:
        probe(name, fn)
