"""Round-5 ceiling probe (VERDICT r4 next #2): XLA row-gather cost as a
function of row COUNT and row WIDTH on the axon TPU.

The round-4 claim "~1.8 Mrays/s architecture ceiling" rests on the row
gather being descriptor-rate-bound (~10 ns/row, flat in width and count).
If per-row cost is flat in WIDTH, fetching one wide row per supercell
ENTRY (~4 entries/lane) instead of one 32-float row per EVENT (~43
events/lane) would beat it; if per-row cost grows with width, the floor
stands.  This prints the full matrix so PLAN.md can carry the measured
bound either way.

Run ON THE TPU:  python scripts/probe_gather_matrix.py
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

COUNTS = [int(x) for x in os.environ.get(
    "PROBE_COUNTS", "65536,262144,1048576").split(",")]
WIDTHS = [int(x) for x in os.environ.get(
    "PROBE_WIDTHS", "8,32,128,512").split(",")]
TABLE_ROWS = 262144          # 262k rows: a 260^3/32-entry-class table
L = 64                       # in-graph dispatches per timing


def timeit(f, *args, reps=5):
    out = f(*args)
    jax.tree_util.tree_leaves(out)[0].sum().block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    # data-dependent host fetch (block_until_ready is unreliable through
    # the axon relay, PLAN.md bench discipline)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.time() - t0) / reps


def main():
    print(jax.devices(), flush=True)
    print(f"# in-graph fori loop of {L} chained gathers; ns/row = "
          f"t / L / n_rows", flush=True)
    print(f"{'rows':>9} | " + " | ".join(f"w={w:<4}" for w in WIDTHS)
          + "   (ns/row)", flush=True)
    for n in COUNTS:
        cells = []
        for w in WIDTHS:
            # tables are passed as ARGUMENTS: a closure-captured jnp
            # constant is embedded in the remote-compile request body and
            # 413s the axon compile helper at 512-wide tables
            tab = jnp.asarray(
                np.random.RandomState(1).rand(TABLE_ROWS, w), jnp.float32)

            @jax.jit
            def loop(ix, tab):
                def body(i, ix):
                    rows = tab[ix]
                    # chain iterations through the fetched data so XLA
                    # cannot hoist or overlap beyond real dependencies
                    return (ix + rows[:, 0].astype(jnp.int32) + 1) \
                        % tab.shape[0]
                return jax.lax.fori_loop(0, L, body, ix)

            ix0 = jnp.asarray(
                np.random.RandomState(2).randint(0, TABLE_ROWS, n),
                jnp.int32)
            dt = timeit(loop, ix0, tab)
            cells.append(dt / L / n * 1e9)
        print(f"{n:>9} | " + " | ".join(f"{c:6.2f}" for c in cells),
              flush=True)

    # contiguous-block DMA alternative at the same payload: one (n, w)
    # SLICE fetch per dispatch (what a supercell-block prefetch would do
    # if entries were sorted/coalesced) for scale
    n = COUNTS[-1]
    for w in (32, 512):
        tab = jnp.asarray(np.random.RandomState(1).rand(TABLE_ROWS, w),
                          jnp.float32)

        @jax.jit
        def sloop(start, tab):
            def body(i, start):
                rows = jax.lax.dynamic_slice(tab, (start, 0), (4096, w))
                return (start + rows[0, 0].astype(jnp.int32) + 1) % 1024
            return jax.lax.fori_loop(0, L, body, start)

        dt = timeit(sloop, jnp.int32(0), tab)
        print(f"# contiguous 4096-row slice, w={w}: "
              f"{dt / L / 4096 * 1e9:.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
