"""Wavefront-width envelope probe (VERDICT r3 weak #7): is the >1M-lane
dispatch crash the Pallas kernel or the relay/XLA layer?

The reference handles 1.06e9-ray passes on one GPU (optimize.py:24); this
repo caps per-pass width at 1M lanes (render/batched.py max_rays_per_pass)
after >1M pallas dispatches crashed the TPU worker in round 2.  This probe
bisects the blame by dispatching the SAME 2M-lane wavefront through
(a) the flat XLA engine and (b) the pallas engine, in separate child
processes (a worker crash kills the client for the whole process).

RUN LAST: a reproducing crash leaves the current TPU worker dead until the
next fresh process.

    python scripts/probe_bigwave.py            # parent: spawns children
    python scripts/probe_bigwave.py --engine flat --n 2097152   # child
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(engine: str, n: int):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np
    import time

    from uivr_tpu.config import smoke_scene
    from uivr_tpu.integrators import VolpathConfig
    from uivr_tpu.render.batched import _dispatch_primal
    from uivr_tpu.scene.scene import make_scene

    bundle = smoke_scene(res=64, resx=180, resy=155, n_sensors=4,
                         majorant_factor=16)
    cfg = VolpathConfig(max_depth=16, rr_depth=8, engine=engine)
    scene = make_scene(bundle.params, bundle.medium_cfg, bundle.emitter,
                       bundle.to_world)
    # n primary rays through random film positions of sensor 0
    from uivr_tpu.scene.camera import sample_rays
    rs = np.random.RandomState(5)
    uv = jnp.asarray(rs.rand(n, 2), jnp.float32)
    o, d = sample_rays(bundle.cameras, jnp.zeros((n,), jnp.int32), uv)
    t0 = time.time()
    L, valid = _dispatch_primal(cfg, scene, o, d, jnp.uint32(7))[:2]
    s = float(jnp.sum(L))
    dt = time.time() - t0
    print(json.dumps({"engine": engine, "n": n, "sum": s,
                      "finite": bool(jnp.isfinite(s)),
                      "secs": round(dt, 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default=None)
    ap.add_argument("--n", type=int, default=2 * 1024 * 1024)
    args = ap.parse_args()
    if args.engine:
        child(args.engine, args.n)
        return
    results = {}
    for eng in ("flat", "pallas"):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--engine", eng,
             "--n", str(args.n)],
            capture_output=True, text=True, timeout=1800)
        tail = (p.stdout.strip().splitlines() or ["(no output)"])[-1]
        results[eng] = {"rc": p.returncode, "tail": tail}
        if p.returncode != 0:
            results[eng]["stderr_tail"] = p.stderr.strip().splitlines()[-3:]
        print(f"[{eng}] rc={p.returncode}: {tail}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
