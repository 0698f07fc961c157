"""Two-process jax.distributed smoke: the multi-host (DCN) bring-up path.

The reference is single-process/single-GPU; SURVEY.md §5 names multi-host
init as a required TPU-native addition, and parallel.initialize_distributed
wraps jax.distributed.initialize — this script is the executable proof that
the wrapper + mesh + sharded step compose across PROCESS boundaries, not
just across the devices of one process (VERDICT r3 "next" item 5).

Parent mode (no args): spawns two children of itself (CPU backend, 2
virtual devices per process -> a 4-device global mesh), waits, and checks
both children computed the SAME global loss/grad-norm as a single-process
4-device control run.  Child mode (--process-id N): initializes the
distributed runtime against the local coordinator, builds the GLOBAL mesh,
runs one sharded_loss_and_grad step, prints one JSON line.

Run:  python scripts/multihost_smoke.py        (exit 0 = pass)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("UIVR_MH_PORT", "47011"))
DEV_PER_PROC = 2
N_PROC = 2


def _one_step():
    """Build the tiny scene + sharded step on the GLOBAL mesh and run it.
    Deterministic: fixed seeds, global device order. Returns (loss, gnorm).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from uivr_tpu.config import smoke_scene
    from uivr_tpu.integrators import VolpathConfig
    from uivr_tpu.opt import losses
    from uivr_tpu.parallel import (make_mesh, replicate, shard_batch,
                                   sharded_loss_and_grad)
    from uivr_tpu.render import (RenderSettings, make_render,
                                 sample_batch_pixels)

    bundle = smoke_scene(res=8, resx=16, resy=16, n_sensors=2)
    cfg = VolpathConfig(max_depth=3, max_steps=128, engine="flat")
    settings = RenderSettings(integrator=cfg, medium=bundle.medium_cfg,
                              film_size=bundle.film_size, spp=2, spp_grad=2)
    render = make_render(settings, bundle.to_world)
    mesh = make_mesh()                      # ALL global devices
    n_global = len(jax.devices())
    vag = sharded_loss_and_grad(mesh, render, losses.l1)
    batch = 128
    sensor_idx, pixels = sample_batch_pixels(jnp.uint32(3), 2,
                                             bundle.film_size, batch)
    ref = jnp.full((batch, 3), 0.25)
    params = replicate(mesh, bundle.start_from)
    em = replicate(mesh, bundle.emitter)
    cams = replicate(mesh, bundle.cameras)
    sensor_idx, pixels, ref = shard_batch(mesh, (sensor_idx, pixels, ref))
    loss, g = jax.jit(vag)(params, em, cams, sensor_idx, pixels, ref,
                           jnp.uint32(5), jnp.uint32(6))
    gnorm = float(jnp.sqrt(sum(jnp.sum(x ** 2)
                               for x in jax.tree_util.tree_leaves(g))))
    return n_global, float(loss), gnorm


def child(process_id: int) -> None:
    import jax

    sys.path.insert(0, REPO)
    from uivr_tpu.parallel import initialize_distributed

    initialize_distributed(coordinator_address=f"127.0.0.1:{PORT}",
                           num_processes=N_PROC, process_id=process_id)
    n_global, loss, gnorm = _one_step()
    print(json.dumps({"process_id": process_id, "n_global": n_global,
                      "n_local": len(jax.local_devices()),
                      "loss": loss, "gnorm": gnorm}), flush=True)


def parent() -> int:
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="",     # keep the axon TPU plugin out
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count="
                         f"{DEV_PER_PROC}")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--process-id", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(N_PROC)]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            print(err[-2000:], file=sys.stderr)
            print(f"FAIL: child exited {p.returncode}")
            return 1
        results.append(json.loads(out.strip().splitlines()[-1]))

    # single-process 4-device control: same global device count -> same
    # shard seeds -> identical estimate (up to cross-program fp noise)
    env1 = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                XLA_FLAGS=f"--xla_force_host_platform_device_count="
                          f"{DEV_PER_PROC * N_PROC}")
    ctl = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--control"],
        env=env1, capture_output=True, text=True, timeout=600)
    if ctl.returncode != 0:
        print(ctl.stderr[-2000:], file=sys.stderr)
        print("FAIL: control run failed")
        return 1
    control = json.loads(ctl.stdout.strip().splitlines()[-1])

    ok = True
    for r in results:
        ok &= r["n_global"] == DEV_PER_PROC * N_PROC
        ok &= r["n_local"] == DEV_PER_PROC
        ok &= abs(r["loss"] - control["loss"]) <= 1e-5 * max(
            1.0, abs(control["loss"]))
        ok &= abs(r["gnorm"] - control["gnorm"]) <= 1e-4 * max(
            1.0, abs(control["gnorm"]))
    verdict = {"ok": bool(ok), "children": results, "control": control}
    print(json.dumps(verdict))
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--control", action="store_true")
    args = ap.parse_args()
    if args.control or args.process_id is not None:
        # the axon sitecustomize clobbers shell env at interpreter startup;
        # setting os.environ here (before any jax import) wins
        n_dev = DEV_PER_PROC * N_PROC if args.control else DEV_PER_PROC
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_dev}")
    if args.control:
        n_global, loss, gnorm = _one_step()
        print(json.dumps({"control": True, "n_global": n_global,
                          "loss": loss, "gnorm": gnorm}))
        return 0
    if args.process_id is not None:
        child(args.process_id)
        return 0
    return parent()


if __name__ == "__main__":
    sys.exit(main())
