"""Residual (control-variate) tracking savings bound on REAL grids
(VERDICT r4 next #3).

Decomposing sigma = lo(p) + residual with per-supercell lower bounds lo
cuts the sigma-gather candidate rate of shadow/replay transmittance walks
by at most the hi-weighted E[lo]/E[hi] (collision candidates arrive at
rate ~ hi within a supercell, and the analytic control part absorbs the lo
fraction).  Round 4 measured 2.8% on the dense 64^3 bench scene at the
factor-16 walking granularity and rejected the lever; this re-runs the
same bound on the XML ground-truth media (sparse plumes), where the lo/hi
ratio could differ.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/probe_residual_bound.py
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax.numpy as jnp
import numpy as np

from uivr_tpu.config import smoke_scene
from uivr_tpu.config.registry import get_scene_config
from uivr_tpu.core.grids import build_bound_grid, majorant_dims
from uivr_tpu.scene import finalize_medium


def bound_for(name: str, sigma, scale: float, factors):
    sig = np.abs(np.asarray(sigma))[..., 0] * scale
    D, H, W = sig.shape
    for f in factors:
        dims = majorant_dims((D, H, W, 1), f)
        hi = np.asarray(build_bound_grid(jnp.asarray(sig[..., None]), dims))
        # per-supercell LOWER bound over the same conservative window:
        # reuse build_bound_grid on the negated field
        lo = -np.asarray(build_bound_grid(jnp.asarray(-sig[..., None]), dims))
        lo = np.maximum(lo, 0.0)
        w = hi                       # candidate rate ~ hi within the cell
        denom = float((hi * w).sum())
        ratio = float((lo * w).sum()) / denom if denom > 0 else 0.0
        occ = float((hi > 0).mean())
        print(f"{name}: factor {f:>2} cells={hi.size:>8} "
              f"occupied={occ:.2f} hi-weighted E[lo]/E[hi]={ratio:.4f}",
              flush=True)


def main():
    b = smoke_scene(res=64, resx=128, resy=128, n_sensors=4,
                    majorant_factor=16)
    m = finalize_medium(b.params, b.medium_cfg, b.to_world)
    bound_for("bench-64", m.params.sigma_t, float(m.scale), (8, 16, 32))

    for scene in ("janga-smoke", "dust-devil"):
        bb = get_scene_config(scene).build_ref()
        mm = finalize_medium(bb.params, bb.medium_cfg, bb.to_world)
        bound_for(scene, mm.params.sigma_t, float(mm.scale), (8, 16, 32))


if __name__ == "__main__":
    main()
