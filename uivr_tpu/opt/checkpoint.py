"""Full-state checkpointing: params + optimizer moments + iteration.

The reference only writes parameter grids (write-only ``.vol`` checkpoints,
no optimizer state, no mid-run resume — SURVEY.md §5, reference
util.py:55-71, optimize.py:255-272).  The TPU build adds true resumability:
an orbax checkpoint (falling back to ``.npz`` if orbax is unavailable) of
the complete training state, alongside the ``.vol`` exports for
reference-pipeline compatibility.
"""
from __future__ import annotations

import os
from os.path import isdir, isfile
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..scene.medium import MediumParams
from .optimizer import AdamState

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:                     # pragma: no cover
    _HAVE_ORBAX = False


def _flatten_state(params: MediumParams, opt_state: AdamState, it: int):
    return {
        "params": params._asdict(),
        "mu": opt_state.mu._asdict(),
        "nu": opt_state.nu._asdict(),
        "step": np.asarray(opt_state.step),
        "it": np.int64(it),
    }


def save_state(path: str, params: MediumParams, opt_state: AdamState,
               it: int) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = _flatten_state(params, opt_state, it)
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        tmp = path + ".orbax"
        if isdir(tmp):
            import shutil
            shutil.rmtree(tmp)
        ckptr.save(os.path.abspath(tmp), state)
    else:
        flat = {}
        for k, v in state.items():
            if isinstance(v, dict):
                for kk, vv in v.items():
                    flat[f"{k}.{kk}"] = np.asarray(vv)
            else:
                flat[k] = np.asarray(v)
        np.savez(path + ".npz", **flat)


def load_state(path: str) -> Optional[Tuple[MediumParams, AdamState, int]]:
    """Returns (params, opt_state, next_iteration) or None if absent."""
    if _HAVE_ORBAX and isdir(path + ".orbax"):
        ckptr = ocp.PyTreeCheckpointer()
        state = ckptr.restore(os.path.abspath(path + ".orbax"))
        params = MediumParams(**{k: jnp.asarray(v)
                                 for k, v in state["params"].items()})
        mu = MediumParams(**{k: jnp.asarray(v) for k, v in state["mu"].items()})
        nu = MediumParams(**{k: jnp.asarray(v) for k, v in state["nu"].items()})
        opt_state = AdamState(step=jnp.asarray(state["step"]), mu=mu, nu=nu)
        return params, opt_state, int(state["it"])
    if isfile(path + ".npz"):
        z = np.load(path + ".npz")
        params = MediumParams(**{k: jnp.asarray(z[f"params.{k}"])
                                 for k in MediumParams._fields})
        mu = MediumParams(**{k: jnp.asarray(z[f"mu.{k}"])
                             for k in MediumParams._fields})
        nu = MediumParams(**{k: jnp.asarray(z[f"nu.{k}"])
                             for k in MediumParams._fields})
        opt_state = AdamState(step=jnp.asarray(z["step"]), mu=mu, nu=nu)
        return params, opt_state, int(z["it"])
    return None
