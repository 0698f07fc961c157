"""Finite-difference gradient oracle (reference: python/fd.py).

Single-sided forward differences over EVERY grid entry with common random
numbers (the same seed for center and offset renders), which makes FD usable
at modest spp for stochastic estimators (fd.py:12,45).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

from ..scene.medium import MediumParams


def fd_gradients(loss_of_params: Callable[[MediumParams], float],
                 params: MediumParams, eps: float = 5e-3,
                 keys=("sigma_t", "albedo", "emission"),
                 progress: bool = False,
                 central: bool = False) -> Dict[str, np.ndarray]:
    """dloss/dgrid by FD for each entry of each requested grid.

    ``loss_of_params`` must be deterministic given params (use a fixed seed
    inside — common random numbers).  Returns numpy arrays shaped like the
    grids.  ``central=True`` uses second-order central differences
    (2x the renders; O(eps^2) truncation instead of O(eps)) — an extension
    over the reference's forward-only oracle for tight-threshold tests.
    """
    loss_center = float(loss_of_params(params))
    out = {}
    for key in keys:
        v0 = np.asarray(getattr(params, key))
        grads = np.full(v0.shape, np.nan, np.float64)
        it = np.ndindex(*v0.shape)
        for idx in it:
            v = v0.copy()
            v[idx] += eps
            p = params._replace(**{key: jnp.asarray(v)})
            loss_hi = float(loss_of_params(p))
            if central:
                v = v0.copy()
                v[idx] -= eps
                p = params._replace(**{key: jnp.asarray(v)})
                grads[idx] = (loss_hi - float(loss_of_params(p))) / (2 * eps)
            else:
                grads[idx] = (loss_hi - loss_center) / eps
            if progress:
                print(key, idx, grads[idx])
        out[key] = grads
    return out
