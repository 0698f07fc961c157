"""Learning-rate schedules, parameter projection, multires upsampling.

Mirrors the reference optimization-layer semantics:
- ``Last25`` LR halvings at 75/85/95% of the run (opt_config.py:50-61)
- per-key LR factors (albedo x2 default, scene_config.py:67-71)
- projection of grids to their legal ranges (optimize.py:169-179)
- x2 trilinear grid upsampling at fractional milestones with optimizer-state
  reset and majorant-factor re-adjustment (optimize.py:203-252)
"""
from __future__ import annotations

from enum import IntEnum
from typing import Dict, Set

import jax.numpy as jnp

from ..core.grids import resize_trilinear
from ..scene.medium import MediumParams


class Schedule(IntEnum):
    Constant = 0
    Last25 = 1


def schedule_factor(schedule: Schedule, it: int, n_iter: int) -> float:
    """Host-side (python) factor; it/n_iter are static per iteration."""
    if schedule in (None, Schedule.Constant):
        return 1.0
    if schedule == Schedule.Last25:
        t = it / max(n_iter - 1, 1)
        f = 1.0
        for s in (0.75, 0.85, 0.95):
            if t >= s:
                f *= 0.5
        return f
    raise ValueError(f"Unsupported schedule: {schedule}")


def learning_rates(base_lr: float, schedule: Schedule, it: int, n_iter: int,
                   lr_factors: Dict[str, float]) -> MediumParams:
    """Per-key LR pytree for the current iteration."""
    f = schedule_factor(schedule, it, n_iter)
    return MediumParams(
        sigma_t=f * base_lr * lr_factors.get("sigma_t", 1.0),
        albedo=f * base_lr * lr_factors.get("albedo", 2.0),
        emission=f * base_lr * lr_factors.get("emission", 1.0),
    )


def upsample_iterations(fractions, n_iter: int) -> Set[int]:
    """{int(f * n_iter)} per fraction (opt_config.py:39-44)."""
    out = set()
    for t in (fractions or []):
        assert 0 <= t <= 1
        out.add(int(t * n_iter))
    return out


def enforce_valid_params(params: MediumParams, max_density: float
                         ) -> MediumParams:
    """Project grids back to legal ranges (optimize.py:169-179)."""
    return MediumParams(
        sigma_t=jnp.clip(params.sigma_t, 0.0, max_density),
        albedo=jnp.clip(params.albedo, 0.0, 1.0),
        emission=jnp.maximum(params.emission, 0.0),
    )


def upsample_params(params: MediumParams) -> MediumParams:
    """Double each grid's spatial resolution with trilinear interpolation
    (optimize.py:228-252)."""
    def up(g):
        D, H, W, C = g.shape
        return resize_trilinear(g, (2 * D, 2 * H, 2 * W))
    return MediumParams(sigma_t=up(params.sigma_t), albedo=up(params.albedo),
                        emission=up(params.emission))


def initial_resolution(final_shape, n_upsamples: int):
    """Starting grid resolution so that n x2 upsamples land on the final
    resolution (optimize.py:146-156)."""
    f = 2 ** n_upsamples
    res = tuple(max(1, s // f) for s in final_shape[:3]) + (final_shape[3],)
    if 1 in res[:3]:
        raise ValueError(f"Initial resolution not supported: {res}; "
                         f"reduce upsample steps")
    return res
