"""Loss/metric library (reference: python/losses.py).

All reductions are means over every tensor element (the reference divides by
``dr.width(img)`` = total element count).  ``l1`` is the optimization default
(opt_config.py:37); PSNR/RMSE are evaluation metrics.
"""
from __future__ import annotations

import jax.numpy as jnp


def average(img, ref=None):
    return jnp.mean(img)


def l1(img, ref):
    return jnp.mean(jnp.abs(img - ref))


def l2(img, ref):
    return jnp.mean(jnp.square(img - ref))


def rmse(img, ref):
    return jnp.sqrt(l2(img, ref))


def huber(img, ref, delta: float = 1.0):
    # Bug-compat with the reference (losses.py:22-25): the branch tests the
    # SIGNED residual `r < delta` instead of `|r| < delta`, so large negative
    # residuals take the quadratic branch.  Reproduced deliberately so runs
    # configured with `loss='huber'` match the reference numerically.
    r = img - ref
    loss = jnp.where(r < delta, 0.5 * jnp.square(r),
                     delta * jnp.abs(r) - 0.5 * delta)
    return jnp.mean(loss)


def mean_relative_absolute_error(img, ref, epsilon: float = 1e-2):
    return jnp.mean(jnp.abs(img - ref) / (jnp.abs(ref) + epsilon))


def mean_relative_squared_error(img, ref, epsilon: float = 1e-2):
    return jnp.mean(jnp.square(img - ref) / (jnp.square(ref) + epsilon))


def rmrse(img, ref, epsilon: float = 1e-2):
    return jnp.sqrt(mean_relative_squared_error(img, ref, epsilon))


def psnr(img, ref, max_value: float = 1.0):
    mse = jnp.mean(jnp.square(img - ref))
    return 20.0 * jnp.log10(max_value) - 10.0 / jnp.log(10.0) * jnp.log(mse)


LOSSES = {
    "l1": l1, "l2": l2, "rmse": rmse, "huber": huber,
    "mrae": mean_relative_absolute_error, "mrse": mean_relative_squared_error,
    "rmrse": rmrse,
}
