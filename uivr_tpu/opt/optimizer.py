"""Adam/SGD with per-parameter learning rates and moment reset on upsample.

Equivalent of ``mi.ad.Adam``/``mi.ad.SGD`` + ``opt.set_learning_rate(dict)``
(reference: python/opt_config.py:46-48, python/optimize.py:313,329,352).
Hand-rolled rather than optax because the reference semantics need:
(a) learning rates that change every iteration per parameter key, and
(b) optimizer-state reset when a grid's resolution changes mid-run
(upsampling assigns a fresh array, implicitly resetting Dr.Jit moments,
optimize.py:241).  State is a pytree; everything jit-friendly except the
resolution-change reset, which happens at a retrace boundary anyway.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jnp.ndarray   # () int32
    mu: object          # pytree like params
    nu: object          # pytree like params


def adam_init(params) -> AdamState:
    z = lambda p: jnp.zeros_like(p)
    return AdamState(step=jnp.zeros((), jnp.int32),
                     mu=jax.tree_util.tree_map(z, params),
                     nu=jax.tree_util.tree_map(z, params))


def adam_step(params, grads, state: AdamState, lr,
              beta1: float = 0.9, beta2: float = 0.999, eps: float = 1e-8):
    """One Adam update. ``lr`` is a pytree of scalars matching ``params``
    structure (per-key learning rates) or a scalar."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** t
    bc2 = 1.0 - beta2 ** t
    lr_tree = lr if not jnp.isscalar(lr) and not isinstance(lr, (int, float)) \
        else jax.tree_util.tree_map(lambda p: lr, params)

    def upd(p, g, m, v, a):
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * jnp.square(g)
        mh = m / bc1
        vh = v / bc2
        return p - a * mh / (jnp.sqrt(vh) + eps), m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_a = treedef.flatten_up_to(lr_tree)
    out = [upd(p, g, m, v, a) for p, g, m, v, a
           in zip(flat_p, flat_g, flat_m, flat_v, flat_a)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(step=step, mu=new_m, nu=new_v)


def sgd_step(params, grads, state: AdamState, lr, momentum: float = 0.0):
    """SGD (with optional momentum stored in ``mu``)."""
    step = state.step + 1
    lr_tree = lr if not isinstance(lr, (int, float)) \
        else jax.tree_util.tree_map(lambda p: lr, params)

    def upd(p, g, m, a):
        m = momentum * m + g
        return p - a * m, m

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_a = treedef.flatten_up_to(lr_tree)
    out = [upd(p, g, m, a) for p, g, m, a in zip(flat_p, flat_g, flat_m, flat_a)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    return new_p, AdamState(step=step, mu=new_m, nu=state.nu)


def reset_state_like(params) -> AdamState:
    """Fresh optimizer state after a resolution change (upsampling)."""
    return adam_init(params)
