"""Counter-based RNG with Dr.Jit-sampler-like stream semantics.

The reference relies on Mitsuba's stateful per-lane PCG32 samplers with
``fork``/``clone``/``seed`` semantics (reference: python/integrators/
volpathsimple.py:99-108, python/batched.py:367-376).  Path-replay
backpropagation (PRB) is only correct if the adjoint pass replays the primal
pass's exact random sequence while auxiliary streams stay decorrelated.

TPU-native design: a *stateless counter-based* sampler.  Every random number
is a pure hash of ``(seed, lane, dim)``:

- ``seed``  — uint32 stream id (distinct per purpose: primal/adjoint/pixel/...)
- ``lane``  — per-ray id within the wavefront (globally unique under sharding)
- ``dim``   — scalar draw counter, incremented once per ``next_*`` call

Because masked wavefront loops execute every iteration for every lane (with
inactive lanes ignored via ``where``), a *scalar* ``dim`` shared by the whole
wavefront reproduces Dr.Jit's behavior where ``sampler.next_1d(active)``
advances all lanes in lockstep.  ``clone`` = copy the (seed, dim) pair;
``fork`` = derive a fresh seed; replay = re-create the sampler with the same
seed.  Mistakes here silently bias gradients, so this module is heavily
tested (tests/test_core.py: determinism, stream independence, fork/clone
semantics, and the bit-exact int32 kernel port in tests/test_pallas_kernel.py).

The hash is TEA (Tiny Encryption Algorithm), the same family Mitsuba uses for
seed decorrelation (``mi.sample_tea_32``); cheap integer VPU ops only.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_U32 = jnp.uint32
# TEA key/delta constants (public domain algorithm, Wheeler & Needham 1994).
_TEA_DELTA = 0x9E3779B9
_TEA_K0, _TEA_K1, _TEA_K2, _TEA_K3 = 0xA341316C, 0xC8013EA4, 0xAD90777D, 0x7E95761E


def tea(v0, v1, rounds: int = 6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TEA block mix of two uint32 values (broadcasts elementwise)."""
    v0 = jnp.asarray(v0).astype(_U32)
    v1 = jnp.asarray(v1).astype(_U32)
    s = _U32(0)
    for _ in range(rounds):
        s = (s + _U32(_TEA_DELTA)).astype(_U32)
        v0 = (v0 + (((v1 << 4) + _U32(_TEA_K0)) ^ (v1 + s) ^ ((v1 >> 5) + _U32(_TEA_K1)))).astype(_U32)
        v1 = (v1 + (((v0 << 4) + _U32(_TEA_K2)) ^ (v0 + s) ^ ((v0 >> 5) + _U32(_TEA_K3)))).astype(_U32)
    return v0, v1


def sample_tea_32(v0, v1, rounds: int = 6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in analogue of ``mi.sample_tea_32`` for seed decorrelation."""
    return tea(v0, v1, rounds)


def _to_unit_float(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> f32 uniform in [0, 1) using the top 24 bits."""
    return (bits >> _U32(8)).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


class Sampler(NamedTuple):
    """Stateless wavefront sampler. A pytree; safe to carry through lax loops."""
    seed: jnp.ndarray   # uint32 scalar — stream id
    dim: jnp.ndarray    # uint32 scalar — draw counter
    lanes: jnp.ndarray  # uint32 (n,)   — per-lane ids


def make_sampler(seed, n_lanes: int = None, lanes: jnp.ndarray = None) -> Sampler:
    """Create a sampler. Either ``n_lanes`` (lanes = arange) or explicit
    ``lanes`` (e.g. globally-offset ids under sharding) must be given."""
    if lanes is None:
        assert n_lanes is not None
        lanes = jax.lax.broadcasted_iota(_U32, (n_lanes, 1), 0)[:, 0]
    return Sampler(
        seed=jnp.asarray(seed).astype(_U32),
        dim=jnp.zeros((), _U32),
        lanes=lanes.astype(_U32),
    )


def next_1d(s: Sampler) -> Tuple[jnp.ndarray, Sampler]:
    """One uniform float in [0,1) per lane; advances the shared counter."""
    # Scalar pre-hash of (dim, seed) then a vector hash against lane ids:
    # unique (seed, dim, lane) triples can never collide across streams.
    # NOTE: the vector stage needs >= 8 rounds — with 4 rounds, sequential
    # lane ids produce a measurable CDF bias (~8 sigma at 2e5 lanes).
    h0, h1 = tea(s.dim, s.seed, rounds=4)
    bits, _ = tea(s.lanes, h0 ^ h1, rounds=8)
    return _to_unit_float(bits), s._replace(dim=(s.dim + _U32(1)).astype(_U32))


def next_2d(s: Sampler) -> Tuple[jnp.ndarray, Sampler]:
    """(n, 2) uniform floats."""
    u0, s = next_1d(s)
    u1, s = next_1d(s)
    return jnp.stack([u0, u1], axis=-1), s


def fork(s: Sampler, salt) -> Sampler:
    """Decorrelated sampler over the same lanes (Dr.Jit ``sampler.fork`` +
    ``seed``); used for the adjoint's alt stream so the primary sequence stays
    identical between primal and adjoint passes (PRB invariant)."""
    if isinstance(salt, int):
        salt = _U32(salt & 0xFFFFFFFF)
    new_seed, _ = tea(s.seed, jnp.asarray(salt).astype(_U32))
    return Sampler(seed=new_seed, dim=jnp.zeros((), _U32), lanes=s.lanes)


def clone(s: Sampler) -> Sampler:
    """Snapshot: a sampler that will replay the same upcoming sequence
    (Dr.Jit ``sampler.clone``). Being stateless, this is just a copy."""
    return Sampler(seed=s.seed, dim=s.dim, lanes=s.lanes)


# ---------------------------------------------------------------------------
# Per-lane-counter sampler for flattened (asynchronous) wavefront loops.
#
# In a flattened path-tracing loop, lanes progress through their own event
# sequences asynchronously, so a wavefront-global draw counter cannot replay
# a lane's sequence (the PRB/NEE-replay requirement).  ``LaneSampler`` keeps
# a PRIVATE counter per lane: draws hash (h_lane, dim_lane) where h_lane is
# a precomputed hash of (seed, lane).  Replay = snapshot/restore the lane's
# counter.  Draw counters advance only for lanes that actually consume.
# ---------------------------------------------------------------------------

class LaneSampler(NamedTuple):
    h: jnp.ndarray    # (n,) uint32 — hashed (seed, lane)
    dim: jnp.ndarray  # (n,) uint32 — per-lane draw counter


def make_lane_sampler(seed, n_lanes: int = None,
                      lanes: jnp.ndarray = None) -> LaneSampler:
    if lanes is None:
        assert n_lanes is not None
        lanes = jax.lax.broadcasted_iota(_U32, (n_lanes, 1), 0)[:, 0]
    h0, h1 = tea(lanes.astype(_U32), jnp.asarray(seed).astype(_U32), rounds=6)
    return LaneSampler(h=h0 ^ h1, dim=jnp.zeros_like(h0))


# Per-draw TEA rounds for LaneSampler streams.  The (v0=h well-mixed,
# v1=dim sequential) input structure passes the uniformity / serial-
# correlation / 2D-stratification battery at 5 rounds (4 rounds leaks a
# lag-1 correlation of 0.08 between consecutive draws); Mitsuba's own
# sample_tea_32 default is 4 rounds on similar inputs.  Must match
# ops/volpath_step._DRAW_ROUNDS for flat/pallas bit-parity.  NOTE: this is
# NOT safe for the wavefront Sampler above, whose vector stage feeds
# sequential lane ids as v0 (needs >= 8 rounds, see next_1d).
import os as _os
_DRAW_ROUNDS = int(_os.environ.get("UIVR_TEA_DRAW_ROUNDS", 5))


def lane_next_1d(s: LaneSampler, consume: jnp.ndarray = None
                 ) -> Tuple[jnp.ndarray, LaneSampler]:
    """One uniform float per lane; advances counters of consuming lanes only
    (``consume`` bool mask, default all)."""
    bits, _ = tea(s.h, s.dim, rounds=_DRAW_ROUNDS)
    u = _to_unit_float(bits)
    inc = _U32(1) if consume is None else consume.astype(_U32)
    return u, s._replace(dim=(s.dim + inc).astype(_U32))


def lane_next_2d(s: LaneSampler, consume: jnp.ndarray = None):
    u0, s = lane_next_1d(s, consume)
    u1, s = lane_next_1d(s, consume)
    return jnp.stack([u0, u1], axis=-1), s


def lane_fork(s: LaneSampler, salt) -> LaneSampler:
    """Decorrelated per-lane stream (adjoint alt stream)."""
    if isinstance(salt, int):
        salt = _U32(salt & 0xFFFFFFFF)
    h0, h1 = tea(s.h, jnp.asarray(salt).astype(_U32), rounds=6)
    return LaneSampler(h=h0 ^ h1, dim=jnp.zeros_like(s.dim))
