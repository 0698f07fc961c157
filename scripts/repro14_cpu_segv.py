"""Pinned pytest-free reproducer for the XLA:CPU compile-time crash
(VERDICT r4 next #7; run_tests.sh's per-file isolation exists because of
it).

Signature: after ~6 test-functions' worth of interpret-mode pallas
programs + XLA:CPU compilations in ONE process, the NEXT large jit
compile dies inside `backend_compile_and_load` — SIGSEGV by default,
SIGABRT with --xla_cpu_parallel_codegen_split_count=1 (same call site),
i.e. heap state corrupted earlier detonates in LLVM codegen.  Bisect
facts (round 5, jax 0.9.0, CPU backend, 8-device virtual mesh):

- full file order 1..7 crashes at 7 (test_render_grad_pallas_jit_traced_scene)
- every half prefix passes: {6,7}, {1,2,3,7,8,9}, {4,5,6,7} all green
- one test per process: all 10 pass
=> cumulative-state threshold, not a specific program pair.

This script replays the exact crashing sequence without pytest:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/repro14_cpu_segv.py    # exit 139/134 = reproduced
"""
from __future__ import annotations

import faulthandler
import os
import sys

faulthandler.enable()
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pallas_common import _setup  # noqa: E402
from uivr_tpu.config import smoke_scene  # noqa: E402

import test_pallas_adjoint as T  # noqa: E402


class _MP:
    """monkeypatch stand-in: setenv/delenv with teardown on undo()."""

    def __init__(self):
        self._undo = []

    def setenv(self, k, v):
        self._undo.append((k, os.environ.get(k)))
        os.environ[k] = v

    def delenv(self, k, raising=True):
        self._undo.append((k, os.environ.get(k)))
        os.environ.pop(k, None if not raising else None)

    def undo(self):
        for k, old in reversed(self._undo):
            if old is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = old
        self._undo = []


def main():
    smoke = _setup(smoke_scene(res=16, resx=32, resy=32, n_sensors=2))
    seq = [
        ("matches_flat", lambda: T.test_kernel_adjoint_matches_flat(smoke)),
        ("compaction_exact",
         lambda: T.test_kernel_adjoint_compaction_exact(smoke)),
        ("persistent_matches_staged",
         lambda: T.test_adjoint_persistent_matches_staged(smoke)),
        ("deferred_tc", None),      # needs monkeypatch, handled below
        ("render_grad_dispatch", T.test_render_grad_dispatch_pallas),
        ("padding_odd", lambda: T.test_kernel_padding_odd_width(smoke)),
        ("traced_scene (CRASH SITE)",
         T.test_render_grad_pallas_jit_traced_scene),
    ]
    for name, fn in seq:
        print(f"[repro14] running {name}", flush=True)
        if fn is None:
            mp = _MP()
            try:
                T.test_adjoint_persistent_deferred_tc(smoke, mp)
            finally:
                mp.undo()
        else:
            fn()
    print("[repro14] completed WITHOUT crash — not reproduced", flush=True)


if __name__ == "__main__":
    main()
