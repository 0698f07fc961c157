#!/bin/bash
# Test runner: CPU backend with an 8-device virtual mesh, axon TPU plugin
# registration disabled (sitecustomize dials the TPU relay in EVERY python
# process otherwise — slow and deadlock-prone under concurrency).
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
exec python -m pytest "${@:-tests/}" -q
