"""uivr_tpu — TPU-native unbiased inverse volume rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
rgl-epfl/unbiased-inverse-volume-rendering (Nimier-David et al.,
"Unbiased Inverse Volume Rendering with Differential Trackers", SIGGRAPH 2022):

- differentiable null-scattering volumetric path tracing (delta tracking,
  ratio tracking, differential ratio tracking / DRT)
- emissive-grid "nerf" bootstrap integrator
- ray-centric batched rendering with decorrelated path-replay adjoints
- the full inverse-rendering optimization harness (Adam on voxel grids,
  multi-resolution upsampling, config registries, checkpointing)
- SPMD scaling over TPU meshes via shard_map + psum

Layer map (mirrors SURVEY.md §7; reference layers A/B collapse into
`core`+`tracking` since the only native functionality actually exercised is
ray/AABB math, trilinear grids, envmap sampling, RNG and stochastic tracking):

  core/        math, counter-based RNG, trilinear grids, majorant supergrids, IO
  scene/       cameras, emitters, phase functions, medium, scene pytrees
  tracking/    stochastic distance samplers (free-flight, ratio, DRT)
  integrators/ nerf + volpathsimple primal/adjoint estimators
  render/      batched ray-centric render op with custom VJP
  opt/         optimizers, schedules, upsampling, projection, checkpoints
  parallel/    device meshes, sharded rendering, collectives
  config/      scene/integrator/optimization config registries
  cli/         reproduction driver
  validation/  finite-difference gradient oracle
"""

__version__ = "0.1.0"
