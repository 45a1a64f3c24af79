"""TPU-native radiance-cache inverse rendering framework.

A from-scratch JAX/Flax framework with the capabilities of
benattal/neural-radiance-caching (Flash Cache, ECCV 2024 + InvProp, CVPR 2025),
redesigned TPU-first:

  * XLA/Pallas multiresolution hash-grid encoding (the op the reference
    explicitly refuses to run on TPU, reference internal/geometry.py:255-257).
  * One jitted train step sharded over a `jax.sharding.Mesh` ("data" axis over
    ICI) instead of `jax.pmap` + host-side shard() reshapes.
  * Batched density-normal computation via a single VJP over the sample batch
    instead of per-sample `vmap(value_and_grad)`.
  * Transient time-binning as regular segment reductions rather than flat
    scatter-adds.

Package layout:
  ops/       pure numeric core (math, stepfun, coord, render, hashgrid, ...)
  models/    flax modules (grids, density, sampler, shaders, integrators, model)
  parallel/  mesh/sharding utilities and the sharded train step
  data/      datasets and ray generation
  engine/    config system (gin) and the staged Trainer
  utils/     pytrees and small helpers
"""

__version__ = "0.1.0"
