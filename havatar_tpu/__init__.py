"""havatar_tpu — a TPU-native JAX/XLA/Pallas framework for animatable head avatars.

A ground-up rebuild of the capabilities of XChenZ/havatar (TOG 2023) designed
for TPU hardware: pure-functional model cores, jit/pjit-able end to end,
NHWC layouts, bf16-friendly compute, SPMD parallelism over `jax.sharding.Mesh`,
and Pallas kernels for the hot ray-marching path.

Layering (mirrors the reference's logical layers, reference/SURVEY.md §1):
  ops/         numerics: upfirdn2d, fused bias-lrelu, grid-sample, box warp,
               positional encoding, SH, volume rendering, PDF sampling, rays
  models/      StyleGAN block library, condition-plane generators, the
               double-plane NeRF field, skinning field, StyleUNet SR,
               wavelet discriminator, and the full avatar renderer
  data/        JSON-split dataset + host-side ray/condition pipeline
  parallel/    mesh construction, sharding rules, collective helpers
  train/       stage-1 NeRF and stage-2 GAN training loops, losses, EMA
  infer/       reenactment (offline inference) driver
  checkpoints/ orbax-backed checkpoint manager + torch-checkpoint converter
  config/      YAML config system + default configs
"""

__version__ = "0.1.0"

__all__ = ["models", "ops", "data", "train", "infer", "parallel",
           "checkpoints", "preprocess", "utils"]
