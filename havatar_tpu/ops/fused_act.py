"""Bias + leaky-ReLU + √2 gain.

The reference needs a CUDA kernel + custom autograd for this
(model/op/fused_bias_act_kernel.cu:18-105, model/op/fused_act.py:59-122);
on TPU it is a single VPU-friendly expression that XLA fuses into the
surrounding matmul/conv epilogue. The CPU fallback at
model/op/fused_act.py:107-119 is the spec.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    negative_slope: float = 0.2,
    scale: float = SQRT2,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """leaky_relu(x + bias) * scale, with bias broadcast on ``channel_axis``."""
    if bias is not None:
        shape = [1] * x.ndim
        shape[channel_axis] = bias.shape[0]
        x = x + bias.reshape(shape)
    return jax.nn.leaky_relu(x, negative_slope) * scale
