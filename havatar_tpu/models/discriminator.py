"""Wavelet (SWAGAN-style) discriminator.

Behavioral spec: reference ``Discriminator`` (model/styleUnet.py:470-562) —
Haar-transform input, FromRGB/ConvBlock pyramid with iwt→downsample→dwt skip
path, minibatch-stddev channel, final conv + 2-layer head; optional
pose-conditional projection (c_dim, unused in the default config:
train_avatarHD.py:112 passes c_dim=0).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from havatar_tpu.models.blocks import (
    ConvBlock,
    ConvLayer,
    EqualLinear,
    FromRGB,
    minibatch_stddev,
)
from havatar_tpu.models.generators import channel_map
from havatar_tpu.ops import haar_transform


class WaveletDiscriminator(nn.Module):
    size: int = 512
    img_channel: int = 3
    channel_multiplier: int = 2
    c_dim: int = 0
    stddev_group: int = 4
    stddev_feat: int = 1
    # same convention as the generators: casts the input once; the equalized
    # blocks follow the activation dtype (params stay f32). f32 default —
    # adversarial training is the numerics-sensitive part.
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, img, flat_pose: Optional[jnp.ndarray] = None):
        ch = channel_map(self.channel_multiplier)
        log_size = int(math.log2(self.size)) - 1

        x = haar_transform(img.astype(jnp.dtype(self.compute_dtype)))

        out = None
        in_channel = ch[self.size]
        for si, i in enumerate(range(log_size, 2, -1)):
            out_channel = ch[2 ** (i - 1)]
            x, out = FromRGB(
                in_channel, downsample=(i != log_size), name=f"from_rgb{si}",
            )(x, out)
            out = ConvBlock(in_channel, out_channel, name=f"conv{si}")(out)
            in_channel = out_channel

        _, out = FromRGB(ch[4], name="from_rgb_final")(x, out)

        out = minibatch_stddev(out, self.stddev_group, self.stddev_feat)
        out = ConvLayer(ch[4], 3, name="final_conv")(out)

        B = out.shape[0]
        # match torch's NCHW flatten order for checkpoint-compatible weights
        out = out.transpose(0, 3, 1, 2).reshape(B, -1)
        out = EqualLinear(ch[4], activation="fused_lrelu", name="final_linear0")(out)
        out = EqualLinear(1, name="final_linear1")(out)
        out = out.astype(jnp.float32)  # scores/losses accumulate in f32

        if self.c_dim > 0:
            assert flat_pose is not None
            h = flat_pose
            for i in range(4):
                h = EqualLinear(64, lr_mul=0.01, activation="fused_lrelu",
                                name=f"mapping{i}")(h)
            h = h * jnp.reciprocal(
                jnp.sqrt(jnp.mean(jnp.square(h), axis=1, keepdims=True) + 1e-8))
            out = jnp.sum(out * h, axis=1, keepdims=True) / np.sqrt(self.c_dim)
        return out
