"""StyleGAN-2 / SWAGAN building blocks, TPU-native (flax.linen, NHWC).

Behavioral spec: reference model/styleUnet.py:10-629 (EqualConv2d,
EqualLinear, ModulatedConv2d, NoiseInjection, ConstantInput, ConvLayer,
Blur/Upsample/Downsample, Haar transforms, ConvBlock, FromRGB, StyledConv,
ToRGB, PixelNorm, minibatch stddev). Re-designed for TPU:

* NHWC everywhere; convs are `lax.conv_general_dilated` on the MXU.
* Modulated conv does NOT materialize per-sample weights + grouped conv
  (the reference's CUDA-friendly trick, model/styleUnet.py:253-297).
  Because convolution is bilinear, `conv(x, W·diag(style))` ==
  `conv(x·style, W)`, and demodulation is a per-(sample, out-channel)
  rescale of the output. This keeps ONE shared weight on the MXU with
  large batched convs — the idiomatic XLA formulation, numerically
  identical to the reference.
* The blur/resample ops are single fused `upfirdn2d` convs (ops/upfirdn2d).
* Runtime "equalized lr" weight scaling is preserved exactly so converted
  reference checkpoints reproduce outputs bit-for-bit (up to fp assoc).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from havatar_tpu.ops import (
    blur,
    downsample2d,
    fused_leaky_relu,
    haar_transform,
    inverse_haar_transform,
    make_kernel,
    upfirdn2d,
    upsample2d,
)

BLUR_KERNEL = (1, 3, 3, 1)


def pixel_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """x * rsqrt(mean(x^2)) over channels (spec: model/styleUnet.py:10-15)."""
    return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + 1e-8)


def _conv2d(x, w, stride=1, padding=0):
    """Plain NHWC conv with HWIO weights."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_transpose2d(x, w_hwio, stride=2):
    """Matches torch ``conv_transpose2d(x, w.transpose(0,1), stride, pad=0)``
    as used by the reference's upsampling modconv (model/styleUnet.py:264-277):
    equivalent to an lhs-dilated conv with the *forward* HWIO kernel spatially
    flipped (the in/out swap of the torch call and conv-transpose's internal
    re-swap cancel)."""
    kh, kw = w_hwio.shape[0], w_hwio.shape[1]
    w = jnp.flip(w_hwio, (0, 1))
    pad = ((kh - 1, kh - 1), (kw - 1, kw - 1))
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=pad,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class EqualConv2d(nn.Module):
    """Conv with He-scaled runtime weight (spec: model/styleUnet.py:90-119)."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.kernel_size, self.kernel_size, in_ch, self.out_channel),
        )
        scale = 1.0 / math.sqrt(in_ch * self.kernel_size**2)
        out = _conv2d(x, (w * scale).astype(x.dtype), self.stride, self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,))
            out = out + b.astype(out.dtype)
        return out


class EqualLinear(nn.Module):
    """Linear with equalized lr and optional fused lrelu
    (spec: model/styleUnet.py:128-157). Weights are stored divided by
    lr_mul, exactly like the reference, so checkpoint conversion is 1:1."""

    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
            (in_dim, self.out_dim),
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        b = None
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.constant(self.bias_init), (self.out_dim,)
            )
        out = x @ (w * scale).astype(x.dtype)
        if self.activation == "fused_lrelu":
            out = fused_leaky_relu(
                out, (b * self.lr_mul).astype(out.dtype) if b is not None else None)
        elif b is not None:
            out = out + (b * self.lr_mul).astype(out.dtype)
        return out


class ModulatedConv2d(nn.Module):
    """Style-modulated, optionally demodulated conv with up/down resampling
    (spec: model/styleUnet.py:165-297). See module docstring for the
    TPU-native factorization."""

    in_channel: int
    out_channel: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = BLUR_KERNEL

    @nn.compact
    def __call__(self, x, style):
        B = x.shape[0]
        k = self.kernel_size
        # weight stored [k, k, in, out] (HWIO)
        w = self.param(
            "weight", nn.initializers.normal(1.0),
            (k, k, self.in_channel, self.out_channel),
        )
        scale = 1.0 / math.sqrt(self.in_channel * k**2)

        style = EqualLinear(self.in_channel, bias_init=1.0, name="modulation")(style)
        # [B, in]

        if self.demodulate:
            # demod[b, o] = rsqrt(sum_{khw,i} (scale*w*style[b,i])^2 + eps)
            # (accumulated in f32 regardless of compute dtype)
            w2 = jnp.sum(jnp.square((w * scale).astype(jnp.float32)), axis=(0, 1))
            sigma = jnp.einsum("bi,io->bo",
                               jnp.square(style.astype(jnp.float32)), w2)
            demod = lax.rsqrt(sigma + 1e-8)

        x = x * style.astype(x.dtype)[:, None, None, :]

        w_c = (w * scale).astype(x.dtype)
        kernel = make_kernel(self.blur_kernel)
        if self.upsample:
            out = _conv_transpose2d(x, w_c, stride=2)
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1
            out = blur(out, kernel, pad=(pad0, pad1), upsample_factor=factor)
        elif self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            x = blur(x, kernel, pad=(pad0, pad1))
            out = _conv2d(x, w_c, stride=2, padding=0)
        else:
            out = _conv2d(x, w_c, stride=1, padding=k // 2)

        if self.demodulate:
            out = out * demod.astype(out.dtype)[:, None, None, :]
        return out


class NoiseInjection(nn.Module):
    """x + weight * noise (spec: model/styleUnet.py:300-310)."""

    @nn.compact
    def __call__(self, x, noise=None, rng=None):
        w = self.param("weight", nn.initializers.zeros, (1,))
        if noise is None:
            if rng is None:
                return x  # zero-noise mode: weight * 0 contributes nothing
            noise = jax.random.normal(rng, (x.shape[0], x.shape[1], x.shape[2], 1), x.dtype)
        return x + w.astype(x.dtype) * noise.astype(x.dtype)


class ConstantInput(nn.Module):
    """Learned constant input map (spec: model/styleUnet.py:313-323)."""

    channel: int
    size: int = 4

    @nn.compact
    def __call__(self, batch: int):
        const = self.param(
            "input", nn.initializers.normal(1.0),
            (1, self.size, self.size, self.channel),
        )
        return jnp.tile(const, (batch, 1, 1, 1))


class ConvLayer(nn.Module):
    """EqualConv2d (+ optional blur-downsample) + fused-lrelu bias
    (spec: model/styleUnet.py:326-368)."""

    out_channel: int
    kernel_size: int
    downsample: bool = False
    use_bias: bool = True
    activate: bool = True
    blur_kernel: Sequence[int] = BLUR_KERNEL

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (self.kernel_size - 1)
            x = blur(x, make_kernel(self.blur_kernel), pad=((p + 1) // 2, p // 2))
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2

        x = EqualConv2d(
            self.out_channel, self.kernel_size, stride=stride, padding=padding,
            use_bias=self.use_bias and not self.activate, name="conv",
        )(x)
        if self.activate:
            if self.use_bias:
                b = self.param("act_bias", nn.initializers.zeros, (self.out_channel,))
                x = fused_leaky_relu(x, b.astype(x.dtype))
            else:
                x = fused_leaky_relu(x, None)
        return x


class ConvBlock(nn.Module):
    """3x3 conv + 3x3 downsampling conv (spec: model/styleUnet.py:425-436)."""

    in_channel: int
    out_channel: int

    @nn.compact
    def __call__(self, x):
        x = ConvLayer(self.in_channel, 3, name="conv1")(x)
        x = ConvLayer(self.out_channel, 3, downsample=True, name="conv2")(x)
        return x


class FromRGB(nn.Module):
    """Image-pyramid input adapter, optionally through the wavelet domain
    (spec: model/styleUnet.py:439-467). Returns (downsampled_img, features)."""

    out_channel: int
    downsample: bool = True
    use_wt: bool = True
    blur_kernel: Sequence[int] = BLUR_KERNEL

    @nn.compact
    def __call__(self, img, skip=None):
        if self.downsample:
            if self.use_wt:
                img = inverse_haar_transform(img)
                img = downsample2d(img, make_kernel(self.blur_kernel))
                img = haar_transform(img)
            else:
                img = downsample2d(img, make_kernel(self.blur_kernel))
        out = ConvLayer(self.out_channel, 1, name="conv")(img)
        if skip is not None:
            out = out + skip
        return img, out


class StyledConv(nn.Module):
    """ModulatedConv + noise + fused-lrelu (spec: model/styleUnet.py:565-599)."""

    in_channel: int
    out_channel: int
    kernel_size: int
    upsample: bool = False
    demodulate: bool = True
    blur_kernel: Sequence[int] = BLUR_KERNEL

    @nn.compact
    def __call__(self, x, style, noise=None, rng=None):
        x = ModulatedConv2d(
            self.in_channel, self.out_channel, self.kernel_size,
            upsample=self.upsample, demodulate=self.demodulate,
            blur_kernel=self.blur_kernel, name="conv",
        )(x, style)
        x = NoiseInjection(name="noise")(x, noise=noise, rng=rng)
        b = self.param("act_bias", nn.initializers.zeros, (self.out_channel,))
        return fused_leaky_relu(x, b.astype(x.dtype))


class ToRGB(nn.Module):
    """1x1 modulated conv to output channels with wavelet-domain skip
    accumulation (spec: model/styleUnet.py:602-628)."""

    in_channel: int
    out_channel: int = 12
    upsample: bool = True
    use_wt: bool = True
    blur_kernel: Sequence[int] = BLUR_KERNEL

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv2d(
            self.in_channel, self.out_channel, 1, demodulate=False, name="conv",
        )(x, style)
        b = self.param("bias", nn.initializers.zeros, (1, 1, 1, self.out_channel))
        out = out + b.astype(out.dtype)
        if skip is not None:
            kernel = make_kernel(self.blur_kernel)
            if self.use_wt:
                skip = inverse_haar_transform(skip)
                skip = upsample2d(skip, kernel)
                skip = haar_transform(skip)
            else:
                skip = upsample2d(skip, kernel)
            out = out + skip
        return out


def minibatch_stddev(x: jnp.ndarray, group_size: int = 4, num_features: int = 1) -> jnp.ndarray:
    """Append the minibatch-stddev channel (spec: model/styleUnet.py:542-548).

    x: [B, H, W, C] -> [B, H, W, C+1].
    """
    B, H, W, C = x.shape
    group = min(B, group_size)
    y = x.reshape(group, -1, H, W, num_features, C // num_features)
    stddev = jnp.sqrt(jnp.var(y, axis=0) + 1e-8)     # [B/g, H, W, F, C/F]
    stddev = jnp.mean(stddev, axis=(1, 2, 4))        # [B/g, F]
    stddev = jnp.tile(stddev[:, None, None, :], (group, H, W, 1))
    return jnp.concatenate([x, stddev], axis=-1)
