"""Fused upsample–FIR–downsample (the StyleGAN resampling primitive), TPU-native.

The reference implements this as a hand-written CUDA kernel with a custom
double-backward (reference: model/op/upfirdn2d_kernel.cu:49-368,
model/op/upfirdn2d.py:22-150); its CPU fallback ``upfirdn2d_native``
(model/op/upfirdn2d.py:172-213) is the executable spec this implementation
is tested against.

TPU design: the whole op is ONE `lax.conv_general_dilated` call —
``lhs_dilation`` performs the zero-stuffing upsample, asymmetric (possibly
negative) padding handles the crop/pad arithmetic, and ``window_strides``
performs the downsample. XLA lowers this to a single fused convolution on the
MXU and autodiff provides exact gradients (no hand-written double-backward
needed). Layout is NHWC with a depthwise kernel so every channel shares the
same separable FIR filter.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_kernel(k) -> jnp.ndarray:
    """Build a normalized 2D FIR kernel from a 1D or 2D tap list.

    Mirrors the semantics of the reference's ``make_kernel``
    (model/styleUnet.py:18-26): outer-product 1D taps, normalize to sum 1.
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / jnp.sum(k)


def _as_pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up=1,
    down=1,
    pad: Sequence[int] = (0, 0),
) -> jnp.ndarray:
    """Upsample by ``up`` (zero-stuffing), FIR-filter with ``kernel``,
    downsample by ``down``.

    Args:
      x: [B, H, W, C] (NHWC).
      kernel: [kh, kw] FIR taps (shared across channels).
      up / down: int or (x, y) pair of integer factors.
      pad: (pad0, pad1) applied to both axes, or (x0, x1, y0, y1).

    Returns: [B, H', W', C] with
      H' = (H*up_y + pad_y0 + pad_y1 - kh) // down_y + 1 (same as the spec).
    """
    up_x, up_y = _as_pair(up)
    down_x, down_y = _as_pair(down)
    if len(pad) == 2:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad[0], pad[1], pad[0], pad[1]
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad

    num_ch = x.shape[-1]
    kh, kw = kernel.shape

    # Cross-correlation with the flipped kernel == convolution with the kernel
    # (the spec flips then calls torch's cross-correlating conv2d,
    # model/op/upfirdn2d.py:199-200).
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, num_ch))

    # The spec zero-stuffs with (up-1) trailing zeros after every input sample
    # (total size H*up); lhs_dilation inserts zeros only *between* samples
    # (size (H-1)*up + 1), so add the missing (up-1) trailing zeros to pad1.
    pad_spec = (
        (pad_y0, pad_y1 + (up_y - 1)),
        (pad_x0, pad_x1 + (up_x - 1)),
    )
    out = lax.conv_general_dilated(
        x,
        k,
        window_strides=(down_y, down_x),
        padding=pad_spec,
        lhs_dilation=(up_y, up_x),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=num_ch,
    )
    return out


def upsample2d(x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """StyleGAN ``Upsample`` (reference model/styleUnet.py:29-47): x2 zero-stuff
    + gain-compensated blur."""
    k = kernel * (factor**2)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, k, up=factor, down=1, pad=(pad0, pad1))


def downsample2d(x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """StyleGAN ``Downsample`` (reference model/styleUnet.py:50-68)."""
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def blur(x: jnp.ndarray, kernel: jnp.ndarray, pad: Tuple[int, int], upsample_factor: int = 1) -> jnp.ndarray:
    """StyleGAN ``Blur`` (reference model/styleUnet.py:71-87)."""
    k = kernel * (upsample_factor**2) if upsample_factor > 1 else kernel
    return upfirdn2d(x, k, up=1, down=1, pad=pad)


# ---------------------------------------------------------------------------
# Haar wavelet transforms (SWAGAN blocks; reference model/styleUnet.py:371-422)
# ---------------------------------------------------------------------------

def _haar_kernels():
    l = np.ones((1, 2), dtype=np.float32) / np.sqrt(2.0)
    h = l.copy()
    h[0, 0] = -h[0, 0]
    ll = l.T @ l
    lh = h.T @ l
    hl = l.T @ h
    hh = h.T @ h
    return ll, lh, hl, hh


_HAAR_LL, _HAAR_LH, _HAAR_HL, _HAAR_HH = _haar_kernels()


def haar_transform(x: jnp.ndarray) -> jnp.ndarray:
    """Forward Haar DWT: [B, H, W, C] -> [B, H/2, W/2, 4C] (ll|lh|hl|hh
    channel blocks, matching reference model/styleUnet.py:395-401)."""
    outs = [
        upfirdn2d(x, jnp.asarray(k), down=2)
        for k in (_HAAR_LL, _HAAR_LH, _HAAR_HL, _HAAR_HH)
    ]
    return jnp.concatenate(outs, axis=-1)


def inverse_haar_transform(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse Haar DWT: [B, H, W, 4C] -> [B, 2H, 2W, C]
    (reference model/styleUnet.py:404-422; note lh/hl sign flip)."""
    c = x.shape[-1] // 4
    ll, lh, hl, hh = (x[..., i * c:(i + 1) * c] for i in range(4))
    out = upfirdn2d(ll, jnp.asarray(_HAAR_LL), up=2, pad=(1, 0, 1, 0))
    out += upfirdn2d(lh, jnp.asarray(-_HAAR_LH), up=2, pad=(1, 0, 1, 0))
    out += upfirdn2d(hl, jnp.asarray(-_HAAR_HL), up=2, pad=(1, 0, 1, 0))
    out += upfirdn2d(hh, jnp.asarray(_HAAR_HH), up=2, pad=(1, 0, 1, 0))
    return out
