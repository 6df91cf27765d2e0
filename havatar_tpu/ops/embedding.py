"""NeRF positional (frequency) encoding.

Spec: reference model/network/embedder.py:32-61 — the vectorized variant that
interleaves (sin(fx), sin(fx + pi/2)) per frequency, with optional
cosine-easing alpha window and optional identity prepend. Feature order is
[..., F, 2, C] flattened, which this reproduces exactly.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp


def posenc_freq_bands(num_freqs: int, log_sampling: bool = True) -> jnp.ndarray:
    max_freq = num_freqs - 1
    if log_sampling:
        return 2.0 ** jnp.linspace(0.0, max_freq, num_freqs)
    return jnp.linspace(2.0**0.0, 2.0**max_freq, num_freqs)


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    include_input: bool = False,
    log_sampling: bool = True,
    alpha: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[..., C] -> [..., (C if include_input else 0) + 2*F*C]."""
    if num_freqs == 0:
        return x
    freq_bands = posenc_freq_bands(num_freqs, log_sampling).astype(x.dtype)
    angles = x[..., None, :] * freq_bands[:, None]  # [..., F, C]
    feats = jnp.stack((angles, angles + math.pi / 2), axis=-2)  # [..., F, 2, C]
    feats = jnp.sin(feats)
    if alpha is not None:
        window = jnp.clip(alpha - freq_bands, 0.0, 1.0)
        window = 0.5 * (1 + jnp.cos(math.pi * window + math.pi))
        feats = window[:, None, None] * feats
    feats = feats.reshape(*x.shape[:-1], -1)
    if include_input:
        feats = jnp.concatenate([x, feats], axis=-1)
    return feats


def posenc_dim(num_freqs: int, input_dims: int = 3, include_input: bool = False) -> int:
    return (input_dims if include_input else 0) + input_dims * 2 * num_freqs
