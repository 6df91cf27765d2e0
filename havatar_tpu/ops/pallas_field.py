"""Pallas TPU kernel: fused NeRF field evaluation.

Fuses the per-point tail of the ray march — positional encoding, the
(plane-features ++ posenc) concat, the 2x128 MLP, and the three output heads
(sigma, 64-d feature, rgb) — into ONE kernel (spec of the unfused math:
model/nerf_model.py:101-117 + model/network/embedder.py:32-61).

Why a kernel: XLA runs this as 4 separate matmuls with [N, 128] activation
round trips through HBM plus a materialized [N, 48] encoding. Here each
N-tile stays in VMEM end to end: the encoding is computed in registers, the
weights (~100 KB) are VMEM-resident across the whole grid, and the MXU sees
back-to-back [TILE, 176]x[176, 128] matmuls. Inference-path only (the
training step uses the XLA path for autodiff); numerics are bf16 matmul
inputs with f32 accumulation, matching the compute_dtype="bfloat16" XLA path.

STATUS (measured, v5e single chip, N=1.3M): XLA path 11.0 ms, this kernel
82.4 ms — XLA's automatic fusion already keeps this section near its
small-K MXU bound, and the kernel's [TILE, 3] point block wastes lanes on
the trig stage. Kept as a correct (interpreter-verified) optional path and a
base for a future fully-fused march kernel; NOT wired into the default
renderer. The actual ray-march bottleneck is gather issue rate (see
ops/grid_sample.py docstring), which a Pallas kernel cannot currently beat
on TPU (no vectorized per-lane VMEM gather in Mosaic).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048


def _field_kernel(num_freqs: int, feat_in: int, hidden: int, out_feat: int,
                  pts_ref, feat_ref, w0_ref, b0_ref, w1_ref, b1_ref,
                  wa_ref, ba_ref, wf_ref, bf_ref, wr_ref, br_ref, out_ref):
    pts = pts_ref[:]                       # [T, 3] f32
    cdt = feat_ref.dtype

    # positional encoding, reference feature order [F, (sin, sin+pi/2), C]
    # flattened (model/network/embedder.py:40-56)
    enc_blocks = []
    for f in range(num_freqs):
        ang = pts * (2.0 ** f)
        enc_blocks.append(jnp.sin(ang))
        enc_blocks.append(jnp.sin(ang + math.pi / 2))
    enc = jnp.concatenate(enc_blocks, axis=-1).astype(cdt)  # [T, 2*F*3]

    x = jnp.concatenate([feat_ref[:], enc], axis=-1)        # [T, feat_in+enc]

    h = jnp.dot(x, w0_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b0_ref[:], 0.0).astype(cdt)
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0).astype(cdt)

    alpha = jnp.dot(h, wa_ref[:], preferred_element_type=jnp.float32) + ba_ref[:]
    feat = jnp.dot(h, wf_ref[:], preferred_element_type=jnp.float32) + bf_ref[:]
    rgb = (jnp.dot(feat.astype(cdt), wr_ref[:],
                   preferred_element_type=jnp.float32) + br_ref[:])

    out_ref[:] = jnp.concatenate([rgb, feat, alpha], axis=-1)


def fused_field_eval(
    pts: jnp.ndarray,        # [N, 3] f32 canonical points
    pts_feat: jnp.ndarray,   # [N, F_in] plane features (bf16 or f32)
    params: dict,            # field Dense params (flax naming)
    num_freqs: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> [N, rgb+feat+1] f32. Semantically equals DoublePlaneNeRFField's
    MLP tail with sh_deg=0."""
    N, feat_in = pts_feat.shape
    cdt = pts_feat.dtype

    w0 = params["layer0"]["kernel"].astype(cdt)
    b0 = params["layer0"]["bias"].astype(jnp.float32)
    w1 = params["layer1"]["kernel"].astype(cdt)
    b1 = params["layer1"]["bias"].astype(jnp.float32)
    wa = params["fc_alpha"]["kernel"].astype(cdt)
    ba = params["fc_alpha"]["bias"].astype(jnp.float32)
    wf = params["fc_rgbFeat"]["kernel"].astype(cdt)
    bf = params["fc_rgbFeat"]["bias"].astype(jnp.float32)
    wr = params["fc_rgb"]["kernel"].astype(cdt)
    br = params["fc_rgb"]["bias"].astype(jnp.float32)

    hidden = w0.shape[1]
    out_feat = wf.shape[1]
    out_rgb = wr.shape[1]
    out_ch = out_rgb + out_feat + 1

    pad = (-N) % TILE
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], 0)
        pts_feat = jnp.concatenate(
            [pts_feat, jnp.zeros((pad, feat_in), pts_feat.dtype)], 0)
    n_tiles = (N + pad) // TILE

    kernel = functools.partial(_field_kernel, num_freqs, feat_in, hidden,
                               out_feat)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, feat_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)  # weights: whole array
            for _ in range(10)
        ],
        out_specs=pl.BlockSpec((TILE, out_ch), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad, out_ch), jnp.float32),
        interpret=interpret,
    )(pts, pts_feat, w0, b0, w1, b1, wa, ba, wf, bf, wr, br)

    return out[:N]
