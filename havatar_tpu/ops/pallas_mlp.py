"""Pallas TPU kernel: the NeRF field's dense chain, fused end to end.

Spec of the unfused math: the MLP tail of
``ConditionalTriplaneNeRFModel_multiRender_split_view.forward``
(reference model/nerf_model.py:101-117): two 128-wide relu layers over the
(plane-features ++ posenc) input, then the alpha / 64-d feature / rgb heads,
output ``cat(rgb, feat, alpha)``.

Why a kernel: XLA runs this as 5 separate HLO dots whose [N, 128]
activations round-trip through HBM — measured ~8 ms bf16 for 1.05M points
(~6% MXU utilization; it is activation-bandwidth bound). Here each N-tile
stays in VMEM across the whole chain: the only HBM traffic is the [N, 176]
input read and the [N, 68] output write. The positional encoding is NOT
computed in the kernel (round-1's attempt put the trig on a [T, 3] block —
lane-starved, 82 ms; see ops/pallas_field.py) — XLA computes it fused with
the gather epilogue and hands the kernel a pre-concatenated input.

Inference-path only (the training step keeps the XLA path for autodiff).
bf16 matmul inputs, f32 accumulation — identical dtype contract to the
compute_dtype="bfloat16" XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048


def _mlp_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, wh_ref, bh_ref,
                wr_ref, br_ref, out_ref):
    """One [TILE, Fin] block through the dense chain.

    wh/bh = concatenated (fc_rgbFeat ++ fc_alpha) weights [128, 65] so the
    two sibling heads share one MXU pass; rgb = feat @ wr + br.
    Output layout: [rgb (R), feat (64), alpha (1)].
    """
    cdt = x_ref.dtype
    h = jnp.dot(x_ref[:], w0_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b0_ref[:], 0.0).astype(cdt)
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0).astype(cdt)

    fa = jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32) + bh_ref[:]
    feat = fa[:, :-1]
    alpha = fa[:, -1:]
    rgb = (jnp.dot(feat.astype(cdt), wr_ref[:],
                   preferred_element_type=jnp.float32) + br_ref[:])
    out_ref[:] = jnp.concatenate([rgb, feat, alpha], axis=-1)


def fused_mlp_chain(x: jnp.ndarray, params: dict,
                    interpret: bool = False,
                    tile: int = TILE) -> jnp.ndarray:
    """[N, Fin] (plane feats ++ posenc) -> [N, rgb+feat+1] f32 radiance.

    ``params``: the field's Dense params (flax naming: layer0, layer1,
    fc_alpha, fc_rgbFeat, fc_rgb with kernel/bias leaves).
    """
    N, fin = x.shape
    cdt = x.dtype

    w0 = params["layer0"]["kernel"].astype(cdt)
    b0 = params["layer0"]["bias"].astype(jnp.float32)[None, :]
    w1 = params["layer1"]["kernel"].astype(cdt)
    b1 = params["layer1"]["bias"].astype(jnp.float32)[None, :]
    wh = jnp.concatenate([params["fc_rgbFeat"]["kernel"],
                          params["fc_alpha"]["kernel"]], axis=1).astype(cdt)
    bh = jnp.concatenate([params["fc_rgbFeat"]["bias"],
                          params["fc_alpha"]["bias"]])
    bh = bh.astype(jnp.float32)[None, :]
    wr = params["fc_rgb"]["kernel"].astype(cdt)
    br = params["fc_rgb"]["bias"].astype(jnp.float32)[None, :]

    out_rgb = wr.shape[1]
    out_feat = params["fc_rgbFeat"]["kernel"].shape[1]
    out_ch = out_rgb + out_feat + 1

    pad = (-N) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, fin), x.dtype)], 0)
    n_tiles = (N + pad) // tile

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, fin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(8)],
        out_specs=pl.BlockSpec((tile, out_ch), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad, out_ch), jnp.float32),
        interpret=interpret,
    )(x, w0, b0, w1, b1, wh, bh, wr, br)
    return out[:N]
